from . import volume  # noqa: F401
