from . import reference_io  # noqa: F401
