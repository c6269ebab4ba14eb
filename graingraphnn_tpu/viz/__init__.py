from . import plots, volume  # noqa: F401
