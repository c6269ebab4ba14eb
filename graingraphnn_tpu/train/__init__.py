from . import loss, metrics, trainer  # noqa: F401
