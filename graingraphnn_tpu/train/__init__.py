from . import checkpoint, loss, metrics, trainer  # noqa: F401
