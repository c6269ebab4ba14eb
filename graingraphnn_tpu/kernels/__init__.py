from . import edge_stage  # noqa: F401
