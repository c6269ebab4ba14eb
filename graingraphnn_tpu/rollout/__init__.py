from . import engine, qoi, topology  # noqa: F401
