from . import data_parallel, mesh, partition  # noqa: F401
