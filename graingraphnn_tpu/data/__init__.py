from . import dataset, reference_io  # noqa: F401
