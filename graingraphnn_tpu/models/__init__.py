from . import cells, grain_nn, hyper, lstm  # noqa: F401
