from . import cells, grain_nn, hyper  # noqa: F401
