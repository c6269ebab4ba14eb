"""Minimal torch_geometric shim (see tools/pygshim/README.md)."""

__version__ = "2.1.0-shim"

from . import nn, utils, typing, data, loader  # noqa: F401
