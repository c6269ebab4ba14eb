"""PyG parameter initializers (torch_geometric.nn.inits equivalents)."""

import math

import torch
from torch import Tensor


def glorot(value):
    if isinstance(value, Tensor):
        stdv = math.sqrt(6.0 / (value.size(-2) + value.size(-1)))
        value.data.uniform_(-stdv, stdv)


def zeros(value):
    if isinstance(value, Tensor):
        value.data.fill_(0.0)


def uniform(size: int, value):
    if isinstance(value, Tensor):
        bound = 1.0 / math.sqrt(size)
        value.data.uniform_(-bound, bound)


def kaiming_uniform(value, fan: int, a: float):
    if isinstance(value, Tensor):
        bound = math.sqrt(6.0 / ((1 + a**2) * fan))
        value.data.uniform_(-bound, bound)


def reset(module):
    if hasattr(module, "reset_parameters"):
        module.reset_parameters()
