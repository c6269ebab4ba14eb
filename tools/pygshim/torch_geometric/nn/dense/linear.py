"""PyG `torch_geometric.nn.dense.linear.Linear` equivalent.

Supports lazy in_channels (-1): the weight materializes on first forward,
as the reference relies on (dist_train.py:384-387 runs a dummy forward to
materialize shapes before DDP/spawn). Weight layout is torch convention
[out, in]; defaults reproduce PyG's reset (kaiming_uniform fan-in a=sqrt(5),
bias uniform 1/sqrt(fan_in)).
"""

import math

import torch
import torch.nn.functional as F
from torch.nn import Module, Parameter

from .. import inits


class Linear(Module):
    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        bias: bool = True,
        weight_initializer=None,
        bias_initializer=None,
    ):
        super().__init__()
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.weight_initializer = weight_initializer
        self.bias_initializer = bias_initializer
        self._use_bias = bias

        if in_channels > 0:
            self.weight = Parameter(torch.empty(out_channels, in_channels))
            self.bias = Parameter(torch.empty(out_channels)) if bias else None
            self.reset_parameters()
        else:
            self.weight = None
            self.bias = None

    def _materialize(self, in_channels: int):
        self.in_channels = in_channels
        self.weight = Parameter(torch.empty(self.out_channels, in_channels))
        if self._use_bias:
            self.bias = Parameter(torch.empty(self.out_channels))
        self.reset_parameters()

    def reset_parameters(self):
        if self.in_channels <= 0 or self.weight is None:
            return
        if self.weight_initializer == "glorot":
            inits.glorot(self.weight)
        elif self.weight_initializer == "zeros":
            inits.zeros(self.weight)
        else:  # PyG default: kaiming_uniform with fan=in_channels, a=sqrt(5)
            inits.kaiming_uniform(self.weight, fan=self.in_channels, a=math.sqrt(5))
        if self.bias is not None:
            if self.bias_initializer == "zeros":
                inits.zeros(self.bias)
            else:
                inits.uniform(self.in_channels, self.bias)

    def forward(self, x):
        if self.weight is None:
            self._materialize(x.size(-1))
        return F.linear(x, self.weight, self.bias)

    def _load_from_state_dict(self, state_dict, prefix, *args, **kwargs):
        # lazy-materialize from the checkpoint's shapes, as torch's
        # LazyModuleMixin does — the reference loads .pt files without a
        # prior dummy forward (test.py:178,183)
        if self.weight is None and prefix + "weight" in state_dict:
            self._materialize(state_dict[prefix + "weight"].shape[1])
        super()._load_from_state_dict(state_dict, prefix, *args, **kwargs)

    def __repr__(self):
        return f"Linear({self.in_channels}, {self.out_channels})"
