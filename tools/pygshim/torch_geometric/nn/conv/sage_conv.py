"""Minimal SAGEConv: out = lin_l(mean_{j in N(i)} x_j) + lin_r(x_i)
(PyG defaults: mean aggregation, root weight, bias on lin_l only), as used by
the reference's HeteroGCLSTM (heterogclstm.py:52-95)."""

from ..dense.linear import Linear
from .message_passing import MessagePassing


class SAGEConv(MessagePassing):
    def __init__(self, in_channels, out_channels, bias: bool = True, **kwargs):
        super().__init__(aggr="mean")
        if isinstance(in_channels, int):
            in_channels = (in_channels, in_channels)
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.lin_l = Linear(in_channels[0], out_channels, bias=bias)
        self.lin_r = Linear(in_channels[1], out_channels, bias=False)

    def forward(self, x, edge_index, edge_attr=None):
        x_src, x_dst = x if isinstance(x, tuple) else (x, x)
        mean_nbr = self.propagate(edge_index, x=(x_src, x_dst))
        return self.lin_l(mean_nbr) + self.lin_r(x_dst)

    def message(self, x_j, x_i, edge_attr, index, ptr, size_i):
        return x_j
