"""MessagePassing base matching the call pattern of the reference's
PeriodConv (periodGATconv.py:174,204): bipartite `x=(x_src, x_dst)`, message
signature `(x_j, x_i, edge_attr, index, ptr, size_i)`, add-aggregation by
destination index."""

import torch
from torch.nn import Module


class MessagePassing(Module):
    def __init__(self, aggr: str = "add", node_dim: int = 0, **kwargs):
        super().__init__()
        assert aggr in ("add", "sum", "mean")
        self.aggr = aggr
        self.node_dim = node_dim

    def propagate(self, edge_index, x, edge_attr=None, size=None, **kwargs):
        x_src, x_dst = x if isinstance(x, tuple) else (x, x)
        src, dst = edge_index[0], edge_index[1]
        msg = self.message(
            x_j=x_src.index_select(0, src),
            x_i=x_dst.index_select(0, dst),
            edge_attr=edge_attr,
            index=dst,
            ptr=None,
            size_i=x_dst.size(0),
        )
        return self.aggregate(msg, dst, dim_size=x_dst.size(0))

    def message(self, x_j, x_i, edge_attr, index, ptr, size_i):  # pragma: no cover
        return x_j

    def aggregate(self, msg, index, dim_size: int):
        out = torch.zeros(
            (dim_size,) + msg.shape[1:], dtype=msg.dtype, device=msg.device
        )
        out = out.index_add(0, index, msg)
        if self.aggr == "mean":
            deg = torch.zeros(dim_size, dtype=msg.dtype, device=msg.device)
            deg = deg.index_add(0, index, torch.ones_like(index, dtype=msg.dtype))
            shape = (dim_size,) + (1,) * (msg.dim() - 1)
            out = out / deg.clamp(min=1).view(shape)
        return out
