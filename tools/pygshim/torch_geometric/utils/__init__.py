"""Segment softmax matching PyG 2.1 `torch_geometric.utils.softmax`
semantics (max-shift per destination segment, +1e-16 in the denominator)."""

from typing import Optional

import torch
from torch import Tensor


def softmax(
    src: Tensor,
    index: Optional[Tensor] = None,
    ptr: Optional[Tensor] = None,
    num_nodes: Optional[int] = None,
    dim: int = 0,
) -> Tensor:
    assert index is not None and dim == 0, "shim supports index-based dim-0 use"
    N = int(num_nodes) if num_nodes is not None else int(index.max()) + 1
    shape = (N,) + src.shape[1:]
    src_max = torch.full(shape, float("-inf"), dtype=src.dtype, device=src.device)
    src_max = src_max.index_reduce(0, index, src.detach(), "amax", include_self=True)
    out = (src - src_max.index_select(0, index)).exp()
    out_sum = torch.zeros(shape, dtype=src.dtype, device=src.device)
    out_sum = out_sum.index_add(0, index, out) + 1e-16
    return out / out_sum.index_select(0, index)
