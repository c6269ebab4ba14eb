"""HeteroConv: one conv module per edge type, outputs summed per destination
node type. ModuleDict keys are '__'-joined edge types, so state_dict keys are
identical to real PyG's (e.g. `convs.grain__push__joint.lin_key.weight`)."""

import inspect

import torch
from torch.nn import Module, ModuleDict


class HeteroConv(Module):
    def __init__(self, convs: dict, aggr: str = "sum"):
        super().__init__()
        self.edge_types = list(convs.keys())
        self.convs = ModuleDict({"__".join(k): v for k, v in convs.items()})
        self.aggr = aggr

    def forward(self, x_dict, edge_index_dict, edge_attr_dict=None):
        out_dict = {}
        for edge_type in self.edge_types:
            src, _rel, dst = edge_type
            if edge_type not in edge_index_dict:
                continue
            conv = self.convs["__".join(edge_type)]
            kwargs = {}
            if edge_attr_dict is not None and "edge_attr" in inspect.signature(
                conv.forward
            ).parameters:
                kwargs["edge_attr"] = edge_attr_dict.get(edge_type)
            out = conv(
                (x_dict[src], x_dict[dst]), edge_index_dict[edge_type], **kwargs
            )
            out_dict.setdefault(dst, []).append(out)
        return {
            k: v[0] if len(v) == 1 else torch.stack(v, dim=0).sum(dim=0)
            for k, v in out_dict.items()
        }
