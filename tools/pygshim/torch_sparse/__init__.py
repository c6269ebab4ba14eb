"""Import-only stub: periodGATconv.py:7 imports SparseTensor purely for an
isinstance check on an optional return path never taken by the reference
drivers (return_attention_weights is never set)."""


class SparseTensor:
    def __init__(self, *args, **kwargs):
        raise NotImplementedError("torch_sparse shim is import-only")

    @classmethod
    def from_edge_index(cls, *args, **kwargs):
        raise NotImplementedError("torch_sparse shim is import-only")
