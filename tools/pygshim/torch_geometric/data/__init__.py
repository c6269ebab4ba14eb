"""HeteroData shim: keyed storages (node-type str / edge-type tuple),
attribute<->item access, and the *_dict views the reference drivers consume
(x_dict, edge_index_dict, edge_attr_dict). Views return the SAME underlying
tensors on every access — the rollout loop mutates them in place
(test.py:295-296,400-407)."""

import torch


class Storage(dict):
    def __getattr__(self, key):
        try:
            return self[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def __setattr__(self, key, value):
        self[key] = value


class HeteroData:
    def __init__(self):
        object.__setattr__(self, "_store", {})
        object.__setattr__(self, "_globals", {})

    def __getitem__(self, key):
        if key not in self._store:
            self._store[key] = Storage()
        return self._store[key]

    def __setattr__(self, key, value):
        self._globals[key] = value

    def __getattr__(self, key):
        # direct assignments (e.g. test.py:426 `data.edge_index_dict = ...`,
        # :565 `data.edge_attr_dict = {}`) take precedence over derived views
        if key in self._globals:
            return self._globals[key]
        if key.endswith("_dict"):
            attr = {"x_dict": "x", "edge_index_dict": "edge_index",
                    "edge_attr_dict": "edge_attr", "y_dict": "y"}.get(key)
            if attr is not None:
                return {
                    k: s[attr] for k, s in self._store.items() if attr in s
                }
        try:
            return self._globals[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def metadata(self):
        node_types = [k for k in self._store if isinstance(k, str) and
                      "x" in self._store[k]]
        edge_types = [k for k in self._store if isinstance(k, tuple)]
        return node_types, edge_types

    def to(self, device):
        for storage in self._store.values():
            for k, v in list(storage.items()):
                if torch.is_tensor(v):
                    storage[k] = v.to(device)
        return self
