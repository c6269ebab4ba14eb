"""Readers for the reference repo's shipped artifacts (parity fixtures).

The reference serializes `GrainHeterograph` / `graph_trajectory` instances
with dill (graph_trajectory.py:1281-1287). Loading those pickles normally
requires importing the reference's modules; instead, a permissive Unpickler
reconstructs any unknown class as a generic attribute bag (`ShimObject`), so
the shipped fixtures load with zero reference code.

Layout of a shipped sample pickle (graphs/40_40/seed10020_*.pkl): a list of
GrainHeterograph objects whose `feature_dicts` / `edge_index_dicts` /
`edge_weight_dicts` / `mask` / `target_dicts` numpy dicts follow
graph_trajectory.form_states_tensor (graph_trajectory.py:901-1005) and
graph_datastruct.form_gradient (graph_datastruct.py:851-1011).
"""

from __future__ import annotations

import gzip
import io
import pickle
from typing import Any, Dict, List, Optional

import numpy as np

from ..graph import schema, state


class ShimObject:
    """Stand-in for any reference class: stores state, answers attribute
    access. repr shows the original class for debugging."""

    _shim_class = "?"

    def __init__(self, *args, **kwargs):
        pass

    def __setstate__(self, st):
        if isinstance(st, dict):
            self.__dict__.update(st)
        else:
            self.__dict__["_state"] = st

    def __repr__(self):
        return f"<ShimObject {self._shim_class} with {sorted(self.__dict__)[:8]}>"


_ALLOWED_MODULE_PREFIXES = (
    "numpy",
    "collections",
    "builtins",
    "copyreg",
    "__builtin__",
    "dill",   # dill-internal reducers (_dill._get_attr etc.) must be real
    "_dill",
    "scipy",
)


class _PermissiveUnpickler(pickle.Unpickler):
    """pickle.Unpickler that substitutes a generic attribute-bag class for
    any class living in a module we don't have (the reference's own modules),
    while letting numpy/dill/scipy internals resolve normally."""

    def find_class(self, module: str, name: str):
        if name == "__dict__":
            # dill serializes __main__-defined functions by value with their
            # globals as a reference to __main__.__dict__; hand those
            # functions an inert empty namespace (they are never called —
            # only the array payload is consumed).
            return {}
        if module.startswith(_ALLOWED_MODULE_PREFIXES):
            return super().find_class(module, name)
        if module.startswith("torch"):
            # the fixtures we read are numpy-only; torch payloads unsupported
            raise pickle.UnpicklingError(f"refusing torch payload {module}.{name}")
        cls = type(name, (ShimObject,), {"_shim_class": f"{module}.{name}"})
        return cls


def load_pickle(path: str) -> Any:
    opener = gzip.open if str(path).endswith(".gz") else open
    with opener(path, "rb") as f:
        data = f.read()
    # dill frames are pickle streams; dill-internal callables resolve through
    # the real dill package (in _ALLOWED_MODULE_PREFIXES)
    return _PermissiveUnpickler(io.BytesIO(data)).load()


def heterograph_to_arrays(hg: Any) -> Dict[str, Any]:
    """Extract the array dicts of one (shim-loaded) GrainHeterograph."""
    edge_types = [tuple(et) for et in getattr(hg, "edge_type", schema.EDGE_TYPES)]
    out = {
        "features": {k: np.asarray(v) for k, v in hg.feature_dicts.items()},
        "edge_index": {
            tuple(k): np.asarray(v) for k, v in hg.edge_index_dicts.items()
        },
        "edge_weight": {
            tuple(k): np.asarray(v) for k, v in hg.edge_weight_dicts.items()
        },
        "mask": {k: np.asarray(v) for k, v in hg.mask.items()},
        "edge_types": edge_types,
        "physical_params": dict(getattr(hg, "physical_params", {})),
    }
    targets = {}
    for k, v in getattr(hg, "target_dicts", {}).items():
        targets[k] = np.asarray(v)
    if "edge" in getattr(hg, "mask", {}):
        targets["edge_mask"] = np.asarray(hg.mask["edge"])
    out["targets"] = targets
    return out


def heterograph_to_sample(
    hg: Any,
    *,
    grain_cap: Optional[int] = None,
    joint_cap: Optional[int] = None,
    jj_edge_cap: Optional[int] = None,
    grain_ring: int = schema.DEFAULT_GRAIN_RING,
) -> state.GraphSample:
    a = heterograph_to_arrays(hg)
    return state.build_sample(
        a["features"],
        a["edge_index"],
        a["edge_weight"],
        a["mask"],
        a["targets"] or None,
        grain_cap=grain_cap,
        joint_cap=joint_cap,
        jj_edge_cap=jj_edge_cap,
        grain_ring=grain_ring,
    )


def load_sample_list(path: str) -> List[Any]:
    obj = load_pickle(path)
    if not isinstance(obj, list):
        obj = [obj]
    return obj
