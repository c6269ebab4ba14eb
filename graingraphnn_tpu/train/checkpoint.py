"""Checkpointing: model params + hyperparameters + decision thresholds.

Improves on the reference, which only dumps a bare state_dict at the end of
training and hardcodes the classifier threshold at inference
(train.py:399-401 vs test.py:187-188): here the threshold and the full
hyper config are serialized with the weights, and optimizer state can be
included for mid-training resume.
"""

from __future__ import annotations

import dataclasses
import json
import os
import pickle
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from ..models.hyper import HyperParams


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save(
    path: str,
    params,
    hp: HyperParams,
    *,
    opt_state=None,
    extra: Optional[Dict[str, Any]] = None,
):
    """Writes <path>.ckpt (pickle of numpy pytrees) + <path>.json (config)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {"params": _to_numpy(params)}
    if opt_state is not None:
        payload["opt_state"] = _to_numpy(opt_state)
    if extra:
        payload["extra"] = extra
    with open(path + ".ckpt", "wb") as f:
        pickle.dump(payload, f)
    with open(path + ".json", "w") as f:
        json.dump(dataclasses.asdict(hp), f, indent=1)


def load(path: str) -> Tuple[Any, HyperParams, Dict[str, Any]]:
    """Returns (params, hp, extra)."""
    with open(path + ".ckpt", "rb") as f:
        payload = pickle.load(f)
    with open(path + ".json") as f:
        hp = HyperParams(**json.load(f))
    return payload["params"], hp, payload.get("extra", {})
