"""Deterministic synthetic graphs for unit tests (not physical — just valid
degree structure for the hetero conv / cell / model stack)."""

from __future__ import annotations

import numpy as np

from graingraphnn_tpu.graph import schema, state


def synthetic_coo(ng=16, nj=32, seed=0):
    """A toy heterograph: every joint has exactly 3 jj and 3 jg neighbors
    (the reference invariant); grain rings are the transpose of jg."""
    rng = np.random.default_rng(seed)

    jj_src, jj_dst = [], []
    for j in range(nj):
        for d in (1, nj - 1, nj // 2):
            jj_src.append(j)
            jj_dst.append((j + d) % nj)

    # grain neighbors per joint (push: grain -> joint)
    push_src, push_dst = [], []
    for j in range(nj):
        for k, off in enumerate((0, 3, 7)):
            push_src.append((j + off) % ng)
            push_dst.append(j)

    pull_src = list(push_dst)  # joint -> grain
    pull_dst = list(push_src)

    jj_len = rng.uniform(0.01, 0.2, len(jj_src)).astype(np.float32)
    gj_len = rng.uniform(0.01, 0.2, len(push_src)).astype(np.float32)

    gx = rng.uniform(0, 1, (ng, schema.GRAIN_DIM)).astype(np.float32)
    jx = rng.uniform(0, 1, (nj, schema.JOINT_DIM)).astype(np.float32)

    feature_dicts = {"grain": gx, "joint": jx}
    edge_index_dicts = {
        schema.EDGE_TYPES[0]: np.array([push_src, push_dst]),
        schema.EDGE_TYPES[1]: np.array([pull_src, pull_dst]),
        schema.EDGE_TYPES[2]: np.array([jj_src, jj_dst]),
    }
    edge_weight_dicts = {
        schema.EDGE_TYPES[0]: gj_len[:, None],
        schema.EDGE_TYPES[1]: gj_len[:, None],
        schema.EDGE_TYPES[2]: jj_len[:, None],
    }
    mask_dicts = {
        "grain": np.ones((ng, 1), np.float32),
        "joint": np.ones((nj, 1), np.float32),
    }
    return feature_dicts, edge_index_dicts, edge_weight_dicts, mask_dicts


def synthetic_sample(ng=16, nj=32, seed=0, with_targets=False, **caps) -> state.GraphSample:
    f, e, w, m = synthetic_coo(ng, nj, seed)
    targets = None
    if with_targets:
        rng = np.random.default_rng(seed + 1000)
        n_jj = e[schema.EDGE_TYPES[2]].shape[1]
        targets = {
            "grain": rng.uniform(-0.9, 0.9, (ng, 2)).astype(np.float32),
            "joint": rng.uniform(-0.9, 0.9, (nj, 2)).astype(np.float32),
            "grain_event": (rng.uniform(size=ng) < 0.1).astype(np.float32),
            "edge_event": rng.choice(
                [-100.0, 0.0, 1.0], size=n_jj, p=[0.1, 0.8, 0.1]
            ).astype(np.float32),
        }
    return state.build_sample(f, e, w, m, targets, **caps)
