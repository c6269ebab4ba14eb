"""Ensemble inference in the rollout engine: a list of member param pytrees
must produce the member-mean prediction (deep-ensemble averaging,
VERDICT round-1 item 5)."""

import numpy as np
import jax
import pytest

from __graft_entry__ import _synthetic_sample
from graingraphnn_tpu.graph import schema
from graingraphnn_tpu.models import grain_nn, hyper
from graingraphnn_tpu.rollout.engine import RolloutEngine


def _engine_inputs(sample_seed=0, ng=24, nj=48):
    s = _synthetic_sample(ng=ng, nj=nj, seed=sample_seed)
    x = {
        "grain": np.asarray(s.grain_x, np.float64),
        "joint": np.asarray(s.joint_x, np.float64),
    }
    rng = np.random.default_rng(sample_seed)
    jj_src, jj_dst = [], []
    for j in range(nj):
        for d in (1, nj - 1, nj // 2):
            jj_src.append(j)
            jj_dst.append((j + d) % nj)
    push = np.array([[(j + off) % ng for j in range(nj) for off in (0, 3, 7)],
                     [j for j in range(nj) for _ in (0, 3, 7)]], np.int64)
    edges = {
        "push": push,
        "pull": push[::-1].copy(),
        "connect": np.array([jj_src, jj_dst], np.int64),
    }
    edge_attr = {
        schema.EDGE_TYPES[0]: rng.uniform(0.01, 0.2, (push.shape[1], 1)),
        schema.EDGE_TYPES[1]: rng.uniform(0.01, 0.2, (push.shape[1], 1)),
        schema.EDGE_TYPES[2]: rng.uniform(0.01, 0.2, (len(jj_src), 1)),
    }
    mask = {
        "grain": np.ones((ng, 1), np.int64),
        "joint": np.ones((nj, 1), np.int64),
    }
    return x, edges, edge_attr, (ng, nj, len(jj_src))


def test_ensemble_forward_is_member_mean():
    hp_r = hyper.regressor(0, layer_size=16)
    hp_c = hyper.classifier_transfered(1, layer_size=16)
    members = [
        grain_nn.init_regressor(jax.random.PRNGKey(k), hp_r) for k in (0, 1, 2)
    ]
    params_c = grain_nn.init_classifier(
        jax.random.PRNGKey(9), hp_c, regressor_params=members[0]
    )
    x, edges, edge_attr, caps = _engine_inputs()

    def forward(reg):
        eng = RolloutEngine(reg, hp_r, params_c, hp_c)
        eng._mask = {
            "grain": np.ones((caps[0], 1), np.int64),
            "joint": np.ones((caps[1], 1), np.int64),
        }
        eng._bc = "periodic"
        (y_r, y_c), _ = eng._forward(
            {k: v.copy() for k, v in x.items()}, edges, edge_attr, caps
        )
        return y_r, y_c

    y_ens, yc_ens = forward(members)
    singles = [forward(m)[0] for m in members]

    for key in ("grain", "joint", "grain_area"):
        mean = np.mean([np.asarray(s[key]) for s in singles], axis=0)
        np.testing.assert_allclose(
            np.asarray(y_ens[key]), mean, rtol=1e-5, atol=1e-6
        )
    # single classifier: ensemble regressor must not perturb it
    _, yc_single = forward(members[0])
    np.testing.assert_allclose(
        np.asarray(yc_ens["edge_event"]),
        np.asarray(yc_single["edge_event"]),
        rtol=1e-5, atol=1e-6,
    )


def test_classifier_ensemble_averages_probabilities():
    """edge_event is a logit; the ensemble must average member
    PROBABILITIES (then re-logit) so c_threshold keeps its single-model
    probability calibration (ADVICE round-2 medium)."""
    hp_r = hyper.regressor(0, layer_size=16)
    hp_c = hyper.classifier_transfered(1, layer_size=16)
    params_r = grain_nn.init_regressor(jax.random.PRNGKey(0), hp_r)
    cls_members = [
        grain_nn.init_classifier(
            jax.random.PRNGKey(k), hp_c, regressor_params=params_r
        )
        for k in (3, 4)
    ]
    x, edges, edge_attr, caps = _engine_inputs(sample_seed=1)

    def forward(cls):
        eng = RolloutEngine(params_r, hp_r, cls, hp_c)
        eng._mask = {
            "grain": np.ones((caps[0], 1), np.int64),
            "joint": np.ones((caps[1], 1), np.int64),
        }
        eng._bc = "periodic"
        (y_r, y_c), _ = eng._forward(
            {k: v.copy() for k, v in x.items()}, edges, edge_attr, caps
        )
        return y_c

    yc_ens = forward(cls_members)
    singles = [forward(c) for c in cls_members]
    probs = [1.0 / (1.0 + np.exp(-np.asarray(s["edge_event"], np.float64)))
             for s in singles]
    pm = np.clip(np.mean(probs, axis=0), 1e-7, 1.0 - 1e-7)
    expected_logit = np.log(pm) - np.log1p(-pm)
    np.testing.assert_allclose(
        np.asarray(yc_ens["edge_event"], np.float64), expected_logit,
        rtol=1e-4, atol=1e-5,
    )
    # non-edge_event outputs stay plain means
    mean_edge = np.mean([np.asarray(s["edge"]) for s in singles], axis=0)
    np.testing.assert_allclose(
        np.asarray(yc_ens["edge"]), mean_edge, rtol=1e-5, atol=1e-6
    )
