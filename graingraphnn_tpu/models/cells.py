"""Heterogeneous recurrent graph cells.

`HeteroPGCLSTM` semantics follow the reference cell (heteropgclstm.py:18-183):
a ConvLSTM on the heterogeneous grain graph where each of the four gates
(i, f, c~, o) is one periodic conv per edge type, summed over incoming edge
types per node type, plus a learned per-node-type gate bias; gate input is
``concat([x, h])`` per node type.

TPU-first difference: all four gates share topology and input, so they are
evaluated as ONE fused conv with 4x-wide projections per edge type
(ops.period_conv with num_gates=4). The reference runs 4 gates x 3 edge
types = 12 conv calls per cell step; here it is 3 fused applications. The
fusion is exact because every gate conv reads the same ``concat([x, h_old])``
(heteropgclstm.py:111-142 — the output gate receives the updated c but its
conv only consumes h).

`HeteroSAGECLSTM` covers layers >= 1 of a stacked cell list, following the
reference's SAGE-based cell (heterogclstm.py:21-196). Note the reference
creates per-node-type `W_*` parameter dicts that are never applied in its
forward (dead parameters, heterogclstm.py:56-89,125-156); they are not
reproduced here.
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..graph.state import GraphSample
from ..ops.period_conv import (
    apply_period_conv,
    glorot_uniform,
    init_period_conv,
)

GATE_ORDER = ("i", "f", "c", "o")
NUM_GATES = len(GATE_ORDER)

EDGE_KEYS = ("push", "pull", "connect")  # src->dst: g->j, j->g, j->j


def init_pgclstm(
    key: jax.Array,
    in_grain: int,
    in_joint: int,
    out_channels: int,
    dtype=jnp.float32,
) -> Dict:
    """One layer-0 cell. Inputs are the raw per-type features; gate input is
    concat([x, h]) so conv fan-in is in_* + out_channels."""
    C = out_channels
    fg = in_grain + C
    fj = in_joint + C
    ks = jax.random.split(key, 5)
    conv = {
        # ('grain','push','joint'): src grain, dst joint
        "push": init_period_conv(ks[0], fg, fj, C, NUM_GATES, dtype),
        # ('joint','pull','grain'): src joint, dst grain
        "pull": init_period_conv(ks[1], fj, fg, C, NUM_GATES, dtype),
        # ('joint','connect','joint')
        "connect": init_period_conv(ks[2], fj, fj, C, NUM_GATES, dtype),
    }
    # per-node-type gate biases, glorot([1, C]) like the reference
    # (heteropgclstm.py:54-99)
    bias = {
        "grain": glorot_uniform(ks[3], (NUM_GATES, C), 1, C, dtype),
        "joint": glorot_uniform(ks[4], (NUM_GATES, C), 1, C, dtype),
    }
    return {"conv": conv, "bias": bias}


def _lstm_update(gates: jnp.ndarray, c: jnp.ndarray, C: int):
    """gates: [N, 4C] in gate order (i, f, c~, o)."""
    i = jax.nn.sigmoid(gates[:, 0 * C : 1 * C])
    f = jax.nn.sigmoid(gates[:, 1 * C : 2 * C])
    g = jnp.tanh(gates[:, 2 * C : 3 * C])
    o = jax.nn.sigmoid(gates[:, 3 * C : 4 * C])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def apply_pgclstm(
    params: Dict,
    sample: GraphSample,
    grain_in: jnp.ndarray,
    joint_in: jnp.ndarray,
    state: Tuple[Dict, Dict],
    out_channels: int,
    src_gather=None,
):
    """One recurrent step. state = (h, c), each {'grain': [NG,C], 'joint': [NJ,C]}.

    `src_gather(xg, xj) -> (xg_full, xj_full)` materializes the full source
    node tables when node arrays are row-sharded across a mesh axis (graph
    partitioning, parallel.partition); identity when None."""
    C = out_channels
    h, c = state
    xg = jnp.concatenate([grain_in, h["grain"]], axis=1)
    xj = jnp.concatenate([joint_in, h["joint"]], axis=1)
    xg_src, xj_src = (xg, xj) if src_gather is None else src_gather(xg, xj)

    kw = dict(num_gates=NUM_GATES, out_channels=C)
    out_push = apply_period_conv(
        params["conv"]["push"], xg_src, xj, sample.push_nbr, sample.push_len,
        sample.push_mask, **kw,
    )
    out_connect = apply_period_conv(
        params["conv"]["connect"], xj_src, xj, sample.connect_nbr,
        sample.connect_len, sample.connect_mask, **kw,
    )
    out_pull = apply_period_conv(
        params["conv"]["pull"], xj_src, xg, sample.pull_nbr, sample.pull_len,
        sample.pull_mask, **kw,
    )

    joint_gates = out_push + out_connect + params["bias"]["joint"].reshape(-1)
    grain_gates = out_pull + params["bias"]["grain"].reshape(-1)

    h_g, c_g = _lstm_update(grain_gates, c["grain"], C)
    h_j, c_j = _lstm_update(joint_gates, c["joint"], C)
    return {"grain": h_g, "joint": h_j}, {"grain": c_g, "joint": c_j}


# ---------------------------------------------------------------------------
# SAGE cell for stacked layers >= 1 (reference heterogclstm.py)
# ---------------------------------------------------------------------------


def _torch_linear_init(key, fan_in, fan_out, dtype=jnp.float32):
    """torch.nn.Linear default init (kaiming uniform a=sqrt(5) => bound
    1/sqrt(fan_in) for both weight and bias)."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    kw, kb = jax.random.split(key)
    w = jax.random.uniform(kw, (fan_in, fan_out), dtype, -bound, bound)
    b = jax.random.uniform(kb, (fan_out,), dtype, -bound, bound)
    return {"w": w, "b": b}


def init_sage_conv(key, in_src, in_dst, out, num_gates, dtype=jnp.float32):
    """Fused-gate SAGEConv: out = lin_l(mean_j x_j) + lin_r(x_i)
    (PyG SAGEConv defaults used by heterogclstm.py:52-95)."""
    k1, k2 = jax.random.split(key)
    C = out

    def fused(k, fan_in, bias):
        kk = jax.random.split(k, num_gates)
        ws, bs = [], []
        for g in range(num_gates):
            p = _torch_linear_init(kk[g], fan_in, C, dtype)
            ws.append(p["w"])
            bs.append(p["b"] if bias else jnp.zeros((C,), dtype))
        return {"w": jnp.concatenate(ws, axis=1), "b": jnp.concatenate(bs)}

    return {"l": fused(k1, in_src, True), "r": fused(k2, in_dst, False)}


def apply_sage_conv(params, x_src, x_dst, nbr, nbr_mask, *, num_gates, out_channels):
    deg = jnp.sum(nbr_mask, axis=1, keepdims=True)
    mean_nbr = jnp.sum(
        jnp.take(x_src, nbr, axis=0) * nbr_mask[..., None], axis=1
    ) / jnp.maximum(deg, 1.0)
    return (
        mean_nbr @ params["l"]["w"] + params["l"]["b"] + x_dst @ params["r"]["w"]
    )


def init_sage_clstm(key, in_grain, in_joint, out_channels, dtype=jnp.float32):
    C = out_channels
    fg, fj = in_grain + C, in_joint + C
    ks = jax.random.split(key, 5)
    conv = {
        "push": init_sage_conv(ks[0], fg, fj, C, NUM_GATES, dtype),
        "pull": init_sage_conv(ks[1], fj, fg, C, NUM_GATES, dtype),
        "connect": init_sage_conv(ks[2], fj, fj, C, NUM_GATES, dtype),
    }
    bias = {
        "grain": glorot_uniform(ks[3], (NUM_GATES, C), 1, C, dtype),
        "joint": glorot_uniform(ks[4], (NUM_GATES, C), 1, C, dtype),
    }
    return {"conv": conv, "bias": bias}


def apply_sage_clstm(params, sample, grain_in, joint_in, state, out_channels,
                     src_gather=None):
    C = out_channels
    h, c = state
    xg = jnp.concatenate([grain_in, h["grain"]], axis=1)
    xj = jnp.concatenate([joint_in, h["joint"]], axis=1)
    xg_src, xj_src = (xg, xj) if src_gather is None else src_gather(xg, xj)
    kw = dict(num_gates=NUM_GATES, out_channels=C)
    out_push = apply_sage_conv(
        params["conv"]["push"], xg_src, xj, sample.push_nbr, sample.push_mask, **kw
    )
    out_connect = apply_sage_conv(
        params["conv"]["connect"], xj_src, xj, sample.connect_nbr,
        sample.connect_mask, **kw,
    )
    out_pull = apply_sage_conv(
        params["conv"]["pull"], xj_src, xg, sample.pull_nbr, sample.pull_mask, **kw
    )
    joint_gates = out_push + out_connect + params["bias"]["joint"].reshape(-1)
    grain_gates = out_pull + params["bias"]["grain"].reshape(-1)
    h_g, c_g = _lstm_update(grain_gates, c["grain"], C)
    h_j, c_j = _lstm_update(joint_gates, c["joint"], C)
    return {"grain": h_g, "joint": h_j}, {"grain": c_g, "joint": c_j}


def apply_cell(params, sample, grain_in, joint_in, state, out_channels,
               kind="pgclstm", src_gather=None):
    """kind is static config ('pgclstm' for layer 0, 'sage' for layers >= 1,
    mirroring models.py:194-215); it lives in the hyperparameters, not in the
    params pytree, so optimizers see arrays only."""
    if kind == "pgclstm":
        return apply_pgclstm(params, sample, grain_in, joint_in, state,
                             out_channels, src_gather)
    return apply_sage_clstm(params, sample, grain_in, joint_in, state,
                            out_channels, src_gather)


def zero_state(sample: GraphSample, out_channels: int, dtype=jnp.float32):
    """Zero-initialized (h, c) per node type (heteropgclstm.py:101-109)."""
    h = {
        "grain": jnp.zeros((sample.num_grains, out_channels), dtype),
        "joint": jnp.zeros((sample.num_joints, out_channels), dtype),
    }
    c = jax.tree_util.tree_map(jnp.copy, h)
    return h, c


# ---------------------------------------------------------------------------
# Non-recurrent ReLU variants (reference HeteroPGC heteropgclstm.py:185-284,
# HeteroGC heterogclstm.py:199-274, stacked by models.GC:15-148) — exist in
# the reference but unused by the shipped models; provided for API parity
# and ablations.
# ---------------------------------------------------------------------------


def init_pgc(key, in_grain, in_joint, out_channels, dtype=jnp.float32):
    """Single-gate periodic graph conv cell (ReLU activation, no LSTM state)."""
    C = out_channels
    fg, fj = in_grain + C, in_joint + C
    ks = jax.random.split(key, 5)
    conv = {
        "push": init_period_conv(ks[0], fg, fj, C, 1, dtype),
        "pull": init_period_conv(ks[1], fj, fg, C, 1, dtype),
        "connect": init_period_conv(ks[2], fj, fj, C, 1, dtype),
    }
    bias = {
        "grain": glorot_uniform(ks[3], (1, C), 1, C, dtype),
        "joint": glorot_uniform(ks[4], (1, C), 1, C, dtype),
    }
    return {"conv": conv, "bias": bias}


def apply_pgc(params, sample, grain_in, joint_in, state, out_channels):
    """h = relu(conv(cat([x, h])) + b); the cell state passes through
    unchanged (heteropgclstm.py:243-284)."""
    C = out_channels
    h, c = state
    xg = jnp.concatenate([grain_in, h["grain"]], axis=1)
    xj = jnp.concatenate([joint_in, h["joint"]], axis=1)
    kw = dict(num_gates=1, out_channels=C)
    out_push = apply_period_conv(
        params["conv"]["push"], xg, xj, sample.push_nbr, sample.push_len,
        sample.push_mask, **kw,
    )
    out_connect = apply_period_conv(
        params["conv"]["connect"], xj, xj, sample.connect_nbr,
        sample.connect_len, sample.connect_mask, **kw,
    )
    out_pull = apply_period_conv(
        params["conv"]["pull"], xj, xg, sample.pull_nbr, sample.pull_len,
        sample.pull_mask, **kw,
    )
    h_j = jax.nn.relu(out_push + out_connect + params["bias"]["joint"].reshape(-1))
    h_g = jax.nn.relu(out_pull + params["bias"]["grain"].reshape(-1))
    return {"grain": h_g, "joint": h_j}, c
