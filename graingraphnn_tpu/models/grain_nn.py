"""GrainNN regressor and classifier (reference models.py:351-611).

Architecture: SeqGCLSTM **encoder** from zero state -> SeqGCLSTM **decoder**
re-reading the same input warm-started with the encoder state -> heads
(models.py:422-434). With the shipped configs each Seq stack is one fused
HeteroPGCLSTM cell; parameter totals reproduce the reference exactly
(1,204,612 regressor / 1,204,806 classifier — model/*_logfile).

All apply_* functions operate on one `GraphSample`; use jax.vmap for batches.
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp

from ..graph import schema
from ..graph.state import GraphSample
from . import cells, lstm
from .hyper import HyperParams

HISTORY_DIMS = {"joint": 2, "grain": 1}  # models.py:383


def _torch_linear_init(key, fan_in, fan_out, dtype=jnp.float32):
    bound = 1.0 / math.sqrt(fan_in)
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.uniform(kw, (fan_in, fan_out), dtype, -bound, bound),
        "b": jax.random.uniform(kb, (fan_out,), dtype, -bound, bound),
    }


def _init_stack(key, hp: HyperParams, dtype):
    """One SeqGCLSTM stack: layer 0 periodic cell, layers >= 1 SAGE cells
    (models.py:194-215)."""
    C = hp.layer_size
    keys = jax.random.split(key, hp.layers)
    stack = []
    for i, kind in enumerate(hp.cell_kinds):
        if kind == "pgclstm":
            stack.append(
                cells.init_pgclstm(keys[i], hp.in_grain, hp.in_joint, C, dtype)
            )
        else:
            stack.append(cells.init_sage_clstm(keys[i], C, C, C, dtype))
    return stack


def _apply_stack(stack, hp: HyperParams, sample, grain_in, joint_in, states,
                 src_gather=None):
    """states: list of (h, c) per layer, or None for zeros. Returns the new
    list of (h, c). seq_len is 1 (models.py:235)."""
    C = hp.layer_size
    if states is None:
        states = [cells.zero_state(sample, C, grain_in.dtype) for _ in stack]
    new_states = []
    g_in, j_in = grain_in, joint_in
    for layer, (params, kind) in enumerate(zip(stack, hp.cell_kinds)):
        h, c = cells.apply_cell(
            params, sample, g_in, j_in, states[layer], C, kind=kind,
            src_gather=src_gather,
        )
        new_states.append((h, c))
        g_in, j_in = h["grain"], h["joint"]
    return new_states


def _encode_decode(params, hp, sample, src_gather=None):
    enc_states = _apply_stack(
        params["encoder"], hp, sample, sample.grain_x, sample.joint_x, None,
        src_gather,
    )
    dec_states = _apply_stack(
        params["decoder"], hp, sample, sample.grain_x, sample.joint_x,
        enc_states, src_gather,
    )
    h, _c = dec_states[-1]
    return h


# ---------------------------------------------------------------------------
# Regressor (models.py:351-527)
# ---------------------------------------------------------------------------


def init_regressor(key: jax.Array, hp: HyperParams, dtype=jnp.float32) -> Dict:
    k_enc, k_dec, k_hg, k_hj, k_e, k_l = jax.random.split(key, 6)
    C = hp.layer_size
    head_in = 2 * C if hp.history else C
    params = {
        "encoder": _init_stack(k_enc, hp, dtype),
        "decoder": _init_stack(k_dec, hp, dtype),
        "head": {
            "grain": _torch_linear_init(k_hg, head_in, hp.n_grain_targets, dtype),
            "joint": _torch_linear_init(k_hj, head_in, hp.n_joint_targets, dtype),
        },
    }
    if hp.history:
        # optional temporal branch over past gradients (models.py:385-390)
        kg, kj = jax.random.split(k_l)
        params["lstm"] = {
            "grain": lstm.init_lstm(kg, HISTORY_DIMS["grain"], C, dtype),
            "joint": lstm.init_lstm(kj, HISTORY_DIMS["joint"], C, dtype),
        }
    if hp.edge_len:
        # optional edge-length head (models.py:395-396,455-464). The
        # reference declares Linear(2C+2, 1) but feeds a 2C+1 pair feature
        # ([h_src, h_dst, edge_len]) — that path would not run as shipped;
        # here the head is sized consistently with its input.
        params["lin1"] = _torch_linear_init(k_e, 2 * head_in + 1, 1, dtype)
    return params


def apply_regressor(params: Dict, hp: HyperParams, sample: GraphSample,
                    src_gather=None, node_gather=None) -> Dict:
    """Returns y_dict:
      'joint': [NJ, 2] tanh(dx,dy) in [-1,1]
      'grain': [NG, 2] (tanh darea, relu extraV)
      'grain_area': [NG] predicted absolute area (models.py:445-446)
      'edge' (optional): [E] tanh length change

    src_gather/node_gather materialize full node tables under row sharding
    (parallel.partition); None on a single device.
    """
    h = _encode_decode(params, hp, sample, src_gather)
    hg, hj = h["grain"], h["joint"]
    if hp.history and "lstm" in params:
        hg = jnp.concatenate([
            hg,
            lstm.apply_lstm(
                params["lstm"]["grain"],
                lstm.history_inputs(sample.grain_x, HISTORY_DIMS["grain"], hp.window),
                hp.layer_size,
            ),
        ], axis=1)
        hj = jnp.concatenate([
            hj,
            lstm.apply_lstm(
                params["lstm"]["joint"],
                lstm.history_inputs(sample.joint_x, HISTORY_DIMS["joint"], hp.window),
                hp.layer_size,
            ),
        ], axis=1)

    y_joint = jnp.tanh(hj @ params["head"]["joint"]["w"] + params["head"]["joint"]["b"])
    y_grain_raw = hg @ params["head"]["grain"]["w"] + params["head"]["grain"]["b"]

    darea = jnp.tanh(y_grain_raw[:, 0])
    extrav = jax.nn.relu(y_grain_raw[:, 1])
    area = darea / schema.TARGET_SCALING["grain"] + sample.grain_x[:, schema.GRAIN_AREA_COL]

    out = {
        "joint": y_joint,
        "grain": jnp.stack([darea, extrav], axis=1),
        "grain_area": area,
    }
    if hp.edge_len and "lin1" in params:
        hj_full = hj if node_gather is None else node_gather(hj)
        pair = jnp.concatenate(
            [
                jnp.take(hj_full, sample.jj_src, axis=0),
                jnp.take(hj_full, sample.jj_dst, axis=0),
                sample.jj_len[:, None],
            ],
            axis=1,
        )
        out["edge"] = jnp.tanh(pair @ params["lin1"]["w"] + params["lin1"]["b"])[:, 0]
    return out


# ---------------------------------------------------------------------------
# Classifier (models.py:529-611)
# ---------------------------------------------------------------------------


def init_classifier(
    key: jax.Array,
    hp: HyperParams,
    regressor_params: Dict | None = None,
    dtype=jnp.float32,
) -> Dict:
    """If `regressor_params` is given, the encoder/decoder are copied from the
    trained regressor (transfer learning, models.py:551-552)."""
    k_enc, k_dec, k1, k2 = jax.random.split(key, 4)
    C = hp.layer_size
    head_in = 3 * C if hp.history else 2 * C
    if regressor_params is not None:
        encoder = jax.tree_util.tree_map(jnp.copy, regressor_params["encoder"])
        decoder = jax.tree_util.tree_map(jnp.copy, regressor_params["decoder"])
    else:
        encoder = _init_stack(k_enc, hp, dtype)
        decoder = _init_stack(k_dec, hp, dtype)
    return {
        "encoder": encoder,
        "decoder": decoder,
        "lin1": _torch_linear_init(k1, head_in + 1, 2, dtype),  # length pred
        "lin2": _torch_linear_init(k2, head_in + 1, 1, dtype),  # event logit
    }


def apply_classifier(params: Dict, hp: HyperParams, sample: GraphSample,
                     src_gather=None, node_gather=None) -> Dict:
    """Returns y_dict:
      'edge_event': [E] raw logits per directed jj edge
      'edge': [E, 2] tanh length prediction
    """
    h = _encode_decode(params, hp, sample, src_gather)
    hj = h["joint"]
    hj_full = hj if node_gather is None else node_gather(hj)
    pair = jnp.concatenate(
        [
            jnp.take(hj_full, sample.jj_src, axis=0),
            jnp.take(hj_full, sample.jj_dst, axis=0),
            sample.jj_len[:, None],
        ],
        axis=1,
    )
    logits = (pair @ params["lin2"]["w"] + params["lin2"]["b"])[:, 0]
    edge = jnp.tanh(pair @ params["lin1"]["w"] + params["lin1"]["b"])
    return {"edge_event": logits, "edge": edge}


def count_params(tree) -> int:
    import numpy as np

    return int(sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(tree)))
