"""Training losses (reference train.py:22-71), padding-exact.

The reference computes `torch.mean` over its trajectory-sized arrays (dead
rows included in the denominator); here sums are divided by the stored
unpadded row counts so the value is identical under any padding capacity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..graph.state import GraphSample


def regressor_loss(pred: dict, sample: GraphSample, edge_len: bool = False):
    """100 * (mean(mask_j*(y_j-p_j)^2) + mean(mask_g*(y_g-p_g)^2))
    (train.py:33-38)."""
    jm = sample.joint_mask[:, None]
    gm = sample.grain_mask[:, None]
    j_sq = jnp.sum(jm * (sample.y_joint - pred["joint"]) ** 2)
    g_sq = jnp.sum(gm * (sample.y_grain - pred["grain"]) ** 2)
    loss = j_sq / (sample.n_joint_rows * 2.0) + g_sq / (sample.n_grain_rows * 2.0)
    if edge_len and "edge" in pred:
        e_sq = jnp.sum(sample.y_edge_mask * (sample.y_edge - pred["edge"]) ** 2)
        loss = loss + e_sq / jnp.maximum(sample.n_jj_rows, 1.0)
    return 100.0 * loss


def classifier_loss(pred: dict, sample: GraphSample, pos_weight: float = 1.0):
    """BCE-with-logits with positive-class weight over valid (label > -1)
    jj edges (train.py:40-71)."""
    z = pred["edge_event"]
    y = sample.y_edge_event
    valid = (y > -1.0).astype(z.dtype) * sample.jj_mask
    y01 = jnp.clip(y, 0.0, 1.0)
    # log-sigmoid formulation: -[w*y*log s(z) + (1-y)*log(1-s(z))]
    per_edge = pos_weight * y01 * jax.nn.softplus(-z) + (1.0 - y01) * jax.nn.softplus(z)
    n_valid = jnp.maximum(jnp.sum(valid), 1.0)
    return jnp.sum(per_edge * valid) / n_valid


def batched(fn):
    """Average a per-sample loss over a leading batch axis (matches summing
    PyG's disjoint-union batch then dividing by total rows when all samples
    share one padding)."""

    def wrapped(pred, batch, **kw):
        vals = jax.vmap(lambda p, s: fn(p, s, **kw))(pred, batch)
        return jnp.mean(vals)

    return wrapped
