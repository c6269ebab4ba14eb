"""Masked segment primitives.

Two families:

* `masked_softmax` / `masked_sum` over a static neighbor axis — the hot-path
  formulation used by the ELL message passing (replaces torch-scatter
  segment softmax / scatter_add, reference periodGATconv.py:227,102).
* COO `segment_sum` / `segment_softmax` via `jax.ops.segment_sum` — the
  correctness baseline and the path used by tests to cross-check the ELL
  formulation against a naive per-edge implementation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def masked_softmax(logits: jnp.ndarray, mask: jnp.ndarray, axis: int = -1):
    """Numerically safe softmax over `axis` where mask==0 entries get zero
    weight. Rows with no valid entries return all zeros (no NaNs, also safe
    under autodiff)."""
    neg = jnp.asarray(_NEG_INF, logits.dtype)
    masked_logits = jnp.where(mask > 0, logits, neg)
    m = jnp.max(masked_logits, axis=axis, keepdims=True)
    # guard fully-masked rows: max == -inf -> shift by 0 instead
    m = jnp.where(m <= neg / 2, jnp.zeros_like(m), m)
    e = jnp.where(mask > 0, jnp.exp(masked_logits - m), jnp.zeros_like(logits))
    denom = jnp.sum(e, axis=axis, keepdims=True)
    return e / jnp.maximum(denom, jnp.asarray(1e-30, logits.dtype))


def masked_sum(values: jnp.ndarray, mask: jnp.ndarray, axis: int):
    return jnp.sum(values * mask, axis=axis)


def segment_sum(values: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int):
    """Scatter-add COO aggregation (baseline path)."""
    return jax.ops.segment_sum(values, segment_ids, num_segments=num_segments)


def segment_softmax(
    logits: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: jnp.ndarray | None = None,
):
    """Per-destination-segment softmax over a COO edge list (baseline path;
    mirrors torch_geometric.utils.softmax)."""
    if mask is not None:
        logits = jnp.where(mask > 0, logits, _NEG_INF)
    seg_max = jax.ops.segment_max(logits, segment_ids, num_segments=num_segments)
    seg_max = jnp.where(seg_max <= _NEG_INF / 2, 0.0, seg_max)
    shifted = logits - seg_max[segment_ids]
    e = jnp.exp(shifted)
    if mask is not None:
        e = jnp.where(mask > 0, e, 0.0)
    denom = jax.ops.segment_sum(e, segment_ids, num_segments=num_segments)
    return e / jnp.maximum(denom[segment_ids], 1e-30)
