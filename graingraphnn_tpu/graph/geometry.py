"""Periodic-domain geometry helpers (unit square, period 1).

JAX counterparts of the minimum-image conventions used throughout the
reference (graph_datastruct.py:55-85, models.py:1103-1113,
periodGATconv.py:209-211). All functions are jit/vmap friendly and work on
both jnp and np arrays.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def wrap_shift(rel):
    """Integer lattice shift in {-1, 0, +1} that maps `rel` to its minimum
    image: shift = -1*(rel>0.5) + 1*(rel<-0.5)."""
    return -(rel > 0.5).astype(rel.dtype) + (rel < -0.5).astype(rel.dtype)


def min_image(rel):
    """Minimum-image displacement for coordinates in a period-1 domain."""
    return rel + wrap_shift(rel)


def periodic_move(p, pc):
    """Shift point(s) `p` by whole periods so they lie in the same image as
    `pc` (reference models.py:1103-1106)."""
    return p + wrap_shift(p - pc)


def periodic_dist(p, pc):
    """Euclidean distance with minimum-image wraparound
    (reference graph_datastruct.py:75-85)."""
    rel = min_image(jnp.asarray(p) - jnp.asarray(pc))
    return jnp.sqrt(jnp.sum(rel * rel, axis=-1))


def periodic_dist_np(p, pc):
    rel = np.asarray(p, dtype=np.float64) - np.asarray(pc, dtype=np.float64)
    rel += -(rel > 0.5).astype(rel.dtype) + (rel < -0.5).astype(rel.dtype)
    return float(np.sqrt(np.sum(rel * rel)))


def periodic_unit(p, pc, eps: float = 1e-6):
    """Unit vector from `pc` toward `p` under minimum image
    (reference models.py:1108-1113)."""
    rel = min_image(jnp.asarray(p) - jnp.asarray(pc))
    norm = jnp.sqrt(jnp.sum(rel * rel, axis=-1, keepdims=True))
    return rel / jnp.maximum(norm, eps)


def point_in_triangle(t, v1, v2, v3) -> bool:
    """Host-side periodic point-in-triangle test used by the topology editor
    (reference models.py:1055-1070). Numpy, not jitted: runs in the host
    rollout editor only."""
    t = np.asarray(t, dtype=np.float64)

    def move(v):
        v = np.asarray(v, dtype=np.float64)
        rel = v - t
        return v - (rel > 0.5) + (rel < -0.5)

    def sign(a, b, c):
        return (a[0] - c[0]) * (b[1] - c[1]) - (b[0] - c[0]) * (a[1] - c[1])

    v1m, v2m, v3m = move(v1), move(v2), move(v3)
    d1 = sign(t, v1m, v2m)
    d2 = sign(t, v2m, v3m)
    d3 = sign(t, v3m, v1m)
    has_neg = (d1 < 0) or (d2 < 0) or (d3 < 0)
    has_pos = (d1 > 0) or (d2 > 0) or (d3 > 0)
    return not (has_neg and has_pos)


def in_bound(x, y, max_y: float = 1.0) -> bool:
    """Half-open unit-cell membership used when deduplicating periodic
    Voronoi vertices (reference graph_datastruct.py:37-53)."""
    return -1e-12 < x <= 1 + 1e-12 and -1e-12 < y <= max_y + 1e-12
