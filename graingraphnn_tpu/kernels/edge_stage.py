"""Pallas TPU kernel: fused edge stage of the periodic graph-transformer conv.

Fuses, per destination-row tile, entirely in VMEM:

    k_e    = K[nbr] - Pk + shift @ Wk_pos + len * We
    logits = sum_gate_block(Q * k_e) / sqrt(C)
    alpha  = masked softmax over the neighbor axis (per gate)
    pre_v  = V[nbr] - Pv + shift @ Wv_pos
    v      = relu(pre_v) @ Wl2_blockdiag + bl2
    out    = sum_k alpha * (v + len * We)

replacing the chain that XLA would otherwise stage through HBM-sized
[Nd, K, G*C] intermediates (k_e, pre_v, v — ~4 extra HBM round trips of
N*K*G*C floats each). The neighbor gathers (K[nbr], V[nbr]) are performed
outside with XLA's native gather; the value-MLP matmul runs on the MXU as a
dense [G*C, G*C] block-diagonal product (dense-with-zeros beats 4 separate
96x96 matmuls on a 128x128 systolic array: G*C = 384 = 3 aligned tiles).

The kernel upstreams torch-scatter's segment softmax + scatter-add
(reference periodGATconv.py:102,227) into one pass with zero scatters.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _kernel(
    kg_ref,      # [T, Kn, GC] gathered keys
    vg_ref,      # [T, Kn, GC] gathered values
    q_ref,       # [T, GC]
    pk_ref,      # [T, GC]
    pv_ref,      # [T, GC]
    shift_ref,   # [T, Kn, 8]  (3 used, padded for lane alignment)
    elen_ref,    # [T, Kn]
    nmask_ref,   # [T, Kn]
    wkpos_ref,   # [8, GC]
    wvpos_ref,   # [8, GC]
    we_ref,      # [1, GC]
    wl2_ref,     # [GC, GC] block-diagonal
    bl2_ref,     # [1, GC]
    gred_ref,    # [GC, GP] gate-block reduction one-hot (GP = padded gates)
    gexp_ref,    # [GP, GC] gate-block expansion one-hot
    out_ref,     # [T, GC]
    *,
    num_gates: int,
    out_channels: int,
):
    """Mosaic-friendly formulation: a static loop over the Kn neighbor slots
    with pure 2D [T, GC] tiles. Per-gate logit reduction and per-gate alpha
    broadcast are expressed as tiny one-hot matmuls (no lane-dim reshapes,
    which Mosaic cannot shape-cast)."""
    C = out_channels
    q = q_ref[:]
    pk = pk_ref[:]
    pv = pv_ref[:]
    we = we_ref[0][None, :]
    Kn = kg_ref.shape[1]
    inv_sqrt_c = 1.0 / math.sqrt(C)

    # ---- pass 1: per-neighbor gate logits ----
    logits = []  # each [T, GP]
    masks = []   # each [T, 1]
    for k in range(Kn):
        e_k = elen_ref[:, k : k + 1] * we
        shift_k = jnp.dot(
            shift_ref[:, k, :], wkpos_ref[:], preferred_element_type=jnp.float32
        )
        k_e = kg_ref[:, k, :] - pk + shift_k + e_k
        l_k = jnp.dot(q * k_e, gred_ref[:], preferred_element_type=jnp.float32)
        m_k = nmask_ref[:, k : k + 1]
        logits.append(jnp.where(m_k > 0, l_k * inv_sqrt_c, NEG))
        masks.append(m_k)

    lmax = logits[0]
    for l_k in logits[1:]:
        lmax = jnp.maximum(lmax, l_k)
    lmax = jnp.where(lmax <= NEG / 2, jnp.zeros_like(lmax), lmax)

    exps = []
    denom = None
    for l_k, m_k in zip(logits, masks):
        ex = jnp.where(m_k > 0, jnp.exp(l_k - lmax), jnp.zeros_like(l_k))
        exps.append(ex)
        denom = ex if denom is None else denom + ex
    denom = jnp.maximum(denom, 1e-30)

    # ---- pass 2: value path + weighted accumulation ----
    acc = jnp.zeros_like(q)
    for k in range(Kn):
        e_k = elen_ref[:, k : k + 1] * we
        shift_v = jnp.dot(
            shift_ref[:, k, :], wvpos_ref[:], preferred_element_type=jnp.float32
        )
        pre_v = vg_ref[:, k, :] - pv + shift_v
        v_k = jnp.dot(
            jnp.maximum(pre_v, 0.0), wl2_ref[:], preferred_element_type=jnp.float32
        ) + bl2_ref[0][None, :]
        alpha_k = jnp.dot(
            exps[k] / denom, gexp_ref[:], preferred_element_type=jnp.float32
        )
        acc = acc + (v_k + e_k) * alpha_k
    out_ref[:] = acc


def fused_edge_stage(
    Kn_nodes: jnp.ndarray,   # [Ns, GC] node-level key projections
    Vn_nodes: jnp.ndarray,   # [Ns, GC]
    Q: jnp.ndarray,          # [Nd, GC]
    Pk: jnp.ndarray,         # [Nd, GC]
    Pv: jnp.ndarray,         # [Nd, GC]
    pos_src: jnp.ndarray,    # [Ns, 3]
    pos_dst: jnp.ndarray,    # [Nd, 3]
    nbr: jnp.ndarray,        # [Nd, K] int32
    edge_len: jnp.ndarray,   # [Nd, K]
    nbr_mask: jnp.ndarray,   # [Nd, K]
    wk_pos: jnp.ndarray,     # [3, GC]
    wv_pos: jnp.ndarray,     # [3, GC]
    we: jnp.ndarray,         # [GC]
    wl2: jnp.ndarray,        # [G, C, C]
    bl2: jnp.ndarray,        # [G, C]
    *,
    num_gates: int,
    out_channels: int,
    tile: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns aggregated messages [Nd, G*C] (skip connection added by the
    caller). Nd must be padded to a multiple of `tile` by the caller's
    capacity planning (graph.state rounds capacities up)."""
    G, C = num_gates, out_channels
    GC = G * C
    Nd, K = nbr.shape

    kg = jnp.take(Kn_nodes, nbr, axis=0)            # [Nd, K, GC]
    vg = jnp.take(Vn_nodes, nbr, axis=0)
    rel = jnp.take(pos_src, nbr, axis=0) - pos_dst[:, None, :]
    shift = -(rel > 0.5).astype(kg.dtype) + (rel < -0.5).astype(kg.dtype)
    shift = jnp.pad(shift, ((0, 0), (0, 0), (0, 5)))  # lane-pad 3 -> 8

    wl2_dense = jax.scipy.linalg.block_diag(
        *[wl2[g] for g in range(G)]
    ).astype(kg.dtype)
    wk_pos8 = jnp.pad(wk_pos, ((0, 5), (0, 0)))
    wv_pos8 = jnp.pad(wv_pos, ((0, 5), (0, 0)))

    # one-hot gate-block reduce/expand operators (lane-aligned, GP = 128)
    GP = 128
    gate_of_col = np.repeat(np.arange(G), C)
    gred = np.zeros((GC, GP), np.float32)
    gred[np.arange(GC), gate_of_col] = 1.0
    gexp = gred.T.copy()
    gred = jnp.asarray(gred, kg.dtype)
    gexp = jnp.asarray(gexp, kg.dtype)

    T = min(tile, Nd)
    while Nd % T:
        T //= 2
    grid = (Nd // T,)

    def row_spec(block_rows, trailing):
        return pl.BlockSpec(
            (block_rows,) + trailing, lambda i: (i,) + (0,) * len(trailing),
            memory_space=pltpu.VMEM,
        )

    full = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )

    out = pl.pallas_call(
        functools.partial(_kernel, num_gates=G, out_channels=C),
        out_shape=jax.ShapeDtypeStruct((Nd, GC), kg.dtype),
        grid=grid,
        in_specs=[
            row_spec(T, (K, GC)),   # kg
            row_spec(T, (K, GC)),   # vg
            row_spec(T, (GC,)),     # q
            row_spec(T, (GC,)),     # pk
            row_spec(T, (GC,)),     # pv
            row_spec(T, (K, 8)),    # shift
            row_spec(T, (K,)),      # elen
            row_spec(T, (K,)),      # nmask
            full((8, GC)),          # wkpos
            full((8, GC)),          # wvpos
            full((1, GC)),          # we
            full((GC, GC)),         # wl2 dense
            full((1, GC)),          # bl2
            full((GC, 128)),        # gate reduce
            full((128, GC)),        # gate expand
        ],
        out_specs=row_spec(T, (GC,)),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * Nd * K * GC * GC + 6 * Nd * K * GC,
            bytes_accessed=2 * Nd * K * GC * 4 + GC * GC * 4 + Nd * GC * 4 * 4,
            transcendentals=Nd * K * G,
        ),
    )(
        kg, vg, Q, Pk, Pv, shift, edge_len, nbr_mask,
        wk_pos8, wv_pos8, we.reshape(1, GC), wl2_dense,
        bl2.reshape(1, GC), gred, gexp,
    )
    return out


def apply_period_conv_pallas(
    params, x_src, x_dst, nbr, edge_len, nbr_mask,
    *, num_gates: int, out_channels: int, interpret: bool = False,
):
    """Drop-in replacement for ops.period_conv.apply_period_conv with the
    edge stage in one Pallas kernel."""
    from ..ops.period_conv import POS_DIM

    G, C = num_gates, out_channels
    Q = x_dst @ params["query"]["w"] + params["query"]["b"]
    Kn = x_src @ params["key"]["w"] + params["key"]["b"]
    Vn = x_src @ params["value"]["w"] + params["value"]["b"]
    Sk = x_dst @ params["skip"]["w"] + params["skip"]["b"]
    wk_pos = params["key"]["w"][:POS_DIM]
    wv_pos = params["value"]["w"][:POS_DIM]
    Pk = x_dst[:, :POS_DIM] @ wk_pos
    Pv = x_dst[:, :POS_DIM] @ wv_pos

    agg = fused_edge_stage(
        Kn, Vn, Q, Pk, Pv,
        x_src[:, :POS_DIM], x_dst[:, :POS_DIM],
        nbr, edge_len, nbr_mask,
        wk_pos, wv_pos, params["edge"]["w"],
        params["l2"]["w"], params["l2"]["b"],
        num_gates=G, out_channels=C, interpret=interpret,
    )
    return agg + Sk
