"""Pallas TPU kernel: fused periodic graph-transformer conv (bf16 edge stage).

Computes, per destination-row tile, entirely in VMEM (reference semantics:
periodGATconv.py:204-236 — per-edge periodic relocation, key/value
projections, segment softmax, 2-layer value MLP, skip connection):

    x_j'   = [wrap(x_j[:3] - x_i[:3]), x_j[3:]]        (periodic reloc)
    q      = x_i @ Wq + bq
    k_e    = x_j' @ Wk + bk + len * We
    logits = sum_gate_block(q * k_e) / sqrt(C)
    alpha  = masked softmax over the neighbor axis (per gate, fp32)
    v      = relu(x_j' @ Wv + bv) @ Wl2_blockdiag + bl2
    out    = sum_k alpha * (v + len * We)  +  x_i @ Wskip + bsk

Design (v2 — replaces the round-1 kernel that consumed pre-gathered
[Nd, K, G*C] key/value tables):

* The only HBM-resident per-edge array is the gather of RAW source features
  ([Nd, K, 128] bf16 ≈ 8 MB at the 120 um scale) instead of pre-projected
  keys+values ([Nd, K, 384] fp32 x 2 ≈ 50 MB): the K/V projections are
  recomputed per edge INSIDE the kernel as [T, 128] x [128, G*C] MXU
  matmuls. FLOPs are ~7x cheaper than bytes here, so trading bandwidth for
  MXU work wins; it also removes the shift-decomposition epilogue.
* bf16 operands with fp32 accumulation (preferred_element_type); the
  attention softmax and the weighted aggregation stay fp32.
* Per-gate logit reduction / alpha broadcast are tiny one-hot matmuls
  (no lane-dim reshapes, which Mosaic cannot shape-cast).
* Weight matrices are zero-padded from F to 128 lanes so every matmul is
  MXU tile aligned; padded lanes contribute exactly zero.

Forward-only (rollout/serving). Training uses the XLA fp32 formulation in
ops.period_conv, which is autodiff-complete and parity-tested.
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
LANES = 128


def _kernel(
    xd_ref,      # [T, 128] bf16 destination features (zero-padded lanes)
    xe_ref,      # [T, K, 128] bf16 gathered source features
    elen_ref,    # [T, K] f32
    nmask_ref,   # [T, K] f32
    wq_ref, bq_ref,    # [128, GC] bf16, [1, GC] f32
    wk_ref, bk_ref,
    wv_ref, bv_ref,
    wsk_ref, bsk_ref,
    wl2_ref, bl2_ref,  # [GC, GC] bf16 block-diagonal, [1, GC] f32
    we_ref,            # [1, GC] f32
    gred_ref,          # [GC, GP] bf16 gate-block reduction one-hot
    gexp_ref,          # [GP, GC] bf16 gate-block expansion one-hot
    out_ref,           # [T, GC] f32
    *,
    num_gates: int,
    out_channels: int,
    pos_dim: int,
):
    T, Fp = xd_ref.shape
    K = xe_ref.shape[1]
    C = out_channels
    inv_sqrt_c = 1.0 / math.sqrt(C)
    f32 = jnp.float32

    xd = xd_ref[:]
    q = jnp.dot(xd, wq_ref[:], preferred_element_type=f32) + bq_ref[0][None, :]
    sk = jnp.dot(xd, wsk_ref[:], preferred_element_type=f32) + bsk_ref[0][None, :]
    we = we_ref[0][None, :]

    # position-lane mask: periodic wrap applies to the first pos_dim lanes
    # only (periodGATconv.py:209-211). Comparisons run in f32 (Mosaic has no
    # bf16 cmpf); the relocated features are cast back for the MXU matmuls.
    lane = jax.lax.broadcasted_iota(jnp.int32, (T, Fp), 1)
    lane3 = (lane < pos_dim).astype(f32)
    xd3 = xd.astype(f32) * lane3

    # ---- pass 1: relocated features + per-neighbor gate logits ----
    xjps, logits, masks = [], [], []
    for k in range(K):
        xj = xe_ref[:, k, :]
        rel = xj.astype(f32) - xd3
        wrapc = (
            (rel < -0.5).astype(f32) - (rel > 0.5).astype(f32)
        ) * lane3
        xjp = (rel + wrapc).astype(xd.dtype)
        xjps.append(xjp)
        e_k = elen_ref[:, k : k + 1] * we
        k_e = (
            jnp.dot(xjp, wk_ref[:], preferred_element_type=f32)
            + bk_ref[0][None, :]
            + e_k
        )
        l_k = jnp.dot(
            (q * k_e).astype(xd.dtype), gred_ref[:], preferred_element_type=f32
        )
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

    # ---- pass 2: value MLP + weighted accumulation ----
    acc = jnp.zeros((T, q.shape[1]), f32)
    for k in range(K):
        pre_v = (
            jnp.dot(xjps[k], wv_ref[:], preferred_element_type=f32)
            + bv_ref[0][None, :]
        )
        v_k = (
            jnp.dot(
                jnp.maximum(pre_v, 0.0).astype(xd.dtype),
                wl2_ref[:],
                preferred_element_type=f32,
            )
            + bl2_ref[0][None, :]
        )
        alpha_k = jnp.dot(
            (exps[k] / denom).astype(xd.dtype),
            gexp_ref[:],
            preferred_element_type=f32,
        )
        e_k = elen_ref[:, k : k + 1] * we
        acc = acc + (v_k + e_k) * alpha_k
    out_ref[:] = acc + sk


def _pad_lanes(a, lanes=LANES):
    return jnp.pad(a, ((0, 0), (0, lanes - a.shape[1])))


def apply_period_conv_pallas(
    params,
    x_src,      # [Ns, F_src] float32
    x_dst,      # [Nd, F_dst] float32
    nbr,        # [Nd, K] int32
    edge_len,   # [Nd, K] float32
    nbr_mask,   # [Nd, K] float32
    *,
    num_gates: int,
    out_channels: int,
    interpret: bool = False,
    tile: int | None = None,
    compute_dtype=jnp.bfloat16,
    kernel_fn=None,
) -> jnp.ndarray:
    """Drop-in replacement for ops.period_conv.apply_period_conv (attention
    path). Returns [Nd, G*C] float32. F_src/F_dst must be <= 128.

    Nd is padded internally to a tile multiple; padded rows carry zero masks
    (their softmax collapses to the all-masked guard) and are sliced off.

    compute_dtype selects the matmul operand precision: bf16 (default,
    ~4x MXU peak, ~1e-3 forward noise) or f32 (same precision class as the
    XLA formulation — the kernel's remaining win is the fusion: no
    [Nd, K, G*C] HBM intermediates, one launch per conv).

    kernel_fn swaps the kernel BODY while keeping every piece of the
    proven launch plumbing (specs, padding, cost estimate) — used by the
    roofline control experiment (scripts/roofline_control.py) to run the
    bare matmul chain through the exact same pallas_call."""
    G, C = num_gates, out_channels
    GC = G * C
    Nd_in, K = nbr.shape
    if tile is None:
        # measured on v5e (artifacts/kernels_tpu.json tile sweep): T=64 is
        # best below ~2k destination rows, T=256 from there up (0.41->0.47
        # MXU fraction at the 120um scale); T=512 busts scoped VMEM, and
        # so does T=256 with f32 operands at K=16 (2x the stack bytes)
        big = 256 if compute_dtype == jnp.bfloat16 else 128
        tile = big if Nd_in >= 2048 else 64
    f_src = x_src.shape[1]
    assert f_src <= LANES and x_dst.shape[1] <= LANES

    Nd = -(-Nd_in // tile) * tile if Nd_in > tile else Nd_in
    if Nd != Nd_in:
        pad = Nd - Nd_in
        x_dst = jnp.pad(x_dst, ((0, pad), (0, 0)))
        nbr = jnp.pad(nbr, ((0, pad), (0, 0)))
        edge_len = jnp.pad(edge_len, ((0, pad), (0, 0)))
        nbr_mask = jnp.pad(nbr_mask, ((0, pad), (0, 0)))

    cd = compute_dtype
    xs = _pad_lanes(x_src.astype(cd))
    xd = _pad_lanes(x_dst.astype(cd))
    xe = jnp.take(xs, nbr, axis=0)                       # [Nd, K, 128] cd

    def wpad(w):  # [F, GC] -> [128, GC] cd, zero rows beyond F
        return jnp.pad(w.astype(cd), ((0, LANES - w.shape[0]), (0, 0)))

    wl2_dense = jax.scipy.linalg.block_diag(
        *[params["l2"]["w"][g] for g in range(G)]
    ).astype(cd)

    GP = LANES
    gate_of_col = np.repeat(np.arange(G), C)
    gred = np.zeros((GC, GP), np.float32)
    gred[np.arange(GC), gate_of_col] = 1.0
    gexp = jnp.asarray(gred.T, cd)
    gred = jnp.asarray(gred, cd)

    T = min(tile, Nd)
    while Nd % T:
        T //= 2
    grid = (Nd // T,)

    def row_spec(trailing):
        return pl.BlockSpec(
            (T,) + trailing, lambda i: (i,) + (0,) * len(trailing),
            memory_space=pltpu.VMEM,
        )

    full = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )

    b = lambda p: p["b"].reshape(1, GC).astype(jnp.float32)
    out = pl.pallas_call(
        functools.partial(
            kernel_fn or _kernel, num_gates=G, out_channels=C, pos_dim=3
        ),
        out_shape=jax.ShapeDtypeStruct((Nd, GC), jnp.float32),
        grid=grid,
        in_specs=[
            row_spec((LANES,)),      # xd
            row_spec((K, LANES)),    # xe
            row_spec((K,)),          # elen
            row_spec((K,)),          # nmask
            full((LANES, GC)), full((1, GC)),   # q
            full((LANES, GC)), full((1, GC)),   # k
            full((LANES, GC)), full((1, GC)),   # v
            full((LANES, GC)), full((1, GC)),   # skip
            full((GC, GC)), full((1, GC)),      # l2
            full((1, GC)),                      # we
            full((GC, GP)),                     # gate reduce
            full((GP, GC)),                     # gate expand
        ],
        out_specs=row_spec((GC,)),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * Nd * K * LANES * GC * 2 + 2 * Nd * K * GC * GC
            + 8 * Nd * K * GC,
            bytes_accessed=Nd * K * LANES * 2 + 4 * LANES * GC * 2
            + GC * GC * 2 + Nd * GC * 4,
            transcendentals=Nd * K * G,
        ),
    )(
        xd, xe,
        edge_len.astype(jnp.float32), nbr_mask.astype(jnp.float32),
        wpad(params["query"]["w"]), b(params["query"]),
        wpad(params["key"]["w"]), b(params["key"]),
        wpad(params["value"]["w"]), b(params["value"]),
        wpad(params["skip"]["w"]), b(params["skip"]),
        wl2_dense, params["l2"]["b"].reshape(1, GC).astype(jnp.float32),
        params["edge"]["w"].reshape(1, GC).astype(jnp.float32),
        gred, gexp,
    )
    return out[:Nd_in].astype(x_src.dtype)
