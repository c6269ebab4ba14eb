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

v3 (round 5): `_kernel_flat` — the same math with the K dimension
flattened into matmul rows ([T*K, 128] x [128, GC] per projection),
auto-selected for K >= 8 after the roofline control experiment showed
the K-unrolled chain was bound by per-edge streaming through K small
matmuls (kernels_tpu.json: pull-conv MXU fraction 0.47 -> 0.62). Any
custom body can also be injected through `kernel_fn` while reusing this
module's proven launch plumbing (the control experiment's path).
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


def _kernel_flat(
    xd_ref, xe_ref, elen_ref, nmask_ref,
    wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wsk_ref, bsk_ref,
    wl2_ref, bl2_ref, we_ref, gred_ref, gexp_ref, out_ref,
    *, num_gates: int, out_channels: int, pos_dim: int,
):
    """K-FLATTENED variant of _kernel (round 5, roofline-control-driven):
    identical math, but the per-edge projections run as ONE [T*K, 128] x
    [128, GC] matmul per weight instead of K separate [T, 128] ones.

    The control experiment (scripts/roofline_control.py,
    kernels_tpu.json:control_cases) showed the K-unrolled chain caps at
    ~0.55 of bf16 peak while the same chain without per-edge streaming
    exceeds it — the ceiling was the K small matmuls, not the
    [.,128]x[128,384] widths. Flattening K into the row dimension gives
    the MXU 16x-taller operands at K=16. Same ref signature; selected via
    apply_period_conv_pallas(flat=True)."""
    T, Fp = xd_ref.shape
    K = xe_ref.shape[1]
    C = out_channels
    inv_sqrt_c = 1.0 / math.sqrt(C)
    f32 = jnp.float32
    TK = T * K

    xd = xd_ref[:]
    q = jnp.dot(xd, wq_ref[:], preferred_element_type=f32) + bq_ref[0][None, :]
    sk = jnp.dot(xd, wsk_ref[:], preferred_element_type=f32) + bsk_ref[0][None, :]
    we = we_ref[0][None, :]
    GC = q.shape[1]

    lane = jax.lax.broadcasted_iota(jnp.int32, (T, Fp), 1)
    lane3 = (lane < pos_dim).astype(f32)
    xd3 = xd.astype(f32) * lane3

    # flatten K into rows: [T, K, .] -> [T*K, .] — legal only with the
    # lane (last) dim preserved, so [T, K] scalars ride as [T, K, 1]
    # broadcasts instead of [TK, 1] reshapes (Mosaic rejects lane
    # collapses: "unsupported shape cast")
    xe = xe_ref[:].reshape(TK, Fp)
    xd3_rep = jnp.broadcast_to(xd3[:, None, :], (T, K, Fp)).reshape(TK, Fp)
    lane3_rep = jnp.broadcast_to(
        lane3[:, None, :], (T, K, Fp)).reshape(TK, Fp)
    elen3 = elen_ref[:][:, :, None]                              # [T, K, 1]
    nmask3 = nmask_ref[:][:, :, None]

    rel = xe.astype(f32) - xd3_rep
    wrapc = ((rel < -0.5).astype(f32) - (rel > 0.5).astype(f32)) * lane3_rep
    xjp = (rel + wrapc).astype(xd.dtype)

    e_all = (elen3 * we[None, :, :]).reshape(TK, GC)             # [TK, GC]
    k_e = (jnp.dot(xjp, wk_ref[:], preferred_element_type=f32)
           + bk_ref[0][None, :] + e_all)
    q_rep = jnp.broadcast_to(q[:, None, :], (T, K, GC)).reshape(TK, GC)
    GP = gred_ref.shape[1]
    l_all = jnp.dot((q_rep * k_e).astype(xd.dtype), gred_ref[:],
                    preferred_element_type=f32)                  # [TK, GP]
    nm_flat = jnp.broadcast_to(nmask3, (T, K, GP)).reshape(TK, GP)
    l_all = jnp.where(nm_flat > 0, l_all * inv_sqrt_c, NEG)

    # softmax over the K axis per destination row (per gate lane)
    l3 = l_all.reshape(T, K, GP)
    lmax = jnp.max(l3, axis=1, keepdims=True)
    lmax = jnp.where(lmax <= NEG / 2, jnp.zeros_like(lmax), lmax)
    ex3 = jnp.where(
        nmask3 > 0, jnp.exp(l3 - lmax), jnp.zeros_like(l3))
    denom = jnp.maximum(jnp.sum(ex3, axis=1, keepdims=True), 1e-30)
    alpha = (ex3 / denom).reshape(TK, GP)

    pre_v = (jnp.dot(xjp, wv_ref[:], preferred_element_type=f32)
             + bv_ref[0][None, :])
    v_all = (jnp.dot(jnp.maximum(pre_v, 0.0).astype(xd.dtype), wl2_ref[:],
                     preferred_element_type=f32)
             + bl2_ref[0][None, :])
    alpha_exp = jnp.dot(alpha.astype(xd.dtype), gexp_ref[:],
                        preferred_element_type=f32)              # [TK, GC]
    contrib = (v_all + e_all) * alpha_exp
    out_ref[:] = jnp.sum(contrib.reshape(T, K, GC), axis=1) + sk


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
    flat: bool | None = None,
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
    bare matmul chain through the exact same pallas_call.

    flat selects the K-FLATTENED body (_kernel_flat): None (default) =
    auto — flat for K >= 8, where turning K separate [T,128] matmuls
    into one [T*K,128] matmul raises MXU utilization 0.42->0.53 at the
    1M-edge pull shape and 0.56->0.77 at the 240um shape (measured round
    5, the roofline-control follow-up); the K=3 connect/push shapes stay
    on the K-unrolled body (flat measured 2x SLOWER there — the
    broadcast/reshape relayouts dominate at small K)."""
    G, C = num_gates, out_channels
    GC = G * C
    Nd_in, K = nbr.shape
    if kernel_fn is None and (flat if flat is not None else K >= 8):
        kernel_fn = _kernel_flat
        # [T*K, GC] f32 intermediates: tile 256 busts scoped VMEM at
        # K=16; 64 measured best-or-tied across scales and dtypes
        if tile is None:
            tile = 64
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
