"""Roofline CONTROL experiment (VERDICT r4 task 4).

kernels_tpu.json's large-graph rows peak at ~0.48 of bf16 MXU peak and the
recorded verdict blames MXU pipeline efficiency on the family's
[T,128]x[128,384] contraction widths. This script proves or refutes that
claim with a bare-matmul kernel body that executes the EXACT K-unrolled
matmul chain of kernels/edge_stage._kernel — per edge slot: key projection
[T,128]x[128,GC], gate-reduce [T,GC]x[GC,128], value projection
[T,128]x[128,GC], value MLP [T,GC]x[GC,GC], gate-expand [T,128]x[128,GC];
plus query+skip per tile — with everything else REMOVED: no periodic
relocation, no softmax/exp, no masks. The body runs through
apply_period_conv_pallas's `kernel_fn` hook, so every piece of the proven
launch plumbing (BlockSpecs, lane padding, cost estimate, tile handling)
is byte-identical to the measured kernel. (A from-scratch pallas_call
assembly of the same chain hung the tunneled chip — hence the shared
plumbing.)

Two variants bracket the answer:
  * control        — same HBM traffic as the real kernel (the per-edge
                     operand array is still read);
  * control_noread — reuses the destination tile for every k: the per-edge
                     array is never touched, pure MXU chain.

If BOTH cap near 0.5 of bf16 peak, the ~0.5 ceiling is the contraction
widths' MXU pipeline efficiency — the BASELINE >=70% SpMM line is measured
unreachable for this model family. If control_noread exceeds ~0.6, the gap
is memory/fusion headroom in edge_stage and the verdict must be revised.

Appends `control_cases` + `control_verdict` to artifacts/kernels_tpu.json.
Run on the real TPU (alone — never alongside a training job):
    python scripts/roofline_control.py
"""

from __future__ import annotations

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from graingraphnn_tpu.kernels import edge_stage
from graingraphnn_tpu.kernels.edge_stage import (
    LANES, apply_period_conv_pallas)
from graingraphnn_tpu.utils import profiling
from scripts.kernel_bench import BF16_PEAK, HBM_PEAK, kernel_mxu_flops

G, C = 4, 96
GC = G * C


def _control_body(
    xd_ref, xe_ref, elen_ref, nmask_ref,
    wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wsk_ref, bsk_ref,
    wl2_ref, bl2_ref, we_ref, gred_ref, gexp_ref, out_ref,
    *, num_gates: int, out_channels: int, pos_dim: int,
    read_edges: bool = True,
):
    """edge_stage._kernel's matmul chain with reloc/softmax/masks removed.
    Same ref signature (the unused refs still arrive; `read_edges=False`
    additionally never touches the per-edge array)."""
    f32 = jnp.float32
    K = xe_ref.shape[1]
    xd = xd_ref[:]
    q = jnp.dot(xd, wq_ref[:], preferred_element_type=f32)
    sk = jnp.dot(xd, wsk_ref[:], preferred_element_type=f32)
    acc = jnp.zeros_like(q)
    for k in range(K):
        xj = xe_ref[:, k, :] if read_edges else xd
        k_e = jnp.dot(xj, wk_ref[:], preferred_element_type=f32)
        l_k = jnp.dot((q * k_e).astype(xd.dtype), gred_ref[:],
                      preferred_element_type=f32)
        pre_v = jnp.dot(xj, wv_ref[:], preferred_element_type=f32)
        v_k = jnp.dot(jnp.maximum(pre_v, 0.0).astype(xd.dtype),
                      wl2_ref[:], preferred_element_type=f32)
        alpha = jnp.dot(l_k.astype(xd.dtype), gexp_ref[:],
                        preferred_element_type=f32)
        acc = acc + v_k * alpha
    out_ref[:] = acc + sk


def _params(rng):
    def lin(n_in):
        return {"w": rng.normal(0, 0.1, (n_in, GC)).astype(np.float32),
                "b": rng.normal(0, 0.1, GC).astype(np.float32)}
    return {
        "query": lin(8), "key": lin(8), "value": lin(8), "skip": lin(8),
        "l2": {"w": rng.normal(0, 0.1, (G, C, C)).astype(np.float32),
               "b": rng.normal(0, 0.1, GC).astype(np.float32)},
        "edge": {"w": rng.normal(0, 0.1, GC).astype(np.float32)},
    }


def run_control(nd: int, K: int, tile: int, *, read_edges: bool):
    rng = np.random.default_rng(0)
    params = _params(rng)
    x_src = jnp.asarray(rng.normal(0, 1, (nd, 8)), jnp.float32)
    x_dst = jnp.asarray(rng.normal(0, 1, (nd, 8)), jnp.float32)
    # sequential neighbor ids: the gather of x_src rows degenerates to a
    # contiguous read (same bytes, no scatter/gather irregularity)
    nbr = jnp.broadcast_to(
        jnp.arange(nd, dtype=jnp.int32)[:, None], (nd, K))
    elen = jnp.ones((nd, K), jnp.float32)
    mask = jnp.ones((nd, K), jnp.float32)

    kfn = functools.partial(_control_body, read_edges=read_edges)

    def f(c):
        xs = x_src.at[0, 0].add(c * 1e-20)
        return apply_period_conv_pallas(
            params, xs, x_dst, nbr, elen, mask,
            num_gates=G, out_channels=C, tile=tile, kernel_fn=kfn,
        ).sum() * 1e-20 + c

    # each call is ~hundreds of GFLOP (ms-scale): short scans amortize the
    # ~30 ms tunnel launch overhead fine
    t = profiling.slope_time(f, n1=20, n2=120)
    mxu = kernel_mxu_flops(nd, K, GC)
    byt = (nd * K * LANES * 2 if read_edges else 0) + nd * LANES * 2 \
        + 5 * LANES * GC * 2 + GC * GC * 2 + nd * GC * 4
    return {
        "nd": nd, "K": K, "tile": tile, "read_edges": read_edges,
        "us": round(t * 1e6, 1),
        "mxu_tflops": round(mxu / t / 1e12, 1),
        "mxu_bf16_peak_fraction": round(mxu / t / BF16_PEAK, 3),
        "hbm_fraction": round(byt / t / HBM_PEAK, 3),
    }


def main():
    dev = jax.devices()[0]
    if dev.platform not in ("tpu",):
        print(f"WARNING: running on {dev.platform}, not TPU — control "
              f"numbers are meaningless off-TPU", file=sys.stderr)
    rows = []
    # the two shapes of the large-graph rows: pull K=16 (nd = grains) and
    # connect K=3 (nd = joints), at the ~1M-edge scale
    for nd, K in ((49152, 16), (98304, 3)):
        for tile in (64, 128, 256):
            for read_edges in (True, False):
                try:
                    r = run_control(nd, K, tile, read_edges=read_edges)
                except Exception as e:  # VMEM bust at big tiles
                    r = {"nd": nd, "K": K, "tile": tile,
                         "read_edges": read_edges,
                         "error": str(e).splitlines()[0][:120]}
                rows.append(r)
                print(json.dumps(r), flush=True)

    ok = [r for r in rows if "error" not in r]
    best = max(ok, key=lambda r: r["mxu_bf16_peak_fraction"])
    best_noread = max((r for r in ok if not r["read_edges"]),
                      key=lambda r: r["mxu_bf16_peak_fraction"])
    path = os.path.join("artifacts", "kernels_tpu.json")
    with open(path) as f:
        art = json.load(f)
    art["control_cases"] = rows
    peak_real = max(c["mxu_bf16_peak_fraction"] for c in art["cases"])
    frac = best["mxu_bf16_peak_fraction"]
    nofrac = best_noread["mxu_bf16_peak_fraction"]
    if nofrac < 0.6:
        verdict = (
            f"CONTROL CONFIRMS the ceiling: the bare matmul chain with "
            f"zero per-edge HBM traffic peaks at {nofrac:.3f} of bf16 peak "
            f"(same-traffic control {frac:.3f}; real kernel {peak_real:.3f})"
            f" — the ~0.5 cap is MXU pipeline efficiency on the family's "
            f"[T,128]x[128,384] contraction widths, and the BASELINE >=70% "
            f"target is measured unreachable for this model family."
        )
    else:
        verdict = (
            f"CONTROL REFUTES the pipeline-bound claim: the bare chain "
            f"reaches {nofrac:.3f} (no-read) / {frac:.3f} (same-traffic) "
            f"vs the real kernel's {peak_real:.3f} — headroom exists in "
            f"edge_stage; close the gap."
        )
    art["control_verdict"] = verdict
    with open(path, "w") as f:
        json.dump(art, f, indent=1)
    print(verdict)
    print("wrote", path)


if __name__ == "__main__":
    main()
