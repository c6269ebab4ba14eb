"""Whole-step time breakdown of the device-resident rollout scan
(VERDICT round-2 item 4).

Measures what fraction of a rollout span-step goes to each stage of
rollout.device_rollout.device_step, on real Voronoi microstructures at the
40 and 120 um scales:

    ell_rebuild   make_sample (sorted ELL + edge lengths)
    forward       regressor + classifier convs (the MXU work)
    integrate     feature integration + elimination candidates
    editor        jit topology editor (sequential event chains)
    finalize      E_pp compaction + grain centers

Method: five jitted scans build the step up stage by stage; adjacent
differences give component times. Each variant threads a runtime zero
(scan xs) through the carried state so XLA cannot hoist loop-invariant
work out of the loop. Residual fusion effects make the split approximate,
but it is measured on the exact shipped step (same thresholds/capacities
as bench.py) and directs the editor-bound optimization work.

Usage: python scripts/step_breakdown.py [--steps 20] [--out artifacts/STEP_BREAKDOWN.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax                      # noqa: E402
import jax.numpy as jnp         # noqa: E402

from graingraphnn_tpu.rollout import device_rollout as dr   # noqa: E402
from graingraphnn_tpu.rollout import topology_jit as tj     # noqa: E402
from graingraphnn_tpu.train import checkpoint               # noqa: E402

C_THRESHOLD = 0.99   # bench.py's rollout-tuned threshold
R_THRESHOLD = 1e-4
SPAN = 6


def _variants(rp, hp_r, cp, hp_c, ring, fused=False):
    """Each returns (state, leak_scalar); `leak` is folded into the state
    through the runtime zero so nothing is dead code."""

    def v_sample(st, _z):
        sample, ovf = dr.make_sample(st, ring)
        leak = (sample.push_mask.sum() + sample.pull_mask.sum()
                + sample.connect_mask.sum() + sample.pull_len.sum())
        return st, leak

    def v_forward(st, _z):
        sample, y_r, y_c, ovf = dr.forward_stage(rp, hp_r, cp, hp_c, st, ring)
        leak = (y_r["joint"].sum() + y_r["grain"].sum()
                + y_r["grain_area"].sum() + y_c["edge_event"].sum())
        return st, leak

    def v_integrate(st, _z):
        sample, y_r, y_c, ovf = dr.forward_stage(rp, hp_r, cp, hp_c, st, ring)
        xg, xj = dr.integrate_stage(st, y_r["joint"], y_r["grain"], SPAN)
        ge, n_cand = dr.elim_candidates(st, y_r["grain_area"], R_THRESHOLD)
        st = st._replace(xg=xg, xj=xj)
        return st, y_c["edge_event"].sum() + ge.sum()

    def v_editor(st, _z):
        sample, y_r, y_c, ovf = dr.forward_stage(rp, hp_r, cp, hp_c, st, ring)
        xg, xj = dr.integrate_stage(st, y_r["joint"], y_r["grain"], SPAN)
        ge, n_cand = dr.elim_candidates(st, y_r["grain_area"], R_THRESHOLD)
        tstate, switching, extra = dr.edit_stage(
            st, xg, xj, y_r["joint"], y_r["grain"], y_c["edge_event"],
            ge, C_THRESHOLD, fused=fused)
        # ELL structures carried stale (not updated): keeps the scan carry
        # intact without charging the incremental updates to this stage —
        # update_ell_cols lands in 'finalize' via v_full
        st = st._replace(
            xg=xg, xj=tstate.xj, E_pp=tstate.E_pp, E_pq=tstate.E_pq,
            mask_g=tstate.mask_g, mask_j=tstate.mask_j,
            n_pp=tstate.append_ptr)
        return st, switching.sum().astype(jnp.float32)

    def v_full(st, _z):
        st, aux = dr.device_step(
            rp, hp_r, cp, hp_c, st,
            r_threshold=R_THRESHOLD, c_threshold=C_THRESHOLD,
            span=SPAN, ring=ring, fused_editor=fused)
        return st, aux["message_edges"]

    return {"sample": v_sample, "forward": v_forward,
            "integrate": v_integrate, "editor": v_editor, "full": v_full}


def time_variant(fn, st, n_steps, pallas):
    from graingraphnn_tpu.ops import period_conv

    @jax.jit
    def run(state, zs):
        old = period_conv._USE_PALLAS
        period_conv.use_pallas_kernels(pallas)
        try:
            def body(s, z):
                s, leak = fn(s, z)
                # thread the runtime zero times the leak into the state so
                # XLA cannot hoist the stage out of the loop
                s = s._replace(xj=s.xj.at[0, 0].add(z * leak))
                return s, leak

            return jax.lax.scan(body, state, zs)
        finally:
            period_conv.use_pallas_kernels(old)

    zs = jnp.zeros(n_steps, jnp.float32)
    st2, leaks = run(st, zs)
    np.asarray(leaks)
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        st2, leaks = run(st, zs)
        np.asarray(leaks)
        dt = min(dt, time.perf_counter() - t0)
    return dt / n_steps * 1e3


def measure_overhead(st, n_steps):
    """Fixed per-launch cost of a jitted scan on this device (dispatch +
    output shipping on the tunneled TPU: ~25-30 ms regardless of steps,
    round 3's 20-step breakdown misattributed it — ~1.3 ms/step — to the
    first stage). Measured with a trivial body over the same carry and
    subtracted from every cumulative stage time."""
    def v_triv(s, z):
        return s, s.xj[0, 0] + z
    return time_variant(v_triv, st, n_steps, False)


def breakdown(lxd, rp, hp_r, cp, hp_c, n_steps, pallas, fused=False):
    import bench

    st = bench._real_state(lxd)
    ring = tj.RING_MAX
    fns = _variants(rp, hp_r, cp, hp_c, ring, fused=fused)
    oh = measure_overhead(st, n_steps)
    t = {k: time_variant(fn, st, n_steps, pallas) - oh
         for k, fn in fns.items()}
    comp = {
        "ell_rebuild_ms": t["sample"],
        "forward_ms": t["forward"] - t["sample"],
        "integrate_ms": t["integrate"] - t["forward"],
        "editor_ms": t["editor"] - t["integrate"],
        "finalize_ms": t["full"] - t["editor"],
    }
    total = t["full"]
    pct = {k.replace("_ms", "_pct"): round(100 * v / total, 1)
           for k, v in comp.items()}
    return {
        "lxd": lxd, "pallas": pallas, "fused_editor": fused,
        "ms_per_step": round(total, 3),
        "launch_overhead_ms_per_step": round(oh, 3),
        "cumulative_ms": {k: round(v, 3) for k, v in t.items()},
        "components_ms": {k: round(v, 3) for k, v in comp.items()},
        "components_pct": pct,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--out", type=str,
                    default=f"{REPO}/artifacts/STEP_BREAKDOWN.json")
    args = ap.parse_args()

    rp, hp_r, _ = checkpoint.load(f"{REPO}/artifacts/40um/regressor0")
    cp, hp_c, _ = checkpoint.load(f"{REPO}/artifacts/40um/classifier1")

    rows = []
    for lxd in (40, 120):
        # (pallas_fwd, fused_editor): HLO baseline, the shipped fused-editor
        # config (bench headline), and fused editor + bf16 Pallas forward
        for pallas, fused in ((False, False), (False, True), (True, True)):
            r = breakdown(lxd, rp, hp_r, cp, hp_c, args.steps, pallas, fused)
            rows.append(r)
            print(json.dumps(r))
    out = {
        "method": "stage-cumulative scans, adjacent differences; "
                  "c_threshold=0.99 (bench config), min-of-3 timing; "
                  "per-launch overhead (trivial-carry scan) subtracted "
                  "from every cumulative time",
        "backend": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
        "rows": rows,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
