"""Stage breakdown of the HYBRID batched rollout (VERDICT r4 task 8).

The 8-lane hybrid (packed forward + per-lane vmapped fused editor) runs at
~27.9 ms/step; the round-4 verdict attributed the residue to "8 x ~1.45 ms
per-lane editor instances + vmapped finalize scatters" without a direct
measurement. This script measures the hybrid step's stage-cumulative
times with step_breakdown.py's methodology (trivial-carry overhead scan
subtracted, runtime-zero leak threading so XLA cannot hoist stages):

    sample+pack   vmapped make_sample + row packing
    forward       ONE packed forward through the fused Pallas conv (f32)
    integrate     vmapped integration + elimination candidates
    editor        vmapped fused Pallas editor (B grid instances)
    finalize      vmapped compaction + centers (the full vmapped post)

Writes the rows into artifacts/BATCHED_ROLLOUT.json under
"hybrid_breakdown" — the measured basis for either packing the finalize
or recording the negative result.

Usage: python scripts/hybrid_breakdown.py [--steps 20] [--lanes 8]
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

from graingraphnn_tpu.models import grain_nn                # noqa: E402
from graingraphnn_tpu.rollout import device_rollout as dr   # noqa: E402
from graingraphnn_tpu.rollout import topology_jit as tj     # noqa: E402
from graingraphnn_tpu.train import checkpoint               # noqa: E402

C_THRESHOLD = 0.99
R_THRESHOLD = 1e-4
SPAN = 6
RING = tj.RING_MAX


def _variants(rp, hp_r, cp, hp_c):
    def sample_pack(st):
        samples, ovf = jax.vmap(lambda s: dr.make_sample(s, RING))(st)
        packed = dr._pack_sample_rows(samples)
        return packed, ovf, samples

    def fwd(st):
        packed, ovf, _samples = sample_pack(st)
        y_r = grain_nn.apply_regressor(rp, hp_r, packed)
        y_c = grain_nn.apply_classifier(cp, hp_c, packed)
        B = st.xg.shape[0]
        NG, NJ = st.xg.shape[1], st.xj.shape[1]
        y_rb = {
            "joint": y_r["joint"].reshape(B, NJ, -1),
            "grain": y_r["grain"].reshape(B, NG, -1),
            "grain_area": y_r["grain_area"].reshape(B, NG),
        }
        y_cb = {"edge_event": y_c["edge_event"].reshape(B, -1)}
        return y_rb, y_cb, ovf

    def v_sample(st, _z):
        packed, ovf, _s = sample_pack(st)
        return st, packed.pull_len.sum() + packed.push_mask.sum()

    def v_forward(st, _z):
        y_rb, y_cb, ovf = fwd(st)
        return st, (y_rb["joint"].sum() + y_rb["grain_area"].sum()
                    + y_cb["edge_event"].sum())

    def v_integrate(st, _z):
        y_rb, y_cb, ovf = fwd(st)

        def per_lane(s, yj, yg, ya):
            xg, xj = dr.integrate_stage(s, yj, yg, SPAN)
            ge, _n = dr.elim_candidates(s, ya, R_THRESHOLD)
            return xg, xj, ge

        xg, xj, ge = jax.vmap(per_lane)(
            st, y_rb["joint"], y_rb["grain"], y_rb["grain_area"])
        st = st._replace(xg=xg, xj=xj)
        return st, y_cb["edge_event"].sum() + ge.sum()

    def v_editor(st, _z):
        y_rb, y_cb, ovf = fwd(st)

        def per_lane(s, yj, yg, ya, ee):
            xg, xj = dr.integrate_stage(s, yj, yg, SPAN)
            ge, _n = dr.elim_candidates(s, ya, R_THRESHOLD)
            tstate, switching, extra = dr.edit_stage(
                s, xg, xj, yj, yg, ee, ge, C_THRESHOLD, fused=True)
            s = s._replace(
                xg=xg, xj=tstate.xj, E_pp=tstate.E_pp, E_pq=tstate.E_pq,
                mask_g=tstate.mask_g, mask_j=tstate.mask_j,
                n_pp=tstate.append_ptr)
            return s, switching.sum().astype(jnp.float32)

        st, leak = jax.vmap(per_lane)(
            st, y_rb["joint"], y_rb["grain"], y_rb["grain_area"],
            y_cb["edge_event"])
        return st, leak.sum()

    def v_full(st, _z):
        y_rb, y_cb, ovf = fwd(st)
        B = st.xg.shape[0]
        edges = jnp.zeros(B)

        def post(s, yr, yc, o, e):
            return dr.post_forward_step(
                s, yr, yc, o, e,
                r_threshold=R_THRESHOLD, c_threshold=C_THRESHOLD,
                span=SPAN, ring=RING, fused_editor=True)

        st, aux = jax.vmap(post)(st, y_rb, y_cb, ovf, edges)
        return st, aux["switching"].sum().astype(jnp.float32)

    return {"sample_pack": v_sample, "forward": v_forward,
            "integrate": v_integrate, "editor": v_editor, "full": v_full}


def time_variant(fn, st, n_steps, pallas="fp32"):
    from graingraphnn_tpu.ops import period_conv

    enabled, pdtype = dr._pallas_mode(pallas)

    @jax.jit
    def run(state, zs):
        old = period_conv._USE_PALLAS
        old_dt = period_conv._PALLAS_DTYPE
        period_conv.use_pallas_kernels(enabled, pdtype)
        try:
            def body(s, z):
                s, leak = fn(s, z)
                s = s._replace(xj=s.xj.at[0, 0, 0].add(z * leak))
                return s, leak

            return jax.lax.scan(body, state, zs)
        finally:
            period_conv.use_pallas_kernels(old, old_dt)

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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--lanes", type=int, default=8)
    ap.add_argument("--lxd", type=int, default=120)
    args = ap.parse_args()

    import bench

    rp, hp_r, _ = checkpoint.load(f"{REPO}/artifacts/40um/regressor0")
    cp, hp_c, _ = checkpoint.load(f"{REPO}/artifacts/40um/classifier1")
    states = [bench._real_state(args.lxd, seed=5 + i)
              for i in range(args.lanes)]
    st = dr.stack_states(states)

    fns = _variants(rp, hp_r, cp, hp_c)

    def v_triv(s, z):
        return s, s.xj[0, 0, 0] + z

    oh = time_variant(v_triv, st, args.steps, pallas=False)
    t = {k: time_variant(fn, st, args.steps) - oh for k, fn in fns.items()}
    comp = {
        "sample_pack_ms": t["sample_pack"],
        "forward_ms": t["forward"] - t["sample_pack"],
        "integrate_ms": t["integrate"] - t["forward"],
        "editor_ms": t["editor"] - t["integrate"],
        "finalize_ms": t["full"] - t["editor"],
    }
    total = t["full"]
    row = {
        "config": f"{args.lanes}x{args.lxd}um hybrid (packed fwd, Pallas "
                  f"f32 conv, vmapped fused editor)",
        "ms_per_step": round(total, 3),
        "ms_per_lane_step": round(total / args.lanes, 3),
        "launch_overhead_ms_per_step": round(oh, 3),
        "cumulative_ms": {k: round(v, 3) for k, v in t.items()},
        "components_ms": {k: round(v, 3) for k, v in comp.items()},
        "components_pct": {
            k.replace("_ms", "_pct"): round(100 * v / total, 1)
            for k, v in comp.items()},
    }
    print(json.dumps(row, indent=1))

    path = f"{REPO}/artifacts/BATCHED_ROLLOUT.json"
    with open(path) as f:
        art = json.load(f)
    art["hybrid_breakdown"] = row
    with open(path, "w") as f:
        json.dump(art, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
