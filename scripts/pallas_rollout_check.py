"""Device-rollout A/B: fp32 XLA conv vs fused bf16 Pallas conv.

Runs the fully device-resident rollout (rollout.device_rollout) on the real
seed10020 40 um case twice — identical initial state, thresholds, and step
count; only the conv implementation differs — and reports per-step grain
events, switching counts, final live-node counts, state drift, and
throughput. Decides whether the Pallas path preserves rollout QoIs well
enough to be the bench default (bf16 forward noise must stay within the
already-documented fp32 CPU-vs-TPU platform spread).

Writes artifacts/pallas_rollout_ab.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from graingraphnn_tpu.data import extraction
from graingraphnn_tpu.rollout import device_rollout as dr
from graingraphnn_tpu.train import checkpoint

N_STEPS = 20


def _timed_call(run, st0):
    import time as _t

    t0 = _t.perf_counter()
    st, aux = run(st0)
    np.asarray(aux["message_edges"])
    return _t.perf_counter() - t0


def run_variant(params_r, hp_r, params_c, hp_c, st0, c_thr, pallas):
    import jax

    run = dr.make_rollout_scan(
        params_r, hp_r, params_c, hp_c,
        n_steps=N_STEPS, c_threshold=c_thr, pallas=pallas,
    )
    # warmup must include a device->host pull of aux: the tunneled TPU pays
    # a large ONE-TIME cost on the first D2H of a program's outputs (measured
    # 16-316 s), which previously landed inside whichever variant ran first
    st, aux = run(st0)
    jax.block_until_ready(st)
    edges = float(np.asarray(aux["message_edges"]).sum())
    dt = min(
        _timed_call(run, st0) for _ in range(3)
    )
    events = [
        sorted(int(g) for g in row if g >= 0)
        for row in np.asarray(aux["grain_events"])
    ]
    extra = [
        sorted(int(g) for g in row if g >= 0)
        for row in np.asarray(aux["extra_events"])
    ]
    sw = [int((row >= 0).sum()) for row in np.asarray(aux["switching"])[..., 0]]
    return {
        "state": st,
        "events": events,
        "extra": extra,
        "switch_counts": sw,
        "edges_per_s": edges / dt,
        "live_grains": int(np.asarray(st.mask_g).sum()),
        "live_joints": int(np.asarray(st.mask_j).sum()),
    }


def _case_states():
    """>= 5 rollout cases spanning the inference conditions (VERDICT
    round-2 item 7: bound the bf16 QoI drift across seeds/cases before
    headlining the Pallas kernel)."""
    from graingraphnn_tpu.data import heterograph
    from graingraphnn_tpu.rollout import device_driver as dd

    cases = []
    traj = extraction.TrajectoryExtractor(lxd=40, seed=10020, frames=121)
    traj.match_graph = False
    traj.extract("/root/reference/rawdat_PF/40_40", cache_dir="/tmp/ggnn_cache")
    hg0 = extraction.make_test_sample(traj, span=6)
    st, _, _ = dd.init_scaled_state(hg0, traj)
    cases.append(("seed10020-real-40um", st))

    for seed in (5, 6, 7):
        t = extraction.TrajectoryExtractor(
            lxd=40, seed=seed, frames=121, bc="periodic",
            physical_params={"G": 1.904, "R": 0.558},
        )
        t.area_counts = dict(zip(*np.unique(t.alpha_field, return_counts=True)))
        t.area_traj.append(dict(t.area_counts))
        t.states.append(heterograph.tensorize(t, 0))
        h = extraction.make_test_sample(t, span=6)
        s, _, _ = dd.init_scaled_state(h, t)
        cases.append((f"generate-inhull-40um-s{seed}", s))

    t = extraction.TrajectoryExtractor(
        lxd=120, seed=0, frames=121, bc="periodic",
        physical_params={"G": 10.0, "R": 2.0},
    )
    t.area_counts = dict(zip(*np.unique(t.alpha_field, return_counts=True)))
    t.area_traj.append(dict(t.area_counts))
    t.states.append(heterograph.tensorize(t, 0))
    h = extraction.make_test_sample(t, span=6)
    s, _, _ = dd.init_scaled_state(h, t)
    cases.append(("seed0-120um-G10R2", s))
    return cases


def main():
    import jax

    params_r, hp_r, _ = checkpoint.load("artifacts/40um/regressor0")
    params_c, hp_c, extra = checkpoint.load("artifacts/40um/classifier1")
    c_thr = float(extra.get("threshold", 0.6))

    rows = []
    for name, st0 in _case_states():
        a = run_variant(params_r, hp_r, params_c, hp_c, st0, c_thr, pallas=False)
        b = run_variant(params_r, hp_r, params_c, hp_c, st0, c_thr, pallas=True)
        ev_a = set(g for row in a["events"] + a["extra"] for g in row)
        ev_b = set(g for row in b["events"] + b["extra"] for g in row)
        xg_a, xg_b = np.asarray(a["state"].xg), np.asarray(b["state"].xg)
        mg = np.asarray(a["state"].mask_g) * np.asarray(b["state"].mask_g)
        drift = float(np.abs(xg_a - xg_b)[mg > 0].max()) if mg.any() else 0.0
        rows.append({
            "case": name,
            "events_fp32": len(ev_a), "events_pallas": len(ev_b),
            "event_jaccard": len(ev_a & ev_b) / max(len(ev_a | ev_b), 1),
            "events_only_fp32": sorted(ev_a - ev_b),
            "events_only_pallas": sorted(ev_b - ev_a),
            "live_grains_fp32": a["live_grains"],
            "live_grains_pallas": b["live_grains"],
            "final_xg_max_drift_live": drift,
            "fp32_edges_per_s": a["edges_per_s"],
            "pallas_edges_per_s": b["edges_per_s"],
            "speedup": b["edges_per_s"] / a["edges_per_s"],
        })
        print(f"{name}: jaccard {rows[-1]['event_jaccard']:.3f}, "
              f"speedup {rows[-1]['speedup']:.3f}", flush=True)

    jac = [r["event_jaccard"] for r in rows]
    spd = [r["speedup"] for r in rows]
    out = {
        "device": str(jax.devices()[0].device_kind),
        "n_steps": N_STEPS,
        "c_threshold": c_thr,
        "cases": rows,
        "event_jaccard_min": min(jac),
        "event_jaccard_mean": float(np.mean(jac)),
        "speedup_mean": float(np.mean(spd)),
        "verdict": (
            "fp32 stays the bench headline: bf16 forward noise flips "
            "threshold-adjacent events (Jaccard < 1) while the end-to-end "
            "gain is marginal (editor-bound step)"
            if min(jac) < 0.98 or float(np.mean(spd)) < 1.1 else
            "pallas bf16 is QoI-safe on all measured cases and headlines "
            "the bench"
        ),
    }
    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/pallas_rollout_ab.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "cases"}, indent=1))


if __name__ == "__main__":
    main()
