"""120um event-rate calibration (VERDICT item 8).

The 120um mount ships no PF truth (.MISSING_LARGE_BLOBS), so the rollout
cannot be scored directly — but the EVENT RATE can be sanity-checked against
the 40um truth: elimination events per initial grain per micron of growth
should be comparable across scales (the reference's own numbers imply it:
75/118 grains eliminated at 40um, ~704/1043 at 120um -> 63.6% vs 67.5%).

This script runs both rollouts with the engine's per-step event breakdown
(area-triggered vs editor-forced eliminations vs switches), computes
per-grain per-micron rates, and writes artifacts/CALIBRATION_120um.json.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

parser = argparse.ArgumentParser()
parser.add_argument("--platform", default="tpu", choices=["tpu", "cpu"])
parser.add_argument("--model_dir", default="/root/repo/artifacts/40um")
parser.add_argument("--c_threshold", type=float, default=0.99)
parser.add_argument("--r_threshold", type=float, default=1e-4)
parser.add_argument("--out", default="/root/repo/artifacts/CALIBRATION_120um.json")
parser.add_argument("--skip_40", action="store_true")
parser.add_argument("--force_gr", type=float, nargs=2, default=None,
                    metavar=("G", "R"),
                    help="counterfactual: overwrite the 120um thermal "
                         "features with these (G, R) to separate thermal "
                         "extrapolation error from patch-rescaling error")
args = parser.parse_args()

if args.platform == "cpu":
    jax.config.update("jax_platforms", "cpu")

from graingraphnn_tpu.data import extraction, reference_io
from graingraphnn_tpu.rollout.engine import RolloutEngine
from graingraphnn_tpu.train import checkpoint

params_r, hp_r, _ = checkpoint.load(os.path.join(args.model_dir, "regressor0"))
params_c, hp_c, _ = checkpoint.load(os.path.join(args.model_dir, "classifier1"))


def breakdown(res, n_grains, dh):
    steps = res["event_steps"]
    area = sum(s["area_elim"] for s in steps)
    forced = sum(s["forced_elim"] for s in steps)
    sw = sum(s["switches"] for s in steps)
    return {
        "events_pred_unique": res["events_pred"],
        "area_triggered": area,
        "editor_forced": forced,
        "switches": sw,
        "initial_grains": n_grains,
        "growth_um": round(dh, 2),
        "elim_fraction": round(res["events_pred"] / n_grains, 4),
        "events_per_grain_per_um": round(res["events_pred"] / n_grains / dh, 5),
        "num_grains_live_final": res["num_grains_live"],
    }


report = {"c_threshold": args.c_threshold, "r_threshold": args.r_threshold}
if os.path.exists(args.out):
    with open(args.out) as f:
        report.update(json.load(f))

# ---- 40um seed10020 (truth available) --------------------------------
if not args.skip_40:
    traj = extraction.TrajectoryExtractor(lxd=40, seed=10020, frames=121)
    traj.match_graph = False
    traj.extract("/root/reference/rawdat_PF/40_40", cache_dir="/root/repo/data_cache")
    hg0 = extraction.make_test_sample(traj, span=6)
    eng = RolloutEngine(params_r, hp_r, params_c, hp_c,
                        c_threshold=args.c_threshold,
                        r_threshold=args.r_threshold)
    res40 = eng.run(hg0, traj, span=6, compare=True)
    dh40 = traj.final_height - traj.ini_height
    n40 = len(hg0.feature_dicts["grain"])
    report["case_40um"] = breakdown(res40, n40, dh40)
    report["case_40um"]["events_truth"] = res40["events_truth"]
    report["case_40um"]["truth_rate_per_grain_per_um"] = round(
        res40["events_truth"] / n40 / dh40, 5
    )
    print("40um:", json.dumps(report["case_40um"]), flush=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)

# ---- 120um seed0 (no truth; rate check) ------------------------------
hg0 = reference_io.load_sample_list(
    "/root/reference/graphs/120_120/seed0_G10.0_R2.0_span6.pkl"
)[0]
if args.force_gr is not None:
    G, R = args.force_gr
    # joint thermal features: col 3 = 1 - G/10, col 4 = R/2 (heterograph)
    hg0.feature_dicts["joint"][:, 3] = 1 - G / 10
    hg0.feature_dicts["joint"][:, 4] = R / 2
traj = extraction.TrajectoryExtractor(
    lxd=120, seed=0, frames=121, physical_params={"G": 10.0, "R": 2.0}
)
traj.area_traj.append(dict(traj.area_counts))
eng = RolloutEngine(params_r, hp_r, params_c, hp_c,
                    c_threshold=args.c_threshold,
                    r_threshold=args.r_threshold)
res120 = eng.run(hg0, traj, span=6, compare=False, reconstruct=True)
dh120 = traj.final_height - traj.ini_height
n120 = len(hg0.feature_dicts["grain"])
report["case_120um"] = breakdown(res120, n120, dh120)
report["case_120um"]["reference_truth_events"] = "~644-704 (README.md:69; truth data absent from mount)"
print("120um:", json.dumps(report["case_120um"]), flush=True)

c40 = report.get("case_40um")
if c40:
    report["rate_ratio_120_over_40"] = round(
        report["case_120um"]["events_per_grain_per_um"]
        / c40["events_per_grain_per_um"], 3
    )
with open(args.out, "w") as f:
    json.dump(report, f, indent=1)
print("wrote", args.out)
