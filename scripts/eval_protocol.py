"""Uncontaminated accuracy protocol for the 40um seed10020 case.

The round-1 headline (0.26 final layer error, 74/75 events) used a classifier
threshold (0.99) and a sweep config both selected by rollout QoI *on the
evaluation case itself*. The reference instead picks its threshold from the
validation PR curve (train.py:429-436) and never tunes on the test rollout.

Clean protocol here:
  * classifier threshold = the validation-PR argmax(P+R) threshold stored in
    the checkpoint at training time (checkpoint extra "threshold_pr_optimal"),
    computed on the held-out 10% validation split — never on the rollout;
  * rollout QoIs reported as a spread over >=3 topology-editor RNG seeds
    (the rollout is chaotic through discrete events, so a single run
    over/under-states accuracy);
  * the best-case (rollout-tuned) numbers are reported alongside, clearly
    labelled.

Writes artifacts/40um/PROTOCOL.json.
"""

import argparse
import copy
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

parser = argparse.ArgumentParser()
parser.add_argument("--platform", default="tpu", choices=["tpu", "cpu"])
parser.add_argument("--model_dir", default="/root/repo/artifacts/40um")
parser.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
parser.add_argument("--out", default="/root/repo/artifacts/40um/PROTOCOL.json")
parser.add_argument("--tuned_threshold", type=float, default=0.99)
parser.add_argument("--mode", default="both", choices=["clean", "tuned", "both"],
                    help="which protocol to run (split for wall-clock limits)")
args = parser.parse_args()

if args.platform == "cpu":
    jax.config.update("jax_platforms", "cpu")

from graingraphnn_tpu.data import extraction
from graingraphnn_tpu.rollout.engine import RolloutEngine
from graingraphnn_tpu.train import checkpoint

traj = extraction.TrajectoryExtractor(lxd=40, seed=10020, frames=121)
traj.match_graph = False
traj.extract("/root/reference/rawdat_PF/40_40", cache_dir="/root/repo/data_cache")

params_r, hp_r, _ = checkpoint.load(os.path.join(args.model_dir, "regressor0"))
params_c, hp_c, extra = checkpoint.load(os.path.join(args.model_dir, "classifier1"))
thr_clean = float(extra.get("threshold_pr_optimal", extra.get("threshold", 0.6)))


_state0 = copy.deepcopy(traj.states[0])


def run_case(c_threshold, editor_seed):
    # make_test_sample mutates states[0] in place (append_history grows
    # feature columns); restore the pristine extraction state per run
    traj.states[0] = copy.deepcopy(_state0)
    hg0 = extraction.make_test_sample(traj, span=6)
    engine = RolloutEngine(
        params_r, hp_r, params_c, hp_c,
        c_threshold=c_threshold, seed=editor_seed,
    )
    res = engine.run(hg0, traj, span=6, compare=True)
    return {
        "editor_seed": editor_seed,
        "c_threshold": c_threshold,
        "final_layer_error": round(res["final_layer_error"], 4),
        "mean_layer_error": round(res["mean_layer_error"], 4),
        "events_tp": res["events_tp"],
        "events_pred": res["events_pred"],
        "events_truth": res["events_truth"],
        "KS": round(res.get("KS", float("nan")), 4),
    }


def spread(runs, key):
    v = [r[key] for r in runs]
    return {"mean": round(float(np.mean(v)), 4),
            "min": round(float(np.min(v)), 4),
            "max": round(float(np.max(v)), 4)}


report = {}
if os.path.exists(args.out):
    with open(args.out) as f:
        report = json.load(f)
report["case"] = "40um seed10020, span 6, periodic BC"
report["platform"] = jax.devices()[0].platform

if args.mode in ("clean", "both"):
    clean_runs = [run_case(thr_clean, s) for s in args.seeds]
    for r in clean_runs:
        print("clean", r, flush=True)
    report["protocol_clean"] = {
        "threshold_source": "validation PR argmax(P+R) at training time "
                            "(train.py:429-436 counterpart); never tuned on "
                            "the evaluated rollout",
        "c_threshold": thr_clean,
        "runs": clean_runs,
        "final_layer_error": spread(clean_runs, "final_layer_error"),
        "mean_layer_error": spread(clean_runs, "mean_layer_error"),
        "events_tp": spread(clean_runs, "events_tp"),
        "events_pred": spread(clean_runs, "events_pred"),
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)

if args.mode in ("tuned", "both"):
    tuned_runs = [run_case(args.tuned_threshold, s) for s in args.seeds]
    for r in tuned_runs:
        print("tuned", r, flush=True)
    report["protocol_rollout_tuned_BEST_CASE"] = {
        "threshold_source": "selected by rollout QoI on this same case "
                            "(contaminated; reported for comparison only)",
        "c_threshold": args.tuned_threshold,
        "runs": tuned_runs,
        "final_layer_error": spread(tuned_runs, "final_layer_error"),
        "mean_layer_error": spread(tuned_runs, "mean_layer_error"),
        "events_tp": spread(tuned_runs, "events_tp"),
        "events_pred": spread(tuned_runs, "events_pred"),
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
print("wrote", args.out)
