"""Rollout QoI evaluation on the 40um seed10020 case (BASELINE config #1).

Reference targets (README.md:64-68): last-layer misclassification 0.11,
grain-event accuracy 72/75 — achieved there with models trained on 38,461
samples from ~600 PF seeds. This mount ships raw PF data for ONE seed, so
the models here are trained on the 36 windows of that seed alone; QoIs are
reported for pipeline validation, not weight parity.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

parser = argparse.ArgumentParser()
parser.add_argument("--platform", default="cpu", choices=["tpu", "cpu"])
parser.add_argument("--model_dir", default="/root/repo/artifacts/40um")
parser.add_argument("--cls_dir", default="", help="separate classifier dir")
parser.add_argument("--seed", type=int, default=10020)
parser.add_argument("--growth_height", type=float, default=-1.0)
parser.add_argument("--c_threshold", type=float, default=0.99)
parser.add_argument("--verbose", action="store_true")
parser.add_argument("--jit_editor", action="store_true")
args = parser.parse_args()

if args.platform == "cpu":
    jax.config.update("jax_platforms", "cpu")

from graingraphnn_tpu.data import extraction
from graingraphnn_tpu.rollout.engine import RolloutEngine
from graingraphnn_tpu.train import checkpoint

traj = extraction.TrajectoryExtractor(lxd=40, seed=args.seed, frames=121)
traj.match_graph = False
traj.extract("/root/reference/rawdat_PF/40_40", cache_dir="/root/repo/data_cache")
hg0 = extraction.make_test_sample(traj, span=6)

params_r, hp_r, _ = checkpoint.load(os.path.join(args.model_dir, "regressor0"))
params_c, hp_c, extra = checkpoint.load(
    os.path.join(args.cls_dir or args.model_dir, "classifier1")
)
c_thr = args.c_threshold

engine = RolloutEngine(
    params_r, hp_r, params_c, hp_c,
    c_threshold=c_thr, seed=args.seed, verbose=args.verbose,
    jit_editor=args.jit_editor,
)
res = engine.run(hg0, traj, span=6, compare=True, growth_height=args.growth_height)

print(json.dumps({
    "final_layer_error": res["final_layer_error"],
    "mean_layer_error": res["mean_layer_error"],
    "events": f"{res['events_tp']}/{res['events_truth']} (pred {res['events_pred']})",
    "KS": res.get("KS"),
    "size_err": res.get("size_err"),
    "inference_time_s": round(res["inference_time"], 2),
}, indent=1))
print("layer errors:", [(h, round(e, 3)) for h, e in res["layer_err_list"]])
