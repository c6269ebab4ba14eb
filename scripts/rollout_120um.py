"""Rollout on the 120um seed0 case (1043 grains, 2086 junctions) from the
shipped t=0 fixture — BASELINE config #2 scale. The 120um PF truth h5/traj
are absent from this mount (.MISSING_LARGE_BLOBS), so this runs without
truth comparison: it exercises patch rescaling (lxd/40 = 3), the large-graph
forward, and the topology engine at scale.
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
parser.add_argument("--growth_height", type=float, default=-1.0)
parser.add_argument("--verbose", action="store_true")
parser.add_argument("--clamp_gr", type=str, default="",
                    help="'Gmin,Gmax,Rmin,Rmax' training-hull clamp for the "
                         "thermal features (the shipped 120um mitigation; "
                         "artifacts/CALIBRATION_120um.json)")
args = parser.parse_args()

if args.platform == "cpu":
    jax.config.update("jax_platforms", "cpu")

from graingraphnn_tpu.data import extraction, reference_io
from graingraphnn_tpu.rollout.engine import RolloutEngine
from graingraphnn_tpu.train import checkpoint

hg0 = reference_io.load_sample_list(
    "/root/reference/graphs/120_120/seed0_G10.0_R2.0_span6.pkl"
)[0]

# regenerate the (deterministic) initial microstructure for bookkeeping;
# verified to match the fixture exactly (1043 grains / 2086 junctions)
traj = extraction.TrajectoryExtractor(
    lxd=120, seed=0, frames=121, physical_params={"G": 10.0, "R": 2.0}
)
traj.area_traj.append(dict(traj.area_counts))

params_r, hp_r, _ = checkpoint.load(os.path.join(args.model_dir, "regressor0"))
params_c, hp_c, extra = checkpoint.load(os.path.join(args.model_dir, "classifier1"))

engine = RolloutEngine(
    params_r, hp_r, params_c, hp_c,
    c_threshold=extra.get("threshold", 0.6), seed=0, verbose=args.verbose,
)
clamp = None
if args.clamp_gr:
    clamp = tuple(float(v) for v in args.clamp_gr.split(","))
res = engine.run(
    hg0, traj, span=6, compare=False, growth_height=args.growth_height,
    reconstruct=True, clamp_gr=clamp,
)
print(json.dumps({
    "events_pred": res["events_pred"],
    "clamp_gr": args.clamp_gr or None,
    "inference_time_s": round(res["inference_time"], 2),
    "misorientation_first_last": [
        round(res["misorientation"][0], 3), round(res["misorientation"][-1], 3)
    ],
}))
