"""Generate-mode inference (BASELINE config #3): no PF truth — synthesize a
seeded initial microstructure and roll it out under given (G, R), exercising
the classifier-driven topology events (and optionally nucleation / noflux)."""

import argparse
import json
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

parser = argparse.ArgumentParser()
parser.add_argument("--platform", default="cpu", choices=["tpu", "cpu"])
parser.add_argument("--model_dir", default="/root/repo/artifacts/40um")
parser.add_argument("--seed", type=int, default=3)
parser.add_argument("--G", type=float, default=4.0)
parser.add_argument("--R", type=float, default=1.0)
parser.add_argument("--lxd", type=float, default=40)
parser.add_argument("--boundary", default="periodic", choices=["periodic", "noflux"])
parser.add_argument("--growth_height", type=float, default=-1.0)
parser.add_argument("--nucleation_density", type=float, default=0.0)
parser.add_argument("--jit_editor", action="store_true")
parser.add_argument("--meltpool", default="line", choices=["line", "cylinder"],
                    help="cylinder = moving melt pool with a sliding active "
                         "window (user_generate.py meltpool config)")
parser.add_argument("--r0", type=float, default=0.8)
parser.add_argument("--z0", type=float, default=0.4)
parser.add_argument("--melt_pool_angle", type=float, default=np.pi / 4)
parser.add_argument("--verbose", action="store_true")
args = parser.parse_args()

if args.platform == "cpu":
    jax.config.update("jax_platforms", "cpu")

from graingraphnn_tpu.data import extraction, heterograph
from graingraphnn_tpu.data.thermal import default_generate_config
from graingraphnn_tpu.rollout.engine import RolloutEngine
from graingraphnn_tpu.train import checkpoint

user_cfg = None
if args.boundary == "noflux":
    user_cfg = default_generate_config()
    user_cfg["initial_parameters"]["seed"] = args.seed
    user_cfg["physical_parameters"] = {"G": args.G, "R": args.R}

traj = extraction.TrajectoryExtractor(
    lxd=args.lxd, seed=args.seed, frames=121,
    physical_params={"G": args.G, "R": args.R},
    bc=args.boundary if user_cfg is None else "noflux",
    user_defined_config=user_cfg,
)
ids, counts = np.unique(traj.alpha_field, return_counts=True)
traj.area_counts = dict(zip(ids, counts))
traj.area_traj.append(dict(traj.area_counts))
traj.states.append(heterograph.tensorize(traj, 0))
hg0 = extraction.make_test_sample(traj, span=6)

params_r, hp_r, _ = checkpoint.load(os.path.join(args.model_dir, "regressor0"))
params_c, hp_c, extra = checkpoint.load(os.path.join(args.model_dir, "classifier1"))
engine = RolloutEngine(
    params_r, hp_r, params_c, hp_c,
    c_threshold=extra.get("threshold", 0.6), seed=args.seed,
    verbose=args.verbose, jit_editor=args.jit_editor,
)
meltpool = None
if args.meltpool == "cylinder":
    meltpool = {"r0": args.r0, "z0": args.z0,
                "melt_pool_angle": args.melt_pool_angle}
res = engine.run(
    hg0, traj, span=6, compare=False, growth_height=args.growth_height,
    nucleation_density=args.nucleation_density, meltpool=meltpool,
)
print(json.dumps({
    "boundary": traj.BC,
    "initial_grains": traj.num_regions,
    "events_pred": res["events_pred"],
    "inference_time_s": round(res["inference_time"], 2),
    "misorientation_first_last": [
        round(res["misorientation"][0], 2), round(res["misorientation"][-1], 2)
    ],
}))
