"""Deep-ensemble regressor: N members trained with different init seeds
(VERDICT round-1 item 5: "small ensembles").

Same recipe as the winning raw-window sweep config (lr 2e-3, decay 120,
batch 4, 400 epochs, train_ratio 0.95); only the init PRNG key varies.
At inference RolloutEngine vmaps over the stacked member params and
averages predictions (engine.py ensemble path). Evaluated on the
seed10020 rollout at both the tuned (0.99) and clean validation-PR
thresholds; results go to artifacts/40um/ENSEMBLE.json.
"""
import argparse
import copy
import json
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

parser = argparse.ArgumentParser()
parser.add_argument("--seeds", type=int, nargs="+", default=[35, 101, 202, 303])
parser.add_argument("--skip_train", action="store_true",
                    help="reuse saved members, just evaluate")
parser.add_argument("--out", default=os.path.join(REPO, "artifacts/40um/ensemble"))
parser.add_argument("--data",
                    default=os.path.join(REPO, "data_cache/graphs/train_seed10020.pkl"))
parser.add_argument("--rawdat", default="/root/reference/rawdat_PF/40_40")
parser.add_argument("--model_dir", default=os.path.join(REPO, "artifacts/40um"))
args = parser.parse_args()

from graingraphnn_tpu.data import extraction
from graingraphnn_tpu.data.dataset import GraphDataset, common_capacities, split
from graingraphnn_tpu.graph import schema, state
from graingraphnn_tpu.models import grain_nn, hyper
from graingraphnn_tpu.rollout.engine import RolloutEngine
from graingraphnn_tpu.train import checkpoint, trainer

with open(args.data, "rb") as f:
    raw = pickle.load(f)
sizes = [(r["feature_dicts"]["grain"].shape[0], r["feature_dicts"]["joint"].shape[0],
          int((r["edge_index_dicts"][schema.EDGE_TYPES[2]][0] > -1).sum())) for r in raw]
ng, nj, ne = common_capacities(sizes)


def build(rs):
    out = []
    for r in rs:
        t = dict(r["target_dicts"])
        if "edge" in r["mask"]:
            t["edge_mask"] = r["mask"]["edge"]
        out.append(state.build_sample(
            r["feature_dicts"], r["edge_index_dicts"], r["edge_weight_dicts"],
            {"grain": r["mask"]["grain"], "joint": r["mask"]["joint"]}, t,
            grain_cap=ng, joint_cap=nj, jj_edge_cap=ne))
    return out


train_raw, valid_raw = split(raw, train_ratio=0.95)
train_ds, valid_ds = GraphDataset(build(train_raw)), GraphDataset(build(valid_raw))
os.makedirs(args.out, exist_ok=True)

CFG = {"lr": 2e-3, "decay_step": 120, "batch_size": 4, "epoch": 400}
hp = hyper.regressor(0, **CFG)

members = []
for s in args.seeds:
    path = os.path.join(args.out, f"regressor_s{s}")
    if args.skip_train and os.path.exists(path + ".ckpt"):
        p, _, _ = checkpoint.load(path)
        members.append(p)
        print(f"loaded member seed {s}", flush=True)
        continue
    t0 = time.time()
    p = grain_nn.init_regressor(jax.random.PRNGKey(s), hp)
    p, hist = trainer.train_scanned(hp, p, train_ds, valid_ds,
                                    log=lambda m: None, eval_every=100)
    checkpoint.save(path, p, hp)
    members.append(p)
    print(f"member seed {s}: valid_loss {hist['valid_loss'][-1]:.6f} "
          f"({time.time()-t0:.0f}s)", flush=True)

params_c, hp_c, extra_c = checkpoint.load(os.path.join(args.model_dir, "classifier1"))
thr_clean = float(extra_c.get("threshold_pr_optimal", extra_c.get("threshold", 0.6)))

traj = extraction.TrajectoryExtractor(lxd=40, seed=10020, frames=121)
traj.match_graph = False
traj.extract(args.rawdat, cache_dir=os.path.join(REPO, "data_cache"))
_state0 = copy.deepcopy(traj.states[0])


def rollout(reg, thr):
    traj.states[0] = copy.deepcopy(_state0)
    hg0 = extraction.make_test_sample(traj, span=6)
    eng = RolloutEngine(reg, hp, params_c, hp_c, c_threshold=thr, seed=10020)
    res = eng.run(hg0, traj, span=6, compare=True)
    return {"final_layer_error": round(res["final_layer_error"], 4),
            "mean_layer_error": round(res["mean_layer_error"], 4),
            "events": f"{res['events_tp']}/{res['events_truth']} "
                      f"(pred {res['events_pred']})",
            "KS": round(res.get("KS", float("nan")), 4)}


report = {"members": args.seeds, "config": CFG,
          "ensemble_tuned_0.99": rollout(members, 0.99),
          "ensemble_clean_%.2f" % thr_clean: rollout(members, thr_clean)}
print(json.dumps(report, indent=1), flush=True)
# member evals are always included so reruns never silently drop keys
for s, p in zip(args.seeds, members):
    report[f"member_s{s}_tuned_0.99"] = rollout(p, 0.99)
    print(f"member_s{s}:", json.dumps(report[f"member_s{s}_tuned_0.99"]),
          flush=True)
print(json.dumps(report, indent=1), flush=True)
with open(os.path.join(args.model_dir, "ENSEMBLE.json"), "w") as f:
    json.dump(report, f, indent=1)
