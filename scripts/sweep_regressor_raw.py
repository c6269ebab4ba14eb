"""Sweep on the RAW (non-augmented) windows — the seed-overfit regime that
currently wins the seed10020 rollout."""
import json, os, pickle, sys
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
from graingraphnn_tpu.data import extraction
from graingraphnn_tpu.data.dataset import GraphDataset, common_capacities, split
from graingraphnn_tpu.graph import schema, state
from graingraphnn_tpu.models import grain_nn, hyper
from graingraphnn_tpu.rollout.engine import RolloutEngine
from graingraphnn_tpu.train import checkpoint, trainer

DATA = "/root/repo/data_cache/graphs/train_seed10020.pkl"
OUT = "/root/repo/data_cache/sweep_raw"
with open(DATA, "rb") as f:
    raw = pickle.load(f)
sizes = [(r["feature_dicts"]["grain"].shape[0], r["feature_dicts"]["joint"].shape[0],
          int((r["edge_index_dicts"][schema.EDGE_TYPES[2]][0] > -1).sum())) for r in raw]
ng, nj, ne = common_capacities(sizes)
def build(rs):
    out = []
    for r in rs:
        t = dict(r["target_dicts"]);
        if "edge" in r["mask"]: t["edge_mask"] = r["mask"]["edge"]
        out.append(state.build_sample(r["feature_dicts"], r["edge_index_dicts"], r["edge_weight_dicts"],
            {"grain": r["mask"]["grain"], "joint": r["mask"]["joint"]}, t,
            grain_cap=ng, joint_cap=nj, jj_edge_cap=ne))
    return out
train_raw, valid_raw = split(raw, train_ratio=0.95)
train_ds, valid_ds = GraphDataset(build(train_raw)), GraphDataset(build(valid_raw))
os.makedirs(OUT, exist_ok=True)
params_c, hp_c, _ = checkpoint.load("/root/repo/artifacts/40um/classifier1")
CONFIGS = [
    {"lr": 5e-3, "decay_step": 60, "batch_size": 4, "epoch": 400},
    {"lr": 2e-3, "decay_step": 120, "batch_size": 4, "epoch": 400},
    {"lr": 5e-3, "decay_step": 120, "batch_size": 2, "epoch": 400},
]
results = []
for i, cfg in enumerate(CONFIGS):
    hp = hyper.regressor(0, **cfg)
    params = grain_nn.init_regressor(jax.random.PRNGKey(35), hp)
    params, hist = trainer.train_scanned(hp, params, train_ds, valid_ds, log=lambda s: None, eval_every=100)
    t2 = extraction.TrajectoryExtractor(lxd=40, seed=10020, frames=121)
    t2.match_graph = False
    t2.extract("/root/reference/rawdat_PF/40_40", cache_dir="/root/repo/data_cache")
    hg0 = extraction.make_test_sample(t2, span=6)
    eng = RolloutEngine(params, hp, params_c, hp_c, c_threshold=0.99, seed=10020)
    res = eng.run(hg0, t2, span=6, compare=True)
    row = {"config": cfg, "valid_loss": round(hist["valid_loss"][-1], 6),
           "mean_layer_error": round(res["mean_layer_error"], 4),
           "final_layer_error": round(res["final_layer_error"], 4),
           "events": f"{res['events_tp']}/{res['events_truth']}"}
    results.append(row); print(json.dumps(row), flush=True)
    checkpoint.save(os.path.join(OUT, f"regressor_cfg{i}"), params, hp)
best = min(range(len(results)), key=lambda i: results[i]["mean_layer_error"])
print("BEST:", best, json.dumps(results[best]), flush=True)
