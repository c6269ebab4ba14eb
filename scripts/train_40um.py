"""Train regressor + transfer classifier on the extracted 40um data.

The reference trained on 38,461 samples from ~600 PF seeds; only one seed's
raw data ships in this mount, so this trains on the 36 windows extractable
from it — enough to validate the full pipeline and give the rollout
meaningful weights for the seed10020 case.
"""

import argparse
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

parser = argparse.ArgumentParser()
parser.add_argument("--platform", default="tpu", choices=["tpu", "cpu"])
parser.add_argument("--epochs_r", type=int, default=200)
parser.add_argument("--epochs_c", type=int, default=100)
parser.add_argument("--decay_r", type=int, default=30)
parser.add_argument("--decay_c", type=int, default=30)
parser.add_argument("--batch_c", type=int, default=4)
parser.add_argument("--pos_weight", type=float, default=4.0)
parser.add_argument("--skip_regressor", action="store_true")
parser.add_argument("--resume_regressor", action="store_true",
                    help="init regressor from the saved checkpoint")
parser.add_argument("--lr_r", type=float, default=0.0, help="override regressor lr")
parser.add_argument("--skip_classifier", action="store_true")
parser.add_argument("--data", default="/root/repo/data_cache/graphs/train_seed10020.pkl")
parser.add_argument("--out", default="/root/repo/data_cache/model")
parser.add_argument("--history", action="store_true",
                    help="ablation: temporal LSTM branch (models.py:385-390)")
parser.add_argument("--edge_len", action="store_true",
                    help="ablation: edge-length head (models.py:455-464)")
parser.add_argument("--scanned", action="store_true",
                    help="device-resident scanned loop (one dispatch per "
                         "epoch) — required for usable throughput on the "
                         "tunneled TPU")
args = parser.parse_args()

if args.platform == "cpu":
    jax.config.update("jax_platforms", "cpu")

from graingraphnn_tpu.data.dataset import GraphDataset, common_capacities, split
from graingraphnn_tpu.graph import schema, state
from graingraphnn_tpu.models import grain_nn, hyper
from graingraphnn_tpu.train import checkpoint, trainer

with open(args.data, "rb") as f:
    raw = pickle.load(f)
print(f"{len(raw)} raw samples", flush=True)

sizes = [
    (
        r["feature_dicts"]["grain"].shape[0],
        r["feature_dicts"]["joint"].shape[0],
        int((r["edge_index_dicts"][schema.EDGE_TYPES[2]][0] > -1).sum()),
    )
    for r in raw
]
ng, nj, ne = common_capacities(sizes)
print("caps", ng, nj, ne, flush=True)

samples = []
for r in raw:
    targets = dict(r["target_dicts"])
    if "edge" in r["mask"]:
        targets["edge_mask"] = r["mask"]["edge"]
    # live jj edges only for the padded sample (labels are on live edges)
    ei = dict(r["edge_index_dicts"])
    ew = dict(r["edge_weight_dicts"])
    et = schema.EDGE_TYPES[2]
    live = ei[et][0] > -1
    # edge weights were already compacted by append_history? train samples
    # don't run append_history edge compaction, so align explicitly
    if ew[et].shape[0] == ei[et].shape[1]:
        ew = {**ew, et: ew[et][live]}
    ei = {**ei, et: ei[et][:, live]}
    samples.append(
        state.build_sample(
            r["feature_dicts"], ei, ew,
            {"grain": r["mask"]["grain"], "joint": r["mask"]["joint"]},
            targets,
            grain_cap=ng, joint_cap=nj, jj_edge_cap=ne,
        )
    )

train_list, valid_list = split(samples, train_ratio=0.9)
train_ds, valid_ds = GraphDataset(train_list), GraphDataset(valid_list)
print(f"train {len(train_ds)} valid {len(valid_ds)}", flush=True)

os.makedirs(args.out, exist_ok=True)

# ---- regressor --------------------------------------------------------------
hp_r = hyper.regressor(0, epoch=args.epochs_r, decay_step=args.decay_r)
import dataclasses
if args.lr_r > 0:
    hp_r = dataclasses.replace(hp_r, lr=args.lr_r)
if args.history:
    hp_r = dataclasses.replace(hp_r, history=True)
if args.edge_len:
    hp_r = dataclasses.replace(hp_r, edge_len=True)
if args.skip_regressor:
    params_r, hp_r, _ = checkpoint.load(os.path.join(args.out, "regressor0"))
    print("loaded existing regressor", flush=True)
else:
    if args.resume_regressor:
        params_r, _, _ = checkpoint.load(os.path.join(args.out, "regressor0"))
        print("resuming regressor from checkpoint", flush=True)
    else:
        params_r = grain_nn.init_regressor(jax.random.PRNGKey(35), hp_r)
    t0 = time.time()
    train_fn = trainer.train_scanned if args.scanned else trainer.train
    params_r, hist_r = train_fn(hp_r, params_r, train_ds, valid_ds)
    print("regressor training time %.1fs" % (time.time() - t0), flush=True)
    checkpoint.save(os.path.join(args.out, "regressor0"), params_r, hp_r)

# ---- classifier (transfer) --------------------------------------------------
if args.skip_classifier:
    print("done", flush=True)
    sys.exit(0)
# deviation from the shipped config (batch 32, pos_weight 1): with only ~36
# samples in this mount, batch 32 yields 1 step/epoch and the BCE collapses
# to all-negative; smaller batches + positive weighting recover learning
hp_c = hyper.classifier_transfered(
    1, epoch=args.epochs_c, decay_step=args.decay_c,
    batch_size=args.batch_c, pos_weight=args.pos_weight,
)
params_c = grain_nn.init_classifier(
    jax.random.PRNGKey(36), hp_c, regressor_params=params_r
)
t0 = time.time()
params_c, hist_c = trainer.train(hp_c, params_c, train_ds, valid_ds)
print("classifier training time %.1fs" % (time.time() - t0), flush=True)
checkpoint.save(
    os.path.join(args.out, "classifier1"), params_c, hp_c,
    extra={"threshold": hist_c.get("threshold", 0.6)},
)
print("done", flush=True)
