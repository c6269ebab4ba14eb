"""Train on the symmetry-augmented 40um dataset with the device-resident
scanned loop (one jit dispatch per epoch)."""

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
parser.add_argument("--epochs_r", type=int, default=300)
parser.add_argument("--epochs_c", type=int, default=300)
parser.add_argument("--decay_r", type=int, default=60)
parser.add_argument("--decay_c", type=int, default=100)
parser.add_argument("--batch", type=int, default=8)
parser.add_argument("--pos_weight", type=float, default=4.0)
parser.add_argument("--data", default="/root/repo/data_cache/graphs/train_seed10020.pkl")
parser.add_argument("--out", default="/root/repo/data_cache/model_aug")
parser.add_argument("--gr_jitter_p", type=float, default=1.0)
parser.add_argument("--gr_jitter", action="store_true",
                    help="resample joint (G, R) features per step over the "
                         "RandGR hull (feature augmentation for thermal "
                         "robustness, VERDICT r3 task 5)")
parser.add_argument("--gr_hull", type=float, nargs=4,
                    default=[0.5, 10.0, 0.2, 2.0],
                    metavar=("GMIN", "GMAX", "RMIN", "RMAX"),
                    help="jitter hull; a narrower directional hull "
                         "(training point -> extrapolation corner) "
                         "preserves in-hull response slope (r5 task 3b)")
parser.add_argument("--skip_regressor", action="store_true")
parser.add_argument("--skip_classifier", action="store_true")
parser.add_argument("--seed", type=int, default=35,
                    help="training seed: init keys, shuffle order, and the "
                         "jitter stream all derive from it (repeat-train "
                         "error bars, VERDICT r4 task 3)")
args = parser.parse_args()

if args.platform == "cpu":
    jax.config.update("jax_platforms", "cpu")

from graingraphnn_tpu.data import augment
from graingraphnn_tpu.data.dataset import GraphDataset, common_capacities, split
from graingraphnn_tpu.graph import schema, state
from graingraphnn_tpu.models import grain_nn, hyper
from graingraphnn_tpu.train import checkpoint, trainer

with open(args.data, "rb") as f:
    raw = pickle.load(f)

# keep the validation split un-augmented and held out BEFORE augmentation
train_raw, valid_raw = split(raw, train_ratio=0.9)
rng = np.random.default_rng(7)
aug_raw = []
for r in train_raw:
    aug_raw.extend(augment.augment_group(r, rng))
print(f"{len(train_raw)} raw -> {len(aug_raw)} augmented train samples", flush=True)

def build(rs, ng, nj, ne):
    out = []
    for r in rs:
        targets = dict(r["target_dicts"])
        if "edge" in r["mask"]:
            targets["edge_mask"] = r["mask"]["edge"]
        out.append(
            state.build_sample(
                r["feature_dicts"], r["edge_index_dicts"], r["edge_weight_dicts"],
                {"grain": r["mask"]["grain"], "joint": r["mask"]["joint"]},
                targets, grain_cap=ng, joint_cap=nj, jj_edge_cap=ne,
            )
        )
    return out

sizes = [
    (
        r["feature_dicts"]["grain"].shape[0],
        r["feature_dicts"]["joint"].shape[0],
        int((r["edge_index_dicts"][schema.EDGE_TYPES[2]][0] > -1).sum()),
    )
    for r in raw
]
ng, nj, ne = common_capacities(sizes)
train_ds = GraphDataset(build(aug_raw, ng, nj, ne))
valid_ds = GraphDataset(build(valid_raw, ng, nj, ne))
os.makedirs(args.out, exist_ok=True)

if not args.skip_regressor:
    hp_r = hyper.regressor(
        0, epoch=args.epochs_r, decay_step=args.decay_r, batch_size=args.batch
    )
    params_r = grain_nn.init_regressor(jax.random.PRNGKey(args.seed), hp_r)
    t0 = time.time()
    params_r, hist = trainer.train_scanned(hp_r, params_r, train_ds, valid_ds,
                                       seed=args.seed,
                                       gr_jitter=args.gr_jitter,
                                       gr_jitter_p=args.gr_jitter_p,
                                       gr_hull=tuple(args.gr_hull))
    print("regressor training time %.1fs" % (time.time() - t0), flush=True)
    checkpoint.save(os.path.join(args.out, "regressor0"), params_r, hp_r)
else:
    params_r, hp_r, _ = checkpoint.load(os.path.join(args.out, "regressor0"))

if not args.skip_classifier:
    hp_c = hyper.classifier_transfered(
        1, epoch=args.epochs_c, decay_step=args.decay_c,
        batch_size=args.batch, pos_weight=args.pos_weight,
    )
    params_c = grain_nn.init_classifier(
        jax.random.PRNGKey(args.seed + 1), hp_c, regressor_params=params_r
    )
    t0 = time.time()
    params_c, hist_c = trainer.train_scanned(hp_c, params_c, train_ds, valid_ds,
                                         seed=args.seed + 1,
                                         gr_jitter=args.gr_jitter,
                                         gr_jitter_p=args.gr_jitter_p,
                                         gr_hull=tuple(args.gr_hull))
    print("classifier training time %.1fs" % (time.time() - t0), flush=True)
    checkpoint.save(
        os.path.join(args.out, "classifier1"), params_c, hp_c,
        extra={"threshold": hist_c.get("threshold", 0.6)},
    )
print("done", flush=True)
