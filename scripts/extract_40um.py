"""Generate training + test data for the 40um seed10020 case from the
shipped PF h5 (the only raw case present in this mount)."""

import os
import pickle
import sys
import time

import argparse

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graingraphnn_tpu.data import extraction

ap = argparse.ArgumentParser()
ap.add_argument("--stride", type=int, default=0,
                help="window stride (default span//2, reference parity; "
                     "1 = densest overlapping windows)")
ap.add_argument("--out_pkl",
                default="/root/repo/data_cache/graphs/train_seed10020.pkl")
args = ap.parse_args()

t0 = time.time()
traj = extraction.TrajectoryExtractor(lxd=40, seed=10020, frames=121, verbose=False)
traj.extract("/root/reference/rawdat_PF/40_40", cache_dir="/root/repo/data_cache")
span = extraction.calibrate_span(traj)
print("span", span, "extract time %.1fs" % (time.time() - t0), flush=True)
print("quarantined frames:", traj.save_frame.count(False), flush=True)
print("grain events:", len(set.union(*traj.grain_events)),
      "edge events:", len(set.union(*traj.edge_events)), flush=True)

samples = extraction.make_training_samples(
    traj, span=span, stride=args.stride or None)
print("n training samples", len(samples), flush=True)

os.makedirs("/root/repo/data_cache/graphs", exist_ok=True)
payload = [
    {
        "feature_dicts": s.feature_dicts,
        "target_dicts": s.target_dicts,
        "edge_index_dicts": s.edge_index_dicts,
        "edge_weight_dicts": s.edge_weight_dicts,
        "mask": s.mask,
        "physical_params": s.physical_params,
        "span": s.span,
    }
    for s in samples
]
with open(args.out_pkl, "wb") as f:
    pickle.dump(payload, f)
print("saved", flush=True)
