"""Graph-partition scaling harness: edges/s vs device count D.

Measures the two single-graph partitioning strategies (parallel.halo stripe
ppermute vs parallel.partition all-gather) against the single-device
forward, on a real generate-mode Voronoi microstructure (~4k grains at
lxd=240), plus the analytic per-conv communication volume of each strategy.

On this environment only a virtual CPU mesh is available
(XLA_FLAGS=--xla_force_host_platform_device_count), so the absolute times
share one host's cores and understate real-ICI scaling; the harness itself
(layout build, shard_map programs, efficiency accounting) is what transfers
to a real multi-chip pod — run this same script there unchanged. The
BASELINE >=80% scaling-efficiency target can only be scored on real chips.

Usage:  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/scaling_bench.py [--lxd 240] [--train]

Writes artifacts/scaling.json.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lxd", type=int, default=240)
    ap.add_argument("--devices", type=int, nargs="*", default=[1, 2, 4, 8])
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--platform", type=str, default="cpu")
    args = ap.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from graingraphnn_tpu.data import extraction, heterograph
    from graingraphnn_tpu.graph import state
    from graingraphnn_tpu.models import grain_nn, hyper
    from graingraphnn_tpu.parallel import halo, mesh as mesh_mod, partition

    traj = extraction.TrajectoryExtractor(
        lxd=args.lxd, seed=1, frames=121, bc="periodic",
        physical_params={"G": 4.0, "R": 1.0},
    )
    traj.area_counts = dict(zip(*np.unique(traj.alpha_field, return_counts=True)))
    traj.area_traj.append(dict(traj.area_counts))
    traj.states.append(heterograph.tensorize(traj, 0))
    hg0 = extraction.make_test_sample(traj, span=6)
    feats = hg0.feature_dicts
    ei = hg0.edge_index_dicts
    ew = hg0.edge_weight_dicts
    masks = {
        "grain": np.asarray(hg0.mask["grain"]).reshape(-1),
        "joint": np.ones(len(feats["joint"])),
    }
    ng, nj = len(feats["grain"]), len(feats["joint"])
    n_edges = sum(int((np.asarray(v)[0] >= 0).sum()) for v in ei.values())

    hp = hyper.regressor(0)
    params = grain_nn.init_regressor(jax.random.PRNGKey(0), hp)

    def timed(fn, *a):
        out = fn(*a)
        jax.tree_util.tree_map(np.asarray, out)  # force
        best = 1e30
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = fn(*a)
            jax.tree_util.tree_map(np.asarray, out)
            best = min(best, time.perf_counter() - t0)
        return best

    C = hp.layer_size
    results = {
        "graph": {"lxd": args.lxd, "grains": ng, "joints": nj,
                  "message_edges": n_edges},
        "platform": str(jax.devices()[0].platform),
        "note": "virtual CPU mesh shares one host's cores; absolute scaling "
                "is only meaningful on real multi-chip hardware",
        "comm_model_bytes_per_conv": {
            # volumes exchanged to materialize source tables for one conv
            "allgather": f"(D-1)/D * {(ng + nj) * C * 4}",
            "halo": f"2/D * {(ng + nj) * C * 4}",
        },
        "points": [],
    }

    # single-device baseline
    single = state.build_sample(feats, ei, ew, masks)
    fwd1 = jax.jit(lambda p, s: grain_nn.apply_regressor(p, hp, s))
    t1 = timed(fwd1, params, single)
    results["points"].append(
        {"strategy": "single", "D": 1, "ms": round(t1 * 1e3, 3),
         "edges_per_s": round(n_edges / t1), "efficiency": 1.0}
    )
    print(results["points"][-1], flush=True)

    avail = len(jax.devices())
    for D in args.devices:
        if D < 2 or D > avail:
            continue
        # halo stripes
        try:
            striped, _meta = halo.build_striped(feats, ei, ew, masks, D)
            mesh = mesh_mod.make_mesh([("gp", D)], n_devices=D)
            fwd = halo.make_halo_forward(hp, mesh, model="regressor")
            t = timed(fwd, params, striped)
            results["points"].append(
                {"strategy": "halo", "D": D, "ms": round(t * 1e3, 3),
                 "edges_per_s": round(n_edges / t),
                 "efficiency": round(t1 / (t * D), 3)}
            )
            print(results["points"][-1], flush=True)
        except ValueError as e:
            results["points"].append({"strategy": "halo", "D": D, "error": str(e)})

        # all-gather row sharding (capacities must divide D)
        rnd = lambda v: -(-v // D) * D
        samp = state.build_sample(
            feats, ei, ew, masks,
            grain_cap=rnd(ng), joint_cap=rnd(nj),
            jj_edge_cap=rnd(int((np.asarray(ei[("joint", "connect", "joint")])[0] >= 0).sum())),
        )
        mesh = mesh_mod.make_mesh([("gp", D)], n_devices=D)
        fwd = partition.make_partitioned_forward(hp, mesh, model="regressor")
        t = timed(fwd, params, samp)
        results["points"].append(
            {"strategy": "allgather", "D": D, "ms": round(t * 1e3, 3),
             "edges_per_s": round(n_edges / t),
             "efficiency": round(t1 / (t * D), 3)}
        )
        print(results["points"][-1], flush=True)

    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/scaling.json", "w") as f:
        json.dump(results, f, indent=1)
    print("wrote artifacts/scaling.json")


if __name__ == "__main__":
    main()
