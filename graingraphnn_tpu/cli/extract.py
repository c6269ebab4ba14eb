"""Graph-trajectory generation CLI (reference graph_trajectory.py:1106-1341).

Modes:
  train    — extract PF .h5, calibrate span, emit windowed training samples
  test     — extract PF .h5, emit the t=0 inference sample + truth trajectory
  generate — synthesize a seeded initial graph (no PF data) for inference
  check    — extract one trajectory as a smoke test
"""

from __future__ import annotations

import argparse
import os
import pickle


def main():
    p = argparse.ArgumentParser("Generate heterograph trajectory")
    p.add_argument("--mode", type=str, default="test",
                   choices=["train", "test", "generate", "check"])
    p.add_argument("--rawdat_dir", type=str, default="./rawdat_PF/40_40/")
    p.add_argument("--save_dir", type=str, default="./graphs/40_40/")
    p.add_argument("--cache_dir", type=str, default="./data_cache")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--G", type=float, default=2)
    p.add_argument("--R", type=float, default=0.4)
    p.add_argument("--boundary", type=str, default="periodic")
    p.add_argument("--size", dest="adjust_grain_size", action="store_true")
    p.add_argument("--orien", dest="adjust_grain_orien", action="store_true")
    p.add_argument("--frame", type=int, default=121)
    p.add_argument("--span", type=int, default=0)
    p.add_argument("--lxd", type=int, default=40)
    p.add_argument("--prev", type=int, default=0)
    p.add_argument("--save_traj", type=bool, default=True)
    p.add_argument("--gr_grid", type=str, default="/root/reference/GR_train_grid.pkl")
    p.add_argument("--user_config", action="store_true",
                   help="generate mode: use the user-facing config (noflux)")
    args = p.parse_args()

    from ..data import extraction, reference_io, thermal

    os.makedirs(args.save_dir, exist_ok=True)

    def dump_states(states, path):
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
            for s in states
        ]
        with open(path, "wb") as f:
            pickle.dump(payload, f)
        print("wrote", path)

    if args.mode in ("train", "check"):
        traj = extraction.TrajectoryExtractor(
            lxd=args.lxd, seed=args.seed, frames=args.frame, bc=args.boundary,
            adjust_grain_size=args.adjust_grain_size,
            adjust_grain_orien=args.adjust_grain_orien,
        )
        traj.extract(args.rawdat_dir, cache_dir=args.cache_dir)
        if args.mode == "check":
            print("extracted", len(traj.states), "frames;",
                  "quarantined", traj.save_frame.count(False))
            return
        span = args.span or extraction.calibrate_span(traj)
        print("calibrated span:", span)
        samples = extraction.make_training_samples(traj, span=span, prev=args.prev)
        g = str(int(10 * traj.physical_params["G"]))
        r = str(int(10 * traj.physical_params["R"]))
        dump_states(samples, os.path.join(
            args.save_dir,
            f"seed{args.seed}_G{g}_R{r}_span{span}_train.pkl",
        ))

    elif args.mode == "test":
        traj = extraction.TrajectoryExtractor(
            lxd=args.lxd, seed=args.seed, frames=args.frame, bc=args.boundary,
            adjust_grain_size=args.adjust_grain_size,
            adjust_grain_orien=args.adjust_grain_orien,
        )
        traj.match_graph = False
        traj.extract(args.rawdat_dir, cache_dir=args.cache_dir)
        grid = reference_io.load_pickle(args.gr_grid)
        span = args.span or thermal.span_from_gr_grid(
            grid, traj.physical_params["G"], traj.physical_params["R"]
        )
        hg0 = extraction.make_test_sample(traj, span=span)
        g = str(round(traj.physical_params["G"], 3))
        r = str(round(traj.physical_params["R"], 3))
        dump_states([hg0], os.path.join(
            args.save_dir, f"seed{args.seed}_G{g}_R{r}_span{span}.pkl"
        ))

    elif args.mode == "generate":
        user_cfg = None
        if args.user_config:
            # user-facing geometry/physics config (user_generate.py:9-40):
            # no-flux boundary, line/cylinder melt pool, aspect ratios
            from ..data.thermal import default_generate_config

            user_cfg = default_generate_config()
            user_cfg["initial_parameters"]["seed"] = args.seed
            user_cfg["physical_parameters"] = {"G": args.G, "R": args.R}
        traj = extraction.TrajectoryExtractor(
            lxd=args.lxd, seed=args.seed, frames=args.frame,
            physical_params={"G": args.G, "R": args.R},
            adjust_grain_size=args.adjust_grain_size,
            adjust_grain_orien=args.adjust_grain_orien,
            user_defined_config=user_cfg,
        )
        import numpy as np

        ids, counts = np.unique(traj.alpha_field, return_counts=True)
        traj.area_counts = dict(zip(ids, counts))
        traj.area_traj.append(traj.area_counts)
        from ..data import heterograph

        traj.states.append(heterograph.tensorize(traj, 0))
        grid = reference_io.load_pickle(args.gr_grid)
        span = args.span or thermal.span_from_gr_grid(grid, args.G, args.R)
        hg0 = extraction.make_test_sample(traj, span=span)
        dump_states([hg0], os.path.join(
            args.save_dir,
            f"seed{args.seed}_G{round(args.G,3)}_R{round(args.R,3)}_span{span}.pkl",
        ))


if __name__ == "__main__":
    main()
