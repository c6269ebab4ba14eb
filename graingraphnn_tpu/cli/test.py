"""Rollout inference CLI (reference test.py:72-611).

  python -m graingraphnn_tpu.cli.test --rawdat_dir=... --seed=10020 \
      --model_dir=./model
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    p = argparse.ArgumentParser("Rollout inference")
    p.add_argument("--platform", type=str, default="cpu", choices=["tpu", "cpu"])
    p.add_argument("--model_dir", type=str, default="./model/")
    p.add_argument("--regressor_id", type=int, default=0)
    p.add_argument("--classifier_id", type=int, default=1)
    p.add_argument("--rawdat_dir", type=str, default="/root/reference/rawdat_PF/40_40")
    p.add_argument("--cache_dir", type=str, default="./data_cache")
    p.add_argument("--seed", type=int, default=10020)
    p.add_argument("--lxd", type=int, default=40)
    p.add_argument("--span", type=int, default=0)
    p.add_argument("--growth_height", type=float, default=-1)
    p.add_argument("--nucleation_density", type=float, default=0.0)
    p.add_argument("--generate", action="store_true",
                   help="generate mode (user_generate.py counterpart): "
                        "roll a fresh Voronoi microstructure at --lxd with "
                        "--G/--R thermal conditions — no PF truth, so "
                        "compare is off")
    p.add_argument("--G", type=float, default=10.0)
    p.add_argument("--R", type=float, default=2.0)
    p.add_argument("--meltpool", choices=["line", "cylinder"],
                   default="line",
                   help="generate mode: cylinder = moving melt pool with "
                        "a sliding active window (user_generate.py "
                        "meltpool config; models.py:480-507) — supported "
                        "on BOTH the host engine and the device scan")
    p.add_argument("--r0", type=float, default=0.8)
    p.add_argument("--z0", type=float, default=0.4)
    p.add_argument("--melt_pool_angle", type=float, default=0.7853981633974483)
    p.add_argument("--c_threshold", type=float, default=0.0,
                   help="override the checkpoint's edge-event threshold")
    p.add_argument("--no-compare", dest="compare", action="store_false")
    p.set_defaults(compare=True)
    p.add_argument("--verbose", action="store_true")
    p.add_argument("--jit_editor", action="store_true")
    p.add_argument("--temporal", action="store_true")
    p.add_argument("--interp_frames", type=int, default=0)
    p.add_argument("--plot3D", dest="plot3d", action="store_true")
    p.add_argument("--device_resident", action="store_true",
                   help="run the zero-host-transfer device scan "
                        "(rollout.device_driver): spans advance on device, "
                        "QoIs pulled every --eval_every spans")
    p.add_argument("--eval_every", type=int, default=1)
    p.add_argument("--partition", type=int, default=0,
                   help="run the COMPOSED multi-chip partitioned rollout "
                        "over this many devices (halo-striped span forward "
                        "+ column-sharded topology editor + shared ELL "
                        "finalize; parallel.partitioned_rollout). Implies "
                        "the device-driver path; trajectory-equal to the "
                        "single-device scan (tests). On CPU, set "
                        "XLA_FLAGS=--xla_force_host_platform_device_count=N")
    p.add_argument("--pallas", action="store_true",
                   help="device_resident only: fused bf16 Pallas convs")
    p.add_argument("--fused_editor", choices=["auto", "on", "off"],
                   default="auto",
                   help="device_resident only: single-launch Pallas topology "
                        "editor (bit-identical edits, ~2x step time on TPU); "
                        "auto = on for TPU backends")
    p.add_argument("--clamp_gr", type=str, default="",
                   help="'Gmin,Gmax,Rmin,Rmax': clamp thermal features to "
                        "the training hull before inference (off by "
                        "default — the reference extrapolates freely; see "
                        "artifacts/CALIBRATION_120um.json)")
    args = p.parse_args(argv)

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from ..data import extraction
    from ..rollout.engine import RolloutEngine
    from ..train import checkpoint

    if args.generate:
        import numpy as np

        from ..data import heterograph

        traj = extraction.TrajectoryExtractor(
            lxd=args.lxd, seed=args.seed, frames=121, bc="periodic",
            physical_params={"G": args.G, "R": args.R},
        )
        traj.area_counts = dict(
            zip(*np.unique(traj.alpha_field, return_counts=True)))
        traj.area_traj.append(dict(traj.area_counts))
        traj.states.append(heterograph.tensorize(traj, 0))
        args.compare = False
    else:
        traj = extraction.TrajectoryExtractor(
            lxd=args.lxd, seed=args.seed, frames=121
        )
        traj.match_graph = False
        traj.extract(args.rawdat_dir, cache_dir=args.cache_dir)
    hg0 = extraction.make_test_sample(traj, span=args.span or 6)

    params_r, hp_r, _ = checkpoint.load(
        os.path.join(args.model_dir, f"regressor{args.regressor_id}")
    )
    params_c, hp_c, extra = checkpoint.load(
        os.path.join(args.model_dir, f"classifier{args.classifier_id}")
    )
    c_threshold = args.c_threshold or extra.get("threshold", 0.6)
    meltpool = None
    if args.meltpool == "cylinder":
        if not args.generate:
            p.error("--meltpool=cylinder is a generate-mode option")
        meltpool = {"r0": args.r0, "z0": args.z0,
                    "melt_pool_angle": args.melt_pool_angle}
    if args.device_resident or args.partition:
        if args.temporal or args.interp_frames or args.plot3d:
            p.error("--device_resident covers the periodic rollout incl. "
                    "nucleation and the moving melt pool; temporal/interp/"
                    "plot3D stay on the host engine")
        from ..rollout.device_driver import run_device_resident

        res = run_device_resident(
            hg0, traj, params_r, hp_r, params_c, hp_c,
            span=args.span or 6, c_threshold=c_threshold,
            eval_every=args.eval_every, compare=args.compare,
            growth_height=args.growth_height, pallas=args.pallas,
            fused_editor={"auto": None, "on": True, "off": False}[
                args.fused_editor],
            verbose=args.verbose,
            nucleation_density=args.nucleation_density, seed=args.seed,
            partition=args.partition, meltpool=meltpool,
        )
    else:
        engine = RolloutEngine(
            params_r, hp_r, params_c, hp_c,
            c_threshold=c_threshold,
            seed=args.seed, verbose=args.verbose, jit_editor=args.jit_editor,
        )
        clamp = None
        if args.clamp_gr:
            clamp = tuple(float(v) for v in args.clamp_gr.split(","))
            if len(clamp) != 4:
                p.error("--clamp_gr expects 'Gmin,Gmax,Rmin,Rmax'")
        res = engine.run(
            hg0, traj, span=args.span or 6, compare=args.compare,
            growth_height=args.growth_height,
            nucleation_density=args.nucleation_density,
            temporal=args.temporal, interp_frames=args.interp_frames,
            collect_fields=args.plot3d, clamp_gr=clamp, meltpool=meltpool,
        )
    if args.plot3d and res["alpha_field_list"]:
        from ..viz.volume import GrainVisual

        gv = GrainVisual(lxd=args.lxd, seed=args.seed, height=traj.final_height)
        out = gv.graph_recon(
            traj.theta_z, res["alpha_field_list"],
            span=(args.span or 6) // (args.interp_frames + 1), frames=121,
            mesh_size=0.08, ini_height=traj.ini_height,
            final_height=traj.final_height,
            out=f"seed{args.seed}graph.vtk",
        )
        print("wrote", out)
    print(json.dumps({
        "final_layer_error": res["final_layer_error"],
        "mean_layer_error": res["mean_layer_error"],
        "events_tp": res["events_tp"],
        "events_truth": res["events_truth"],
        "events_pred": res["events_pred"],
        "KS": res.get("KS"),
        "inference_time_s": round(res["inference_time"], 2),
    }))


if __name__ == "__main__":
    main()
