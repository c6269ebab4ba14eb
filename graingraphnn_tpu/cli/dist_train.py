"""Multi-device data-parallel training CLI (reference dist_train.py).

Instead of NCCL process groups + mp.spawn + manual dataset sharding
(dist_train.py:76-95,394-395), the batch is sharded over a jax.sharding
mesh and XLA inserts the gradient all-reduce. Multi-host runs initialize
with jax.distributed (same script on every host).

  python -m graingraphnn_tpu.cli.dist_train --dataset=... --n_devices=8
"""

from __future__ import annotations

import argparse
import pickle
import time


def main(argv=None):
    p = argparse.ArgumentParser("Distributed data-parallel training")
    p.add_argument("--dataset", type=str, required=True)
    p.add_argument("--platform", type=str, default="tpu", choices=["tpu", "cpu"])
    p.add_argument("--n_devices", type=int, default=0, help="0 = all")
    p.add_argument("--model_type", type=str, default="regressor")
    p.add_argument("--model_id", type=int, default=0)
    p.add_argument("--model_dir", type=str, default="./model/")
    p.add_argument("--epochs", type=int, default=0)
    p.add_argument("--seed", type=int, default=35)
    p.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize() first")
    p.add_argument("--partition", type=str, default="dp",
                   choices=["dp", "hybrid", "halo"],
                   help="dp: batch sharding; hybrid: dp x gp node-row "
                        "sharding (all-gather); halo: spatial stripes with "
                        "neighbor ppermute, one graph per step")
    p.add_argument("--gp", type=int, default=0,
                   help="graph-partition axis size for --partition=hybrid "
                        "(0 = half the devices)")
    args = p.parse_args(argv)

    import jax

    if args.multihost:
        jax.distributed.initialize()
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import optax

    from ..data.dataset import GraphDataset, common_capacities, split
    from ..graph import schema, state
    from ..models import grain_nn, hyper
    from ..parallel import data_parallel, mesh as mesh_mod
    from ..train import checkpoint, trainer

    with open(args.dataset, "rb") as f:
        raw = pickle.load(f)

    n_dev = args.n_devices or len(jax.devices())
    hp = hyper.regressor(args.model_id) if args.model_type == "regressor" else hyper.classifier(args.model_id)
    params = grain_nn.init_regressor(jax.random.PRNGKey(args.seed), hp) \
        if args.model_type == "regressor" \
        else grain_nn.init_classifier(jax.random.PRNGKey(args.seed), hp)
    epochs = args.epochs or hp.epoch

    if args.partition == "halo":
        # one spatially-striped graph per step; stripe count defaults to the
        # device count but can be lowered with --gp when the graph is too
        # small (stripe width must exceed the edge interaction range)
        from ..parallel import halo

        n_dev = args.gp or n_dev

        def stripe_all(caps):
            out = []
            for r in raw:
                s, m = halo.build_striped(
                    r["feature_dicts"], r["edge_index_dicts"],
                    r["edge_weight_dicts"],
                    {"grain": r["mask"]["grain"], "joint": r["mask"]["joint"]},
                    n_dev, dict(r["target_dicts"]), **caps,
                )
                out.append((s, m))
            return out

        built = stripe_all({})
        caps = {
            "grain_cap": max(m.grain_cap for _, m in built),
            "joint_cap": max(m.joint_cap for _, m in built),
            "jj_cap": max(m.jj_cap for _, m in built),
        }
        # one compile for the whole dataset: rebuild to the common capacity
        striped = [
            s if (m.grain_cap, m.joint_cap, m.jj_cap)
            == (caps["grain_cap"], caps["joint_cap"], caps["jj_cap"])
            else halo.build_striped(
                r["feature_dicts"], r["edge_index_dicts"],
                r["edge_weight_dicts"],
                {"grain": r["mask"]["grain"], "joint": r["mask"]["joint"]},
                n_dev, dict(r["target_dicts"]), **caps,
            )[0]
            for (s, m), r in zip(built, raw)
        ]
        train_list, _valid = split(striped)
        mesh = mesh_mod.make_mesh([("gp", n_dev)], n_devices=n_dev)
        print(f"halo stripes over {n_dev} devices, {len(train_list)} graphs")
        tx = trainer.make_optimizer(hp, params, max(1, len(train_list)))
        opt_state = tx.init(params)
        step = halo.make_halo_train_step(hp, tx, mesh)
        t0 = time.time()
        for epoch in range(1, epochs + 1):
            tot = 0.0
            for s in train_list:
                params, opt_state, lval = step(params, opt_state, s)
                tot += float(lval)
            print(f"Epoch:{epoch}, Train loss:{tot/max(len(train_list),1):.6f}")
        print("training time", time.time() - t0)
        checkpoint.save(
            f"{args.model_dir}/dist_{args.model_type}{args.model_id}", params, hp
        )
        return

    gp = 1
    if args.partition == "hybrid":
        gp = args.gp or max(1, n_dev // 2)
    dp = n_dev // gp

    sizes = [
        (
            r["feature_dicts"]["grain"].shape[0],
            r["feature_dicts"]["joint"].shape[0],
            int((r["edge_index_dicts"][schema.EDGE_TYPES[2]][0] > -1).sum()),
        )
        for r in raw
    ]
    ng, nj, ne = common_capacities(sizes)
    # shard_map requires node/edge axes divisible by gp
    rnd = lambda v: -(-v // gp) * gp
    ng, nj, ne = rnd(ng), rnd(nj), rnd(ne)
    samples = [
        state.build_sample(
            r["feature_dicts"], r["edge_index_dicts"], r["edge_weight_dicts"],
            {"grain": r["mask"]["grain"], "joint": r["mask"]["joint"]},
            dict(r["target_dicts"]),
            grain_cap=ng, joint_cap=nj, jj_edge_cap=ne,
        )
        for r in raw
    ]
    train_list, valid_list = split(samples)
    train_ds = GraphDataset(train_list)

    if args.partition == "hybrid":
        from ..parallel import partition

        mesh = mesh_mod.make_mesh([("dp", dp), ("gp", gp)], n_devices=n_dev)
        print(f"hybrid dp={dp} x gp={gp} over {n_dev} devices")
    else:
        mesh = mesh_mod.make_mesh([("dp", n_dev)], n_devices=n_dev)
        print(f"data-parallel over {n_dev} devices")

    # global batch = per-device batch x dp size (ref shards its sample list
    # per rank, dist_train.py:84-88)
    global_batch = hp.batch_size * dp

    steps_per_epoch = max(1, len(train_ds) // global_batch)
    tx = trainer.make_optimizer(hp, params, steps_per_epoch)
    opt_state = tx.init(params)
    if args.partition == "hybrid":
        step = partition.make_hybrid_train_step(hp, tx, mesh)
    else:
        step = data_parallel.make_dp_train_step(hp, tx, mesh)

    t0 = time.time()
    for epoch in range(1, epochs + 1):
        tot, count = 0.0, 0
        for batch in train_ds.batches(global_batch, shuffle=True,
                                      seed=args.seed + epoch, drop_last=True):
            params, opt_state, lval = step(params, opt_state, batch)
            tot += float(lval)
            count += 1
        print(f"Epoch:{epoch}, Train loss:{tot/max(count,1):.6f}")
    print("training time", time.time() - t0)
    checkpoint.save(
        f"{args.model_dir}/dist_{args.model_type}{args.model_id}", params, hp
    )


if __name__ == "__main__":
    main()
