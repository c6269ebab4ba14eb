"""Training CLI (reference train.py:200-441).

  python -m graingraphnn_tpu.cli.train --model_type=regressor --model_id=0 \
      --dataset=path/to/train.pkl
"""

from __future__ import annotations

import argparse
import os
import pickle


def main(argv=None):
    p = argparse.ArgumentParser("Train the model.")
    p.add_argument("--dataset", type=str, required=True,
                   help="pickle of extracted training samples (cli.extract --mode=train)")
    p.add_argument("--platform", type=str, default="tpu", choices=["tpu", "cpu"])
    p.add_argument("--use_sample", type=str, default="all")
    p.add_argument("--model_dir", type=str, default="./model/")
    p.add_argument("--model_id", type=int, default=0)
    p.add_argument("--prefix", type=str, default="")
    p.add_argument("--model_type", type=str, default="regressor")
    p.add_argument("--regressor_id", type=int, default=0)
    p.add_argument("--seed", type=int, default=35)
    p.add_argument("--train_ratio", type=float, default=0.95)
    p.add_argument("--epochs", type=int, default=0, help="override hp.epoch")
    p.add_argument("--history", action="store_true")
    p.add_argument("--edge_len", action="store_true")
    p.add_argument("--no-transfer", dest="transfer", action="store_false")
    p.set_defaults(transfer=True)
    args = p.parse_args(argv)

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from ..data.dataset import GraphDataset, common_capacities, split
    from ..graph import schema, state
    from ..models import grain_nn, hyper
    from ..train import checkpoint, trainer

    with open(args.dataset, "rb") as f:
        raw = pickle.load(f)
    if args.use_sample != "all":
        raw = raw[: int(args.use_sample)]

    sizes = [
        (
            r["feature_dicts"]["grain"].shape[0],
            r["feature_dicts"]["joint"].shape[0],
            int((r["edge_index_dicts"][schema.EDGE_TYPES[2]][0] > -1).sum()),
        )
        for r in raw
    ]
    ng, nj, ne = common_capacities(sizes)
    samples = []
    for r in raw:
        targets = dict(r["target_dicts"])
        if "edge" in r["mask"]:
            targets["edge_mask"] = r["mask"]["edge"]
        samples.append(
            state.build_sample(
                r["feature_dicts"], r["edge_index_dicts"], r["edge_weight_dicts"],
                {"grain": r["mask"]["grain"], "joint": r["mask"]["joint"]},
                targets, grain_cap=ng, joint_cap=nj, jj_edge_cap=ne,
            )
        )
    train_list, valid_list = split(samples, args.train_ratio)
    train_ds, valid_ds = GraphDataset(train_list), GraphDataset(valid_list)
    print(f"number of train, validation runs {len(train_ds)} {len(valid_ds)}")

    if args.model_type == "regressor":
        hp = hyper.regressor(args.model_id, history=args.history, edge_len=args.edge_len)
        params = grain_nn.init_regressor(jax.random.PRNGKey(args.seed), hp)
    else:
        if args.transfer:
            hp = hyper.classifier_transfered(args.model_id)
            reg_params, _, _ = checkpoint.load(
                os.path.join(args.model_dir, f"regressor{args.regressor_id}")
            )
            params = grain_nn.init_classifier(
                jax.random.PRNGKey(args.seed), hp, regressor_params=reg_params
            )
            print("transfered learned parameters from regressor")
        else:
            hp = hyper.classifier(args.model_id)
            params = grain_nn.init_classifier(jax.random.PRNGKey(args.seed), hp)

    epochs = args.epochs or hp.epoch
    params, hist = trainer.train(hp, params, train_ds, valid_ds, epochs=epochs,
                                 seed=args.seed)
    extra = {}
    if "threshold" in hist:
        extra["threshold"] = hist["threshold"]
    checkpoint.save(
        os.path.join(args.model_dir, f"{args.prefix}{args.model_type}{args.model_id}"),
        params, hp, extra=extra,
    )
    print("training time", hist["time"])


if __name__ == "__main__":
    main()
