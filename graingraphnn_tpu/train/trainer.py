"""Training drivers (reference train.py:74-195) on optax.

Optimizer: Adam + staircase step decay (gamma 0.5 every `decay_step` epochs,
train.py:82-93). Transfer mode mirrors the reference's three parameter
groups (train.py:83-91): encoder lr*lr_1*lr_2, decoder lr*lr_2, lin2 lr —
note the reference's transfer optimizer receives ONLY those groups, so lin1
stays frozen at its initialization; reproduced here with a zero-lr label.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.dataset import GraphDataset
from ..graph.state import GraphSample
from ..models import grain_nn
from ..models.hyper import HyperParams
from . import loss as loss_mod
from .metrics import FeatureMetric


def lr_schedule(hp: HyperParams, steps_per_epoch: int):
    return optax.exponential_decay(
        init_value=hp.lr,
        transition_steps=max(1, hp.decay_step * steps_per_epoch),
        decay_rate=0.5,
        staircase=True,
    )


def make_optimizer(hp: HyperParams, params, steps_per_epoch: int):
    sched = lr_schedule(hp, steps_per_epoch)
    if hp.transfer and hp.model_type == "classifier":
        def label_fn(p):
            return {
                "encoder": jax.tree_util.tree_map(lambda _: "encoder", p["encoder"]),
                "decoder": jax.tree_util.tree_map(lambda _: "decoder", p["decoder"]),
                "lin1": jax.tree_util.tree_map(lambda _: "frozen", p["lin1"]),
                "lin2": jax.tree_util.tree_map(lambda _: "head", p["lin2"]),
            }

        tx = optax.multi_transform(
            {
                "encoder": optax.adam(
                    optax.exponential_decay(
                        hp.lr * hp.lr_1 * hp.lr_2,
                        max(1, hp.decay_step * steps_per_epoch), 0.5,
                        staircase=True,
                    )
                ),
                "decoder": optax.adam(
                    optax.exponential_decay(
                        hp.lr * hp.lr_2,
                        max(1, hp.decay_step * steps_per_epoch), 0.5,
                        staircase=True,
                    )
                ),
                "head": optax.adam(sched),
                "frozen": optax.set_to_zero(),
            },
            label_fn(params),
        )
        return tx
    return optax.adam(sched)


def make_loss_fn(hp: HyperParams) -> Callable:
    if hp.model_type == "regressor":
        apply = grain_nn.apply_regressor
        def per_sample(params, s: GraphSample):
            pred = apply(params, hp, s)
            return loss_mod.regressor_loss(pred, s, edge_len=hp.edge_len)
    else:
        apply = grain_nn.apply_classifier
        def per_sample(params, s: GraphSample):
            pred = apply(params, hp, s)
            return loss_mod.classifier_loss(pred, s, pos_weight=hp.pos_weight)

    def batch_loss(params, batch: GraphSample):
        return jnp.mean(jax.vmap(partial(per_sample, params))(batch))

    return batch_loss


def make_train_step(hp: HyperParams, tx):
    batch_loss = make_loss_fn(hp)

    @jax.jit
    def step(params, opt_state, batch):
        lval, grads = jax.value_and_grad(batch_loss)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, lval

    return step


def make_eval_fn(hp: HyperParams):
    apply = (
        grain_nn.apply_regressor
        if hp.model_type == "regressor"
        else grain_nn.apply_classifier
    )
    batch_loss = make_loss_fn(hp)

    @jax.jit
    def evaluate(params, batch):
        pred = jax.vmap(partial(apply, params, hp))(batch)
        return batch_loss(params, batch), pred

    return evaluate


def _sample_np(batch: GraphSample) -> Dict[str, np.ndarray]:
    return {
        "grain_mask": np.asarray(batch.grain_mask),
        "joint_mask": np.asarray(batch.joint_mask),
        "y_grain": np.asarray(batch.y_grain),
        "y_joint": np.asarray(batch.y_joint),
        "y_grain_event": np.asarray(batch.y_grain_event),
        "y_edge_event": np.asarray(batch.y_edge_event),
    }


def train(
    hp: HyperParams,
    params,
    train_ds: GraphDataset,
    valid_ds: GraphDataset,
    *,
    epochs: Optional[int] = None,
    log: Callable[[str], None] = print,
    eval_batch_size: int = 64,
    seed: int = 35,
):
    """Full training loop (train.py:74-195). Returns (params, history dict)."""
    epochs = epochs if epochs is not None else hp.epoch
    steps_per_epoch = max(1, len(train_ds) // hp.batch_size)
    tx = make_optimizer(hp, params, steps_per_epoch)
    opt_state = tx.init(params)
    step_fn = make_train_step(hp, tx)
    eval_fn = make_eval_fn(hp)
    metric = FeatureMetric(hp.model_type)

    def run_eval(first_epoch):
        tot, count = 0.0, 0
        for batch in valid_ds.batches(eval_batch_size):
            lval, pred = eval_fn(params, batch)
            tot += float(lval)
            count += 1
            metric.record(None, jax.tree_util.tree_map(np.asarray, pred),
                          _sample_np(batch), first_epoch)
        return tot / max(count, 1)

    history = {"train_loss": [], "valid_loss": [], "metrics": []}

    # epoch-0 evaluation (train.py:97-134)
    t0 = time.time()
    tot, count = 0.0, 0
    bl = jax.jit(make_loss_fn(hp))
    for batch in train_ds.batches(hp.batch_size):
        tot += float(bl(params, batch))
        count += 1
    train_l = tot / max(count, 1)
    valid_l = run_eval(True)
    log(f"Epoch:0, Train loss:{train_l:.6f}, valid loss:{valid_l:.6f}")
    history["train_loss"].append(train_l)
    history["valid_loss"].append(valid_l)
    history["metrics"].append(metric.epoch_summary())
    log(f"total number of trained parameters {grain_nn.count_params(params)}")

    for epoch in range(1, epochs + 1):
        tot, count = 0.0, 0
        for batch in train_ds.batches(hp.batch_size, shuffle=True, seed=seed + epoch):
            params, opt_state, lval = step_fn(params, opt_state, batch)
            tot += float(lval)
            count += 1
        train_l = tot / max(count, 1)
        valid_l = run_eval(False)
        history["train_loss"].append(train_l)
        history["valid_loss"].append(valid_l)
        history["metrics"].append(metric.epoch_summary())
        log(f"Epoch:{epoch}, Train loss:{train_l:.6f}, valid loss:{valid_l:.6f}")

    history["time"] = time.time() - t0
    if hp.model_type == "classifier":
        thr, p, r = metric.optimal_threshold()
        history["threshold"] = thr
        log(f"the optimal threshold for classification is: {thr} "
            f"with precision/recall {p:.3f}/{r:.3f}")
    return params, history


def train_scanned(
    hp: HyperParams,
    params,
    train_ds: GraphDataset,
    valid_ds: GraphDataset,
    *,
    epochs: Optional[int] = None,
    log: Callable[[str], None] = print,
    eval_every: int = 10,
    eval_batch_size: int = 64,
    seed: int = 35,
    gr_jitter: bool = False,
    gr_jitter_p: float = 1.0,
    gr_hull: tuple = (0.5, 10.0, 0.2, 2.0),
):
    """Device-resident training: the whole (stacked) dataset lives on the
    accelerator and one jit call runs a full epoch as a lax.scan over
    shuffled batches — amortizing dispatch latency, which dominates for
    these small graphs. This is the TPU-idiomatic counterpart of `train`
    (numerically the same step; shuffle order differs).

    gr_jitter=True resamples each sample's thermal features (joint G, R
    columns) per step uniformly over the reference's RandGR hull
    (G in [0.5, 10], R in [0.2, 2] — TemperatureProfile3DAnalytic.py:40-41)
    as feature-space augmentation: with a single-seed corpus the true
    (G, R)-response is unlearnable, and inference at out-of-hull thermal
    conditions (the 120 um case's G=10, R=2) otherwise extrapolates a
    spurious response (artifacts/CALIBRATION_120um.json). Jitter teaches
    the invariance instead of clamping it at inference.
    """
    from ..graph.state import stack as stack_samples

    epochs = epochs if epochs is not None else hp.epoch
    B = hp.batch_size
    data = stack_samples(train_ds.samples)
    N = len(train_ds)
    steps = N // B
    tx = make_optimizer(hp, params, steps)
    opt_state = tx.init(params)
    batch_loss = make_loss_fn(hp)

    data = jax.device_put(data)  # resident once; passed as an argument so it
    # is NOT baked into the executable as a constant

    @jax.jit
    def run_epoch(params, opt_state, data, perm, ekey):
        def body(carry, idx):
            p, o = carry
            batch = jax.tree_util.tree_map(lambda a: a[idx], data)
            if gr_jitter:
                k = jax.random.fold_in(ekey, idx[0])
                g = jax.random.uniform(k, (B, 1), minval=gr_hull[0],
                                       maxval=gr_hull[1])
                r = jax.random.uniform(jax.random.fold_in(k, 1), (B, 1),
                                       minval=gr_hull[2],
                                       maxval=gr_hull[3])
                # per-sample coin: keep the true thermal features with
                # probability 1-p so in-hull sharpness is preserved
                keep = jax.random.uniform(
                    jax.random.fold_in(k, 2), (B, 1)) >= gr_jitter_p
                # kept samples retain their ORIGINAL per-joint thermal
                # columns (a moving meltpool / RandGR profile varies G,R
                # across joints — broadcasting row 0 would erase that);
                # jittered samples get one uniform (G,R) draw per sample
                jx = batch.joint_x
                keep_b = jnp.broadcast_to(keep, jx.shape[:2])
                g_jit = jnp.broadcast_to(1.0 - g / 10.0, jx.shape[:2])
                r_jit = jnp.broadcast_to(r / 2.0, jx.shape[:2])
                jx = jx.at[:, :, 3].set(
                    jnp.where(keep_b, jx[:, :, 3], g_jit))
                jx = jx.at[:, :, 4].set(
                    jnp.where(keep_b, jx[:, :, 4], r_jit))
                batch = batch.replace(joint_x=jx)
            lval, grads = jax.value_and_grad(batch_loss)(p, batch)
            updates, o = tx.update(grads, o, p)
            p = optax.apply_updates(p, updates)
            return (p, o), lval

        batch_idx = perm[: steps * B].reshape(steps, B)
        (params, opt_state), losses = jax.lax.scan(body, (params, opt_state), batch_idx)
        return params, opt_state, jnp.mean(losses)

    eval_fn = make_eval_fn(hp)
    metric = FeatureMetric(hp.model_type)
    history = {"train_loss": [], "valid_loss": [], "metrics": []}
    rng = np.random.default_rng(seed)
    t0 = time.time()
    for epoch in range(1, epochs + 1):
        perm = jnp.asarray(rng.permutation(N))
        params, opt_state, train_l = run_epoch(
            params, opt_state, data, perm,
            jax.random.PRNGKey(seed * 1000 + epoch))
        history["train_loss"].append(float(train_l))
        if epoch % eval_every == 0 or epoch == epochs:
            tot, count = 0.0, 0
            for batch in valid_ds.batches(eval_batch_size):
                lval, pred = eval_fn(params, batch)
                tot += float(lval)
                count += 1
                metric.record(None, jax.tree_util.tree_map(np.asarray, pred),
                              _sample_np(batch), epoch == eval_every)
            valid_l = tot / max(count, 1)
            history["valid_loss"].append(valid_l)
            history["metrics"].append(metric.epoch_summary(verbose=False))
            log(f"Epoch:{epoch}, Train loss:{float(train_l):.6f}, "
                f"valid loss:{valid_l:.6f}, AUC:{history['metrics'][-1]['PR_AUC']:.4f}")
    history["time"] = time.time() - t0
    if hp.model_type == "classifier" and history["metrics"]:
        thr, p_, r_ = metric.optimal_threshold()
        history["threshold"] = thr
        log(f"optimal threshold {thr} (P {p_:.3f} / R {r_:.3f})")
    return params, history
