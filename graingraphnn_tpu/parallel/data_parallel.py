"""Data-parallel training over a device mesh.

Replaces the reference's single-node DDP (dist_train.py:20-95: NCCL process
group, manual contiguous dataset sharding, gradient allreduce) with
jit + sharding annotations: the batch is sharded along the 'dp' mesh axis,
params are replicated, and XLA inserts the gradient all-reduce.
"""

from __future__ import annotations

from functools import partial

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..graph.state import GraphSample
from ..models.hyper import HyperParams
from ..train.trainer import make_loss_fn


def shard_batch(batch: GraphSample, mesh: Mesh, axis: str = "dp") -> GraphSample:
    """Place a stacked batch with its leading dim sharded over `axis`."""
    sharding = NamedSharding(mesh, P(axis))

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


def make_dp_train_step(hp: HyperParams, tx, mesh: Mesh, axis: str = "dp"):
    """jit train step with dp-sharded batch; gradients all-reduce via XLA.

    Batch size must be divisible by the dp axis size.
    """
    batch_loss = make_loss_fn(hp)
    repl = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P(axis))

    @partial(
        jax.jit,
        out_shardings=(repl, repl, repl),
    )
    def step(params, opt_state, batch):
        lval, grads = jax.value_and_grad(batch_loss)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, lval

    def run(params, opt_state, batch):
        return step(params, opt_state, shard_batch(batch, mesh, axis))

    return run
