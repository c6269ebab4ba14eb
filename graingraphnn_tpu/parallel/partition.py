"""Graph partitioning: one large grain graph split across devices.

The reference has no counterpart (its only scale-up is patch rescaling,
test.py:29-55); this is the graph-native analogue of sequence parallelism
demanded by the scaling targets: node rows (and their destination-major
neighbor lists) are sharded across the 'gp' mesh axis, each device computes
gates for its own destination nodes, and the source-node feature tables are
materialized with an `all_gather` over ICI before each conv application —
correct for any partition because the ELL tables hold global indices.

The all-gather moves only hidden-dim features (C ~ 96 floats/node), not
edges; per cell step the volume is O(N*C) while local compute is
O(N*K*C^2/D) — compute-dominated for realistic sizes. A halo-exchange
variant (ppermute of boundary nodes only, using a locality-preserving
partition) is the planned optimization; the all-gather path is the
correctness baseline it will be verified against.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..graph.state import GraphSample
from ..models import grain_nn
from ..models.hyper import HyperParams


def sample_specs(axis: str) -> GraphSample:
    """PartitionSpec pytree for a row-sharded GraphSample: grain-indexed rows
    and joint-indexed rows both sharded along `axis`; jj COO edges sharded;
    scalar counts replicated."""
    row2 = P(axis, None)
    row1 = P(axis)
    return GraphSample(
        grain_x=row2, joint_x=row2,
        grain_mask=row1, joint_mask=row1,
        push_nbr=row2, push_len=row2, push_mask=row2,
        connect_nbr=row2, connect_len=row2, connect_mask=row2,
        pull_nbr=row2, pull_len=row2, pull_mask=row2,
        jj_src=row1, jj_dst=row1, jj_len=row1, jj_mask=row1,
        y_grain=row2, y_joint=row2,
        y_edge_event=row1, y_grain_event=row1, y_edge=row1, y_edge_mask=row1,
        n_grain_rows=P(), n_joint_rows=P(), n_jj_rows=P(),
    )


def _gathers(axis: str):
    def src_gather(xg, xj):
        return (
            jax.lax.all_gather(xg, axis, axis=0, tiled=True),
            jax.lax.all_gather(xj, axis, axis=0, tiled=True),
        )

    def node_gather(h):
        return jax.lax.all_gather(h, axis, axis=0, tiled=True)

    return src_gather, node_gather


def make_partitioned_forward(
    hp: HyperParams,
    mesh: Mesh,
    model: str = "regressor",
    axis: str = "gp",
):
    """Returns fn(params, sample) running the forward with node rows sharded
    over `axis`. Node/edge capacities must be divisible by the axis size."""
    src_gather, node_gather = _gathers(axis)
    apply = (
        grain_nn.apply_regressor if model == "regressor" else grain_nn.apply_classifier
    )

    def local_fn(params, sample):
        return apply(params, hp, sample, src_gather=src_gather, node_gather=node_gather)

    if model == "regressor":
        out_specs = {"joint": P(axis, None), "grain": P(axis, None), "grain_area": P(axis)}
        if hp.edge_len:
            out_specs["edge"] = P(axis)
    else:
        out_specs = {"edge_event": P(axis), "edge": P(axis, None)}

    sharded = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), sample_specs(axis)),
        out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(sharded)


def make_partitioned_train_step(hp: HyperParams, tx, mesh: Mesh, axis: str = "gp"):
    """Training step over one partitioned graph: local masked loss terms are
    psum-reduced over the mesh axis, and the gradient of the replicated
    params is psum'd by shard_map's reverse-mode transfer."""
    from ..train import loss as loss_mod

    src_gather, node_gather = _gathers(axis)

    def local_partial_loss(params, sample):
        """This shard's additive term of the global loss. No psum inside the
        differentiated function: a psum inside grad replicates cotangents
        across shards, and the outer grad-psum then overcounts by D."""
        if hp.model_type == "regressor":
            pred = grain_nn.apply_regressor(
                params, hp, sample, src_gather=src_gather, node_gather=node_gather
            )
            jm = sample.joint_mask[:, None]
            gm = sample.grain_mask[:, None]
            j_sq = jnp.sum(jm * (sample.y_joint - pred["joint"]) ** 2)
            g_sq = jnp.sum(gm * (sample.y_grain - pred["grain"]) ** 2)
            return 100.0 * (
                j_sq / (sample.n_joint_rows * 2.0) + g_sq / (sample.n_grain_rows * 2.0)
            )
        pred = grain_nn.apply_classifier(
            params, hp, sample, src_gather=src_gather, node_gather=node_gather
        )
        z = pred["edge_event"]
        y = sample.y_edge_event
        valid = (y > -1.0).astype(z.dtype) * sample.jj_mask
        y01 = jnp.clip(y, 0.0, 1.0)
        per_edge = hp.pos_weight * y01 * jax.nn.softplus(-z) + (1 - y01) * jax.nn.softplus(z)
        # global valid count is gradient-free (labels/masks only)
        den = jnp.maximum(jax.lax.psum(jnp.sum(valid), axis), 1.0)
        return jnp.sum(per_edge * valid) / jax.lax.stop_gradient(den)

    def local_step(params, opt_state, sample):
        import optax

        lval, grads = jax.value_and_grad(local_partial_loss)(params, sample)
        # params are replicated; each shard's grad is its partial
        # contribution to the global loss — one psum reassembles the total
        lval = jax.lax.psum(lval, axis)
        grads = jax.tree_util.tree_map(lambda g: jax.lax.psum(g, axis), grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, lval

    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P(), sample_specs(axis)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_hybrid_train_step(
    hp: HyperParams, tx, mesh: Mesh, dp_axis: str = "dp", gp_axis: str = "gp"
):
    """2D-mesh training step: batch sharded over `dp_axis`, node rows of
    every sample sharded over `gp_axis` (graph partitioning inside data
    parallelism). Loss/grads reduce with psum over gp and pmean over dp."""
    import optax

    src_gather, node_gather = _gathers(gp_axis)

    def per_sample_partial_loss(params, s):
        """This gp-shard's additive term of one sample's loss (no psum
        inside grad — see make_partitioned_train_step)."""
        if hp.model_type == "regressor":
            pred = grain_nn.apply_regressor(
                params, hp, s, src_gather=src_gather, node_gather=node_gather
            )
            jm = s.joint_mask[:, None]
            gm = s.grain_mask[:, None]
            j_sq = jnp.sum(jm * (s.y_joint - pred["joint"]) ** 2)
            g_sq = jnp.sum(gm * (s.y_grain - pred["grain"]) ** 2)
            return 100.0 * (
                j_sq / (s.n_joint_rows * 2.0) + g_sq / (s.n_grain_rows * 2.0)
            )
        pred = grain_nn.apply_classifier(
            params, hp, s, src_gather=src_gather, node_gather=node_gather
        )
        z = pred["edge_event"]
        y = s.y_edge_event
        valid = (y > -1.0).astype(z.dtype) * s.jj_mask
        y01 = jnp.clip(y, 0.0, 1.0)
        per_edge = (
            hp.pos_weight * y01 * jax.nn.softplus(-z)
            + (1 - y01) * jax.nn.softplus(z)
        )
        den = jnp.maximum(jax.lax.psum(jnp.sum(valid), gp_axis), 1.0)
        return jnp.sum(per_edge * valid) / jax.lax.stop_gradient(den)

    def local_step(params, opt_state, batch):
        def local_loss(p):
            vals = jax.vmap(lambda s: per_sample_partial_loss(p, s))(batch)
            return jnp.mean(vals)

        lval, grads = jax.value_and_grad(local_loss)(params)
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.pmean(jax.lax.psum(g, gp_axis), dp_axis), grads
        )
        lval = jax.lax.pmean(jax.lax.psum(lval, gp_axis), dp_axis)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, lval

    specs = sample_specs(gp_axis)

    def add_dp(spec):
        return P(dp_axis, *spec)

    batch_specs = jax.tree_util.tree_map(
        add_dp, specs, is_leaf=lambda x: isinstance(x, P)
    )
    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P(), batch_specs),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)
