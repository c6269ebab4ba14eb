"""Halo-exchange graph partitioning: spatial stripes + neighbor ppermute.

The all-gather partitioning (parallel.partition) moves every shard's node
table to every device: (D-1)/D of the graph per shard per conv. But the
grain graph is SPATIAL — interactions are short-ranged (jj/jg edge lengths
are bounded by the local grain size, ~0.11 of the 40um patch). Partitioning
nodes into D periodic stripes by x-coordinate, each destination node only
references sources in its own stripe or the two adjacent ones, so the
exchange reduces to two `ppermute`s of whole neighbor stripes per conv —
2/D of the graph per shard, riding nearest-neighbor ICI links instead of
the full ring.

Host-side `build_striped`: reorders nodes stripe-major, pads each stripe to
a common capacity, remaps every neighbor index into the extended
[left | local | right] table (3 * cap rows), and validates the
short-range assumption. Device-side `make_halo_forward`: the standard model
with `src_gather`/`node_gather` hooks materializing the extended tables by
neighbor ppermute + concat inside shard_map.

Verified equal to the single-device forward on the real seed10020 graph
(tests/test_halo.py).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..graph import schema, state
from ..models import grain_nn
from ..models.hyper import HyperParams


class StripeMeta:
    """Permutations and capacities of one striped layout."""

    def __init__(self, D, grain_perm, joint_perm, grain_cap, joint_cap, jj_cap):
        self.D = D
        self.grain_perm = grain_perm  # new order -> old index, stripe-major
        self.joint_perm = joint_perm
        self.grain_cap = grain_cap    # rows per stripe (padded)
        self.joint_cap = joint_cap
        self.jj_cap = jj_cap

    def scatter_back(self, stacked, kind: str):
        """[D*cap, ...] stripe-major output -> original node order (live rows
        are the first len(stripe) of each stripe block)."""
        cap = self.grain_cap if kind == "grain" else self.joint_cap
        perm = self.grain_perm if kind == "grain" else self.joint_perm
        flat = np.asarray(stacked).reshape(self.D * cap, *np.asarray(stacked).shape[2:]) \
            if np.asarray(stacked).ndim > 2 else np.asarray(stacked).reshape(self.D * cap, -1)
        out = np.zeros((len(perm),) + flat.shape[1:], flat.dtype)
        pos = 0
        for s in range(self.D):
            n = self.stripe_sizes[kind][s]
            out[perm[pos : pos + n]] = flat[s * cap : s * cap + n]
            pos += n
        return out

    def scatter_back_jj(self, stacked):
        """Per-stripe edge output (shard_map returns the stripe axis
        flattened: [D*jj_cap, ...]) -> original live jj-edge order (the
        classifier's edge_event layout the editor thresholds)."""
        arr = np.asarray(stacked)
        arr = arr.reshape((self.D, self.jj_cap) + arr.shape[1:]) \
            if arr.shape[0] != self.D else arr
        return arr[self.jj_map[:, 0], self.jj_map[:, 1]]


def _stripe_of(xcoord, D):
    return np.clip((np.asarray(xcoord) % 1.0 * D).astype(int), 0, D - 1)


def build_striped(
    feature_dicts: Dict[str, np.ndarray],
    edge_index_dicts: Dict[tuple, np.ndarray],
    edge_weight_dicts: Dict[tuple, np.ndarray],
    mask_dicts: Dict[str, np.ndarray],
    D: int,
    target_dicts: Dict[str, np.ndarray] | None = None,
    *,
    grain_cap: int | None = None,
    joint_cap: int | None = None,
    jj_cap: int | None = None,
    stripe_x: Dict[str, np.ndarray] | None = None,
) -> Tuple[state.GraphSample, StripeMeta]:
    """Stripe-major GraphSample with leading shard dim D. Neighbor indices
    are remapped into the extended [left|local|right] source table.
    `target_dicts` (same keys as state.build_sample: grain/joint/grain_event
    node targets, edge_event labels on live jj edges in edge-list order)
    are striped alongside the features so the sample is trainable.

    `stripe_x` ({"grain": [NG], "joint": [NJ]}) overrides the coordinate
    used for stripe ASSIGNMENT only (features are untouched). Under patch
    rescaling (test.py:29-55) the feature x lives on the SCALED torus,
    whose interaction range is the 40 um patch's (~0.14) regardless of
    the physical domain — capping D at ~4. Striping by the PHYSICAL
    coordinate ((scaled + offset)/domain_factor) restores edge lengths
    ~0.14/factor, so D scales with domain size; any partition works for
    correctness as long as every edge spans adjacent stripes (the
    builder still validates that loudly)."""
    gx = np.asarray(feature_dicts["grain"], np.float32)
    jx = np.asarray(feature_dicts["joint"], np.float32)
    gmask = np.asarray(mask_dicts["grain"], np.float32).reshape(-1)
    jmask = np.asarray(mask_dicts["joint"], np.float32).reshape(-1)

    sx = stripe_x or {}
    g_stripe = _stripe_of(np.asarray(sx.get("grain", gx[:, 0])), D)
    j_stripe = _stripe_of(np.asarray(sx.get("joint", jx[:, 0])), D)
    g_order = np.argsort(g_stripe, kind="stable")
    j_order = np.argsort(j_stripe, kind="stable")
    g_sizes = [int((g_stripe == s).sum()) for s in range(D)]
    j_sizes = [int((j_stripe == s).sum()) for s in range(D)]
    g_cap = grain_cap or state.round_up(max(g_sizes), 8)
    j_cap = joint_cap or state.round_up(max(j_sizes), 8)
    if g_cap < max(g_sizes) or j_cap < max(j_sizes):
        raise ValueError("stripe capacity smaller than the largest stripe")

    # old index -> (stripe, slot)
    g_slot = np.zeros(len(gx), int)
    j_slot = np.zeros(len(jx), int)
    pos = 0
    for s in range(D):
        n = g_sizes[s]
        g_slot[g_order[pos : pos + n]] = np.arange(n)
        pos += n
    pos = 0
    for s in range(D):
        n = j_sizes[s]
        j_slot[j_order[pos : pos + n]] = np.arange(n)
        pos += n

    def ext_index(src_old, src_type, dst_stripe):
        """Index of a source node in the destination stripe's extended
        table [left | local | right] (3 * cap rows)."""
        stripe = (g_stripe if src_type == "grain" else j_stripe)[src_old]
        slot = (g_slot if src_type == "grain" else j_slot)[src_old]
        cap = g_cap if src_type == "grain" else j_cap
        rel = (stripe - dst_stripe) % D
        if rel == 0:
            return cap + slot
        if rel == D - 1:   # left neighbor
            return slot
        if rel == 1:       # right neighbor
            return 2 * cap + slot
        raise ValueError(
            f"edge spans non-adjacent stripes ({stripe} -> {dst_stripe}); "
            f"use fewer stripes (stripe width must exceed the interaction range)"
        )

    # per-stripe padded node tables
    def stack_nodes(xarr, mask, order, sizes, cap):
        out = np.zeros((D, cap, xarr.shape[1]), np.float32)
        m = np.zeros((D, cap), np.float32)
        pos = 0
        for s in range(D):
            n = sizes[s]
            out[s, :n] = xarr[order[pos : pos + n]]
            m[s, :n] = mask[order[pos : pos + n]]
            pos += n
        return out, m

    gx_s, gm_s = stack_nodes(gx, gmask, g_order, g_sizes, g_cap)
    jx_s, jm_s = stack_nodes(jx, jmask, j_order, j_sizes, j_cap)

    # per-stripe ELL tables with extended-space neighbor ids
    push_t, pull_t, connect_t = schema.EDGE_TYPES

    def ell(et, src_type, dst_type, max_deg):
        e = np.asarray(edge_index_dicts[et])
        w = np.asarray(edge_weight_dicts[et], np.float32).reshape(-1)
        dst_cap = j_cap if dst_type == "joint" else g_cap
        nbr = np.zeros((D, dst_cap, max_deg), np.int32)
        length = np.zeros((D, dst_cap, max_deg), np.float32)
        mask = np.zeros((D, dst_cap, max_deg), np.float32)
        fill = np.zeros((D, dst_cap), int)
        d_stripe = j_stripe if dst_type == "joint" else g_stripe
        d_slot = j_slot if dst_type == "joint" else g_slot
        for (s_old, d_old), wv in zip(e.T, w):
            if s_old < 0 or d_old < 0:
                continue
            st = d_stripe[d_old]
            sl = d_slot[d_old]
            k = fill[st, sl]
            nbr[st, sl, k] = ext_index(s_old, src_type, st)
            length[st, sl, k] = wv
            mask[st, sl, k] = 1.0
            fill[st, sl] += 1
        return nbr, length, mask

    push_nbr, push_len, push_mask = ell(push_t, "grain", "joint", schema.JG_DEGREE)
    conn_nbr, conn_len, conn_mask = ell(connect_t, "joint", "joint", schema.JJ_DEGREE)
    pull_nbr, pull_len, pull_mask = ell(
        pull_t, "joint", "grain", schema.DEFAULT_GRAIN_RING
    )

    # jj COO sharded by dst stripe, endpoints in extended joint space;
    # per-edge labels (live-edge order, graph_datastruct.py:898) ride along
    tg = target_dicts or {}
    ev_lab = np.asarray(tg.get("edge_event", ()), np.float32).reshape(-1)
    e = np.asarray(edge_index_dicts[connect_t])
    w = np.asarray(edge_weight_dicts[connect_t], np.float32).reshape(-1)
    per_stripe_edges = [[] for _ in range(D)]
    jj_map = []   # original live-edge order -> (stripe, slot)
    live_i = 0
    for (s_old, d_old), wv in zip(e.T, w):
        if s_old < 0 or d_old < 0:
            continue
        lab = ev_lab[live_i] if live_i < len(ev_lab) else schema.EDGE_EVENT_INVALID
        live_i += 1
        st = j_stripe[d_old]
        jj_map.append((st, len(per_stripe_edges[st])))
        per_stripe_edges[st].append(
            (ext_index(s_old, "joint", st), ext_index(d_old, "joint", st), wv, lab)
        )
    jj_need = max(len(p) for p in per_stripe_edges)
    jj_cap = jj_cap or state.round_up(jj_need, 8)
    if jj_cap < jj_need:
        raise ValueError("jj stripe capacity smaller than the largest stripe")
    jj_src = np.zeros((D, jj_cap), np.int32)
    jj_dst = np.zeros((D, jj_cap), np.int32)
    jj_len = np.zeros((D, jj_cap), np.float32)
    jj_mask = np.zeros((D, jj_cap), np.float32)
    y_ee = np.full((D, jj_cap), float(schema.EDGE_EVENT_INVALID), np.float32)
    for s, rows in enumerate(per_stripe_edges):
        for k, (a, b, wv, lab) in enumerate(rows):
            jj_src[s, k] = a
            jj_dst[s, k] = b
            jj_len[s, k] = wv
            jj_mask[s, k] = 1.0
            y_ee[s, k] = lab

    def stripe_targets(key, order, sizes, cap, width):
        arr = np.asarray(tg.get(key, ()), np.float32)
        out = np.zeros((D, cap, width), np.float32) if width > 1 else np.zeros(
            (D, cap), np.float32
        )
        if arr.size == 0:
            return out
        arr = arr.reshape(len(order), -1) if width > 1 else arr.reshape(-1)
        pos = 0
        for s in range(D):
            n = sizes[s]
            out[s, :n] = arr[order[pos : pos + n]]
            pos += n
        return out

    y_grain = stripe_targets("grain", g_order, g_sizes, g_cap, 2)
    y_joint = stripe_targets("joint", j_order, j_sizes, j_cap, 2)
    y_gev = stripe_targets("grain_event", g_order, g_sizes, g_cap, 1)

    zeros = lambda *shape: np.zeros(shape, np.float32)
    sample = state.GraphSample(
        grain_x=jnp.asarray(gx_s), joint_x=jnp.asarray(jx_s),
        grain_mask=jnp.asarray(gm_s), joint_mask=jnp.asarray(jm_s),
        push_nbr=jnp.asarray(push_nbr), push_len=jnp.asarray(push_len),
        push_mask=jnp.asarray(push_mask),
        connect_nbr=jnp.asarray(conn_nbr), connect_len=jnp.asarray(conn_len),
        connect_mask=jnp.asarray(conn_mask),
        pull_nbr=jnp.asarray(pull_nbr), pull_len=jnp.asarray(pull_len),
        pull_mask=jnp.asarray(pull_mask),
        jj_src=jnp.asarray(jj_src), jj_dst=jnp.asarray(jj_dst),
        jj_len=jnp.asarray(jj_len), jj_mask=jnp.asarray(jj_mask),
        y_grain=jnp.asarray(y_grain),
        y_joint=jnp.asarray(y_joint),
        y_edge_event=jnp.asarray(y_ee),
        y_grain_event=jnp.asarray(y_gev),
        y_edge=jnp.asarray(zeros(D, jj_cap)),
        y_edge_mask=jnp.asarray(zeros(D, jj_cap)),
        # per-shard copies so every field has a leading D dim for shard_map
        n_grain_rows=jnp.full((D,), float(len(gx)), jnp.float32),
        n_joint_rows=jnp.full((D,), float(len(jx)), jnp.float32),
        n_jj_rows=jnp.full((D,), float((w > -1).sum()), jnp.float32),
    )
    meta = StripeMeta(D, g_order, j_order, g_cap, j_cap, jj_cap)
    meta.stripe_sizes = {"grain": g_sizes, "joint": j_sizes}
    meta.jj_map = np.asarray(jj_map, np.int64).reshape(-1, 2)
    return sample, meta


def make_halo_forward(
    hp: HyperParams, mesh: Mesh, model: str = "regressor", axis: str = "gp"
):
    """Forward over the striped layout: source tables materialize as
    [left | local | right] via two neighbor ppermutes per conv."""
    D = mesh.shape[axis]
    fwd_perm = [(i, (i + 1) % D) for i in range(D)]   # send right
    bwd_perm = [(i, (i - 1) % D) for i in range(D)]   # send left

    def extend(xloc):
        from_left = jax.lax.ppermute(xloc, axis, fwd_perm)
        from_right = jax.lax.ppermute(xloc, axis, bwd_perm)
        return jnp.concatenate([from_left, xloc, from_right], axis=0)

    def src_gather(xg, xj):
        return extend(xg), extend(xj)

    def node_gather(h):
        return extend(h)

    apply = (
        grain_nn.apply_regressor if model == "regressor" else grain_nn.apply_classifier
    )

    def local_fn(params, sample):
        sample = jax.tree_util.tree_map(lambda a: a[0], sample)  # drop shard dim
        return apply(params, hp, sample, src_gather=src_gather,
                     node_gather=node_gather)

    if model == "regressor":
        out_specs = {"joint": P(axis, None), "grain": P(axis, None),
                     "grain_area": P(axis)}
        if hp.edge_len:
            out_specs["edge"] = P(axis)
    else:
        out_specs = {"edge_event": P(axis), "edge": P(axis, None)}

    import dataclasses

    n_fields = len(dataclasses.fields(state.GraphSample))
    specs = state.GraphSample(*([P(axis)] * n_fields))
    sharded = shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), specs), out_specs=out_specs, check_vma=False,
    )
    return jax.jit(sharded)


def make_halo_train_step(hp: HyperParams, tx, mesh: Mesh, axis: str = "gp"):
    """Training step over one halo-striped graph (counterpart of
    partition.make_partitioned_train_step): each stripe computes its local
    masked loss term with [left|local|right] source tables built by two
    neighbor ppermutes, loss terms psum over the stripe axis, and the
    replicated-param gradients psum in the same way. The ppermute
    transposes itself in reverse mode, so boundary-node gradients flow back
    to the owning stripe."""
    import dataclasses

    import optax

    from ..train import loss as loss_mod

    D = mesh.shape[axis]
    fwd_perm = [(i, (i + 1) % D) for i in range(D)]
    bwd_perm = [(i, (i - 1) % D) for i in range(D)]

    def extend(xloc):
        from_left = jax.lax.ppermute(xloc, axis, fwd_perm)
        from_right = jax.lax.ppermute(xloc, axis, bwd_perm)
        return jnp.concatenate([from_left, xloc, from_right], axis=0)

    def src_gather(xg, xj):
        return extend(xg), extend(xj)

    def local_partial_loss(params, s):
        """This shard's additive term of the global loss. No psum inside the
        differentiated function: loss terms and gradients are both summed
        once, outside (a psum inside grad replicates cotangents across
        shards, and a second psum of the grads then overcounts by D)."""
        if hp.model_type == "regressor":
            pred = grain_nn.apply_regressor(
                params, hp, s, src_gather=src_gather, node_gather=extend
            )
            jm = s.joint_mask[:, None]
            gm = s.grain_mask[:, None]
            j_sq = jnp.sum(jm * (s.y_joint - pred["joint"]) ** 2)
            g_sq = jnp.sum(gm * (s.y_grain - pred["grain"]) ** 2)
            return 100.0 * (
                j_sq / (s.n_joint_rows * 2.0) + g_sq / (s.n_grain_rows * 2.0)
            )
        pred = grain_nn.apply_classifier(
            params, hp, s, src_gather=src_gather, node_gather=extend
        )
        z = pred["edge_event"]
        y = s.y_edge_event
        valid = (y > -1.0).astype(z.dtype) * s.jj_mask
        y01 = jnp.clip(y, 0.0, 1.0)
        per_edge = (
            hp.pos_weight * y01 * jax.nn.softplus(-z)
            + (1.0 - y01) * jax.nn.softplus(z)
        )
        # global valid count is gradient-free (labels/masks only)
        den = jnp.maximum(jax.lax.psum(jnp.sum(valid), axis), 1.0)
        return jnp.sum(per_edge * valid) / jax.lax.stop_gradient(den)

    def local_step(params, opt_state, sample):
        sample = jax.tree_util.tree_map(lambda a: a[0], sample)
        lval, grads = jax.value_and_grad(local_partial_loss)(params, sample)
        lval = jax.lax.psum(lval, axis)
        grads = jax.tree_util.tree_map(lambda g: jax.lax.psum(g, axis), grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, lval

    n_fields = len(dataclasses.fields(state.GraphSample))
    specs = state.GraphSample(*([P(axis)] * n_fields))
    sharded = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(), specs), out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_halo_span_forward(hp_r: HyperParams, hp_c: HyperParams, mesh: Mesh,
                           axis: str = "gp"):
    """Rollout-span forward over halo stripes (VERDICT round-2 item 5: the
    multi-chip ROLLOUT leg). Returns f(params_r, params_c, features,
    edge_index, edge_weight, mask, D) -> pred dict in the rollout engine's
    host layout (original node/edge order), computed with both model
    forwards partitioned over the mesh; the topology editor then runs
    replicated on host exactly as in the single-device rollout — stripes
    are rebuilt from the moved positions each span."""
    fwd_r = make_halo_forward(hp_r, mesh, model="regressor", axis=axis)
    fwd_c = make_halo_forward(hp_c, mesh, model="classifier", axis=axis)

    def span_forward(params_r, params_c, features, edge_index, edge_weight,
                     mask, D, caps=None, stripe_x=None):
        # `caps` pins the stripe capacities (grain_cap/joint_cap/jj_cap)
        # across spans so the sharded forward compiles once per rollout
        # instead of once per span-shape (stripe populations drift as the
        # microstructure coarsens)
        striped, meta = build_striped(
            features, edge_index, edge_weight, mask, D,
            stripe_x=stripe_x, **(caps or {}))
        y_r = fwd_r(params_r, striped)
        y_c = fwd_c(params_c, striped)
        ng = len(np.asarray(features["grain"]))
        nj = len(np.asarray(features["joint"]))
        pred = {
            "joint": meta.scatter_back(np.asarray(y_r["joint"]), "joint")[:nj],
            "grain": meta.scatter_back(np.asarray(y_r["grain"]), "grain")[:ng],
            "grain_area": meta.scatter_back(
                np.asarray(y_r["grain_area"]), "grain")[:ng].reshape(-1),
            "edge_event": meta.scatter_back_jj(
                np.asarray(y_c["edge_event"])).reshape(-1),
            "edge": meta.scatter_back_jj(np.asarray(y_c["edge"])),
        }
        return pred

    return span_forward
