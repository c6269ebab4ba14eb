"""Column-sharded topology editor (SURVEY §2.8 / VERDICT r3 item 2).

The partitioned rollout previously replicated the topology editor: every
chip held the full edge arrays and paid the full O(E)-per-event edit cost.
This module shards the edge COO arrays by contiguous column blocks over
the mesh axis and runs one span's update as:

  1. DETECTION (sharded, O(E/D) per chip): switch candidates from the
     local logit block, two-sided ring counts by local scatter-add +
     psum, seed masks by local scatter-or + pmax;
  2. FOOTPRINT CLOSURE (sharded): the same hop expansion as
     editor_workset._closure, with an all-reduce (pmax) after every
     scatter-or sub-step so the replicated [NJ]/[NG] masks stay exact;
  3. WORKSET GATHER (collective, O(workset)): each shard compacts its
     selected columns; an all_gather + shard-major merge reproduces the
     global ascending column order editor_workset relies on;
  4. MINI EDIT (replicated, O(workset)): the unmodified
     topology_jit.update_jit on the gathered mini state — bounded
     budgets over W columns, identical on every chip;
  5. SCATTER-BACK (local): each shard rewrites its own columns from the
     mini result; appended reconnection columns land on the shard owning
     the global append cursor range.

Exactness: steps 1-3 compute exactly what editor_workset computes on one
device (asserted in tests/test_sharded_editor.py against the replicated
full-array editor on the real seed10020 graph and a larger synthetic).
There is no full-array fallback here — no chip holds the full arrays —
so workset capacity or a guard-shell hit surfaces as an `invalid` flag.
The size-up-and-rerun protocol is IMPLEMENTED by the composed driver
(parallel.partitioned_rollout.PartitionedRollout.step, round 5): each
retry doubles wq/wp and adds a closure round, the grown workset persists
for later spans, and only a workset beyond the padded edge capacity
raises (as an E_pp append bust) — tested with an injected overflow
(tests/test_partitioned_rollout.py).

Node arrays (xj, masks) stay replicated: they are O(N) against the edge
arrays' O(E)≈O(6N), the editor writes them directly, and the replicated
mini edit needs them whole — per-chip editor memory is O(N + E/D +
workset). Sharding the node axis belongs to the forward (the halo layer
stripes node tables spatially); inside the editor the node arrays are
the collectively-synchronized state the exactness argument rests on, so
a node-sharded editor would need editor_workset's closure proof
re-derived per stripe — deliberately out of scope, stated here rather
than implied.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..rollout import editor_workset as ew
from ..rollout import topology_jit as tj

NEG = -1e30


def _pmax_bool(m, axis):
    return jax.lax.pmax(m.astype(jnp.int32), axis).astype(bool)


def _closure_sharded(pp_l, pq_l, seed_j, seed_g, rounds, axis):
    """editor_workset._closure with an all-reduce after each scatter-or
    sub-step (same sub-step order, so the masks match bit-for-bit)."""
    live_q = (pq_l[0] >= 0) & (pq_l[1] >= 0)
    live_p = (pp_l[0] >= 0) & (pp_l[1] >= 0)
    qs = jnp.where(live_q, pq_l[0], 0)
    qd = jnp.where(live_q, pq_l[1], 0)
    pa = jnp.where(live_p, pp_l[0], 0)
    pb = jnp.where(live_p, pp_l[1], 0)

    fp_j, fp_g = seed_j, seed_g
    prev_j, prev_g = fp_j, fp_g
    for _ in range(rounds):
        prev_j, prev_g = fp_j, fp_g
        fp_g = _pmax_bool(
            ew._scatter_or(fp_g, qd, live_q & fp_j[qs]), axis)
        fp_j = _pmax_bool(
            ew._scatter_or(fp_j, qs, live_q & fp_g[qd]), axis)
        fp_j = _pmax_bool(
            ew._scatter_or(fp_j, pb, live_p & fp_j[pa]), axis)
    return fp_j, fp_g, fp_j & ~prev_j, fp_g & ~prev_g


def _gather_selected(sel_l, vals_l, block, cap, axis, fill):
    """Compact the selected local columns, all_gather, and merge in
    shard-major order (= global ascending column order). Returns
    (global_cols [cap], gathered_vals [v, cap], count, overflow).

    vals_l: [v, block] rows gathered alongside the column ids."""
    d = jax.lax.axis_index(axis)
    cols_l, n_l, _ = ew._compact_cols(sel_l, cap)
    safe = jnp.where(cols_l >= 0, cols_l, 0)
    vals_sel = jnp.where(cols_l[None, :] >= 0, vals_l[:, safe], fill)
    gcols_l = jnp.where(cols_l >= 0, cols_l + d * block, -1)

    all_cols = jax.lax.all_gather(gcols_l, axis)       # [D, cap]
    all_vals = jax.lax.all_gather(vals_sel, axis, axis=0)  # [D, v, cap]
    all_n = jax.lax.all_gather(n_l, axis)              # [D]
    D = all_cols.shape[0]
    total = all_n.sum()

    # shard-major flatten with per-shard live prefixes -> first `total`
    # slots of a [cap] buffer
    off = jnp.concatenate([jnp.zeros(1, all_n.dtype),
                           jnp.cumsum(all_n)[:-1]])
    lane = jnp.arange(cap, dtype=jnp.int32)
    pos = off[:, None] + lane[None, :]                 # [D, cap]
    okm = (lane[None, :] < all_n[:, None]) & (pos < cap)
    tgt = jnp.where(okm, pos, cap)
    out_cols = jnp.full(cap + 1, -1, jnp.int32).at[
        tgt.reshape(-1)].set(all_cols.reshape(-1), mode="drop")[:cap]
    v = all_vals.shape[1]
    out_vals = jnp.full((v, cap + 1), fill, all_vals.dtype).at[
        :, tgt.reshape(-1)
    ].set(all_vals.transpose(1, 0, 2).reshape(v, -1), mode="drop")[:, :cap]
    return out_cols, out_vals, total, total > cap


def make_sharded_editor(mesh: Mesh, axis: str = "gp", *, wq: int = 1024,
                        wp: int = 1024, rounds: int = 3,
                        max_switch: int = tj.MAX_SWITCH):
    """Returns f(E_pp, E_pq, logits, xj, y_joint, mask_g, mask_j, n_pp,
    grain_events, y_grain, threshold) -> (E_pp, E_pq, xj, mask_g, mask_j,
    n_pp, switching, extra, invalid) with E_pp/E_pq/logits sharded by
    columns over `axis` and everything else replicated.

    Column counts must be divisible by the axis size (pad with dead
    columns; keep the global LAST column dead — the fill-sentinel
    invariant)."""
    D = mesh.shape[axis]

    def f(E_pp, E_pq, logits, xj, y_joint, mask_g, mask_j, n_pp,
          grain_events, y_grain, threshold):
        NG = mask_g.shape[0]
        NJ = mask_j.shape[0]
        EP = E_pp.shape[1] * D   # global sizes (inputs here are blocks)
        EQ = E_pq.shape[1] * D
        bp, bq = E_pp.shape[1], E_pq.shape[1]
        d = jax.lax.axis_index(axis)

        # ---- 1. detection -------------------------------------------
        prob = jax.nn.sigmoid(logits)
        cand_l = (prob > threshold) & (E_pp[0] < E_pp[1]) & (E_pp[0] >= 0)
        seed_j = jnp.zeros(NJ, bool)
        seed_j = ew._scatter_or(
            seed_j, jnp.where(cand_l, E_pp[0], NJ), cand_l)
        seed_j = ew._scatter_or(
            seed_j, jnp.where(cand_l, E_pp[1], NJ), cand_l)
        seed_j = _pmax_bool(seed_j, axis)

        live_q = (E_pq[0] >= 0) & (E_pq[1] >= 0)
        counts = jax.lax.psum(
            jnp.zeros(NG, jnp.int32).at[
                jnp.where(live_q, E_pq[1], NG)
            ].add(1, mode="drop"), axis)
        ge_ok = grain_events >= 0
        seed_g = jnp.zeros(NG, bool)
        seed_g = ew._scatter_or(
            seed_g, jnp.where(ge_ok, grain_events, NG), ge_ok)
        seed_g = seed_g | ((counts > 0) & (counts <= 2))

        # ---- 2. closure ---------------------------------------------
        fp_j, fp_g, shell_j, shell_g = _closure_sharded(
            E_pp, E_pq, seed_j, seed_g, rounds, axis)

        # ---- 3. workset gather --------------------------------------
        qs = jnp.where(live_q, E_pq[0], 0)
        qd = jnp.where(live_q, E_pq[1], 0)
        sel_q = live_q & (fp_j[qs] | fp_g[qd])
        live_p = (E_pp[0] >= 0) & (E_pp[1] >= 0)
        pa = jnp.where(live_p, E_pp[0], 0)
        pb = jnp.where(live_p, E_pp[1], 0)
        sel_p = live_p & (fp_j[pa] | fp_j[pb])

        q_cols, q_vals, n_q, of_q = _gather_selected(
            sel_q, E_pq, bq, wq - 1, axis, -1)
        # joint ids and logits ride SEPARATE gathers: ids stay int32 the
        # whole way (a float32 round-trip is exact only below 2^24 — a
        # silent ceiling for exactly the edge counts this module exists
        # to scale past). Both calls compact the same sel_p mask, so the
        # two outputs stay column-aligned.
        p_cols, p_ids, n_p, of_p = _gather_selected(
            sel_p, E_pp, bp, wp, axis, -1)
        _, p_lg, _, _ = _gather_selected(
            sel_p, logits[None, :], bp, wp, axis, NEG)
        mini_p = p_ids
        mini_logits = p_lg[0]
        of_p = of_p | (n_p > wp - 128)

        tail_dead = jax.lax.pmax(
            jnp.where(d == D - 1,
                      ((E_pq[0, bq - 1] < 0) & (E_pp[0, bp - 1] < 0))
                      .astype(jnp.int32),
                      0), axis).astype(bool)
        invalid = of_q | of_p | ~tail_dead

        mini_q = jnp.full((2, wq), -1, jnp.int32).at[:, : wq - 1].set(
            q_vals.astype(jnp.int32))

        # ---- 4. replicated mini edit --------------------------------
        mini_state = tj.TopoState(
            E_pp=mini_p, E_pq=mini_q, xj=xj, y_joint=y_joint,
            mask_g=mask_g, mask_j=mask_j, append_ptr=n_p.astype(jnp.int32),
        )
        mst, switching, extra = tj.update_jit(
            mini_state, mini_logits, grain_events, y_grain, threshold,
            NG, max_switch=max_switch, cleanup_g_mask=fp_g)

        shell_hit = (
            (jnp.where(shell_j, mask_j != mst.mask_j, False)).any()
            | (jnp.where(shell_g, mask_g != mst.mask_g, False)).any()
            | (mst.append_ptr > wp)
        )
        invalid = invalid | shell_hit

        # ---- 5. local scatter-back ----------------------------------
        def localize(gcols, width):
            mine = (gcols >= d * width) & (gcols < (d + 1) * width)
            return jnp.where(mine, gcols - d * width, width)

        E_pq = E_pq.at[:, localize(q_cols, bq)].set(
            mst.E_pq[:, : wq - 1], mode="drop")
        E_pp = E_pp.at[:, localize(p_cols, bp)].set(
            mst.E_pp[:, : wp], mode="drop")

        # appended columns -> the shard(s) owning [n_pp, n_pp + n_app)
        n_app = mst.append_ptr - n_p.astype(jnp.int32)
        lanes = jnp.arange(wp, dtype=jnp.int32)
        src = jnp.where(lanes < n_app, n_p.astype(jnp.int32) + lanes, 0)
        app_vals = mst.E_pp[:, src]
        gtgt = jnp.where(lanes < n_app, n_pp + lanes, EP)
        E_pp = E_pp.at[:, localize(gtgt, bp)].set(app_vals, mode="drop")
        app_over = n_pp + n_app > EP
        n_pp_out = jnp.where(app_over, EP + 1, n_pp + n_app)

        return (E_pp, E_pq, mst.xj, mst.mask_g, mst.mask_j, n_pp_out,
                switching, extra, invalid | app_over)

    col = P(None, axis)
    rep = P()
    return shard_map(
        f, mesh=mesh,
        in_specs=(col, col, P(axis), rep, rep, rep, rep, rep, rep, rep,
                  rep),
        out_specs=(col, col, rep, rep, rep, rep, rep, rep, rep),
        check_vma=False,
    )


def pad_cols_to(arr, width, fill=-1):
    """Host helper: pad a [2, E] COO (or [E] vector) with dead columns to
    `width` (keeps the global last column dead for the fill-sentinel
    invariant)."""
    arr = np.asarray(arr)
    if arr.ndim == 1:
        out = np.full(width, fill, arr.dtype)
        out[: arr.shape[0]] = arr
        return out
    out = np.full((arr.shape[0], width), fill, arr.dtype)
    out[:, : arr.shape[1]] = arr
    return out
