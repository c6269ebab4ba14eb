"""jit-compatible dynamic-topology editor (device-side).

The reference's classifier update is sequential, order-dependent Python
index surgery (models.py:614-1053). This module expresses the same
semantics as fixed-shape jax code so the whole rollout step can stay on
device:

  * events are processed by `lax.scan` over bounded budgets
    (MAX_SWITCH / MAX_ELIM) in the reference's priority order;
  * neighbor queries become `jnp.nonzero(..., size=k)` with the exact
    degree bounds (3 jj / 3 jg per junction, ring <= RING_MAX per grain);
  * edge deletion marks -1 sentinels; the reconnection edge is APPENDED at
    a carried cursor into preallocated slack columns, preserving the
    reference's index semantics for pending events;
  * nucleation (array growth) stays host-side.

Semantics are oracle-tested against rollout/topology.TopologyEditor on the
real seed10020 graph (tests/test_topology_jit.py).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

JOINT_SCALE = 5.0
RING_MAX = 16
# L1 switch pass executor: waves of conflict-free events vs one-at-a-time.
# Measured on TPU (saturated 24-switch steps, artifacts/STEP_BREAKDOWN.json
# workload): sequential 14.3 ms/step at 120 um vs waved 19.3 — a saturated
# budget chains into one conflict component, so waves degenerate to the
# sequential order plus scheduling overhead. The waved executor stays
# available (oracle-tested vs sequential) for sparse-event workloads.
# Flag consumed at trace time.
USE_WAVED = False


class TopoState(NamedTuple):
    E_pp: jnp.ndarray    # [2, EP] int32, -1 sentinels; slack columns at tail
    E_pq: jnp.ndarray    # [2, EQ] int32
    xj: jnp.ndarray      # [NJ, F] joint features (cols 0:2 pos, 6:8 grads)
    y_joint: jnp.ndarray  # [NJ, 2] predicted joint displacement
    mask_g: jnp.ndarray  # [NG]
    mask_j: jnp.ndarray  # [NJ]
    append_ptr: jnp.ndarray  # scalar int32: next free E_pp column
    # moving-meltpool active window (models.py:641-648,912): joints outside
    # the window neither switch nor participate in eliminations. None = all
    # active (nucleation-free static path — the common case).
    active_j: jnp.ndarray | None = None
    # next free E_pq column (nucleation appends 9 jg edges per event);
    # None when the state has no E_pq slack columns.
    q_ptr: jnp.ndarray | None = None


def _wrap(p, pc):
    rel = p - pc
    return p - 1.0 * (rel > 0.5) + 1.0 * (rel < -0.5)


def _nonzero(cond, size, fill):
    """First `size` indices where cond holds, ascending, `fill` beyond.

    Same contract as jnp.nonzero(cond, size=size, fill_value=fill), but via
    top_k over negated indices: XLA lowers nonzero's cumsum to a
    quadratic reduce_window on TPU (measured 1.67 s for a [120, 6400]
    vmapped query vs 0.6 ms for top_k — 2900x)."""
    n = cond.shape[0]
    key = jnp.where(cond, -jnp.arange(n, dtype=jnp.int32), jnp.int32(-(2**30)))
    v, _ = jax.lax.top_k(key, size)
    return jnp.where(v > -(2**30), -v, fill).astype(jnp.int32)


def _point_in_triangle(t, v1, v2, v3):
    def move(v):
        return _wrap(v, t)

    def sign(a, b, c):
        return (a[0] - c[0]) * (b[1] - c[1]) - (b[0] - c[0]) * (a[1] - c[1])

    v1m, v2m, v3m = move(v1), move(v2), move(v3)
    d1 = sign(t, v1m, v2m)
    d2 = sign(t, v2m, v3m)
    d3 = sign(t, v3m, v1m)
    has_neg = (d1 < 0) | (d2 < 0) | (d3 < 0)
    has_pos = (d1 > 0) | (d2 > 0) | (d3 > 0)
    return ~(has_neg & has_pos)


class SwitchPlan(NamedTuple):
    """Write plan of one neighbor-switching event, computed read-only by
    _switch_plan so events in the same conflict-free wave can be planned in
    one vmapped launch and applied with merged scatters."""
    valid: jnp.ndarray
    p1s: jnp.ndarray
    p2s: jnp.ndarray
    xj_rows: jnp.ndarray    # [2] rows for the midpoint write (NJ = dropped)
    new_pos: jnp.ndarray    # [2, 2]
    q_cols: jnp.ndarray     # [2] E_pq row-1 columns (EQ = dropped)
    q_vals: jnp.ndarray     # [2]
    p_cols: jnp.ndarray     # [2] E_pp row-0 columns (EP = dropped)
    p_vals: jnp.ndarray     # [2]
    sq1_p2_f: jnp.ndarray   # masked row-1 rewrite keys (applied post p_cols)
    sq2_p1_f: jnp.ndarray
    force: jnp.ndarray      # [2] forced-elimination grains (-1 fills)


def _switch_plan(state: TopoState, e, events, pos, n_events, elim_grain):
    """Read-only body of one neighbor-switching event
    (models.switching_edge_index per-index chain, :910-1045).

    The event chain is inherently sequential (each edit feeds the next
    query), so wall-clock is bounded by op-launch latency, not FLOPs —
    independent neighbor queries are batched into single vmapped launches
    and full-array `where` copies into drop-mode scatters."""
    E_pp, E_pq, xj = state.E_pp, state.E_pq, state.xj
    EP = E_pp.shape[1]
    EQ = E_pq.shape[1]
    NJ = xj.shape[0]
    p1 = E_pp[0, e]
    p2 = E_pp[1, e]
    valid = (e >= 0) & (p1 >= 0) & (p2 >= 0)
    # guard values so gathers stay in range when invalid
    p1s = jnp.where(valid, p1, 0)
    p2s = jnp.where(valid, p2, 0)
    if state.active_j is not None:
        # meltpool window: skip switches touching an inactive joint
        # (topology.TopologyEditor._switch_edges:231)
        valid = valid & state.active_j[p1s] & state.active_j[p2s]

    # grain rings of both endpoints — one batched query
    qn_cond = E_pq[0][None, :] == jnp.stack([p1s, p2s])[:, None]   # [2, EQ]
    qn_idx = jax.vmap(lambda c: _nonzero(c, 3, EQ - 1))(qn_cond)
    p1_qn_idx, p2_qn_idx = qn_idx[0], qn_idx[1]
    p1_qn = E_pq[1][p1_qn_idx]
    p2_qn = E_pq[1][p2_qn_idx]

    # other joint neighbors of both endpoints — one batched query
    pn_cond = jnp.stack([
        (E_pp[0] == p1s) & (E_pp[1] != p2s),
        (E_pp[0] == p2s) & (E_pp[1] != p1s),
    ])
    pn_idx2 = jax.vmap(lambda c: _nonzero(c, 2, EP - 1))(pn_cond)  # [2, 2]

    in_p2 = (p1_qn[:, None] == p2_qn[None, :]).any(axis=1)  # [3]
    in_p1 = (p2_qn[:, None] == p1_qn[None, :]).any(axis=1)
    ok_shape = (in_p2.sum() == 2) & ((~in_p2).sum() == 1) & ((~in_p1).sum() == 1)
    valid = valid & ok_shape

    # shrink pair in p1_qn order (reference keeps p1_qn's order); the three
    # width-3 index queries share one launch
    small = jnp.stack([in_p2, ~in_p2, ~in_p1])
    sm_idx = jax.vmap(lambda c: _nonzero(c, 2, 0))(small)    # [3, 2]
    shared_idx = sm_idx[0]
    shrink_q1 = p1_qn[shared_idx[0]]
    shrink_q2 = p1_qn[shared_idx[1]]
    expand_q1 = p1_qn[sm_idx[1, 0]]
    expand_q2 = p2_qn[sm_idx[2, 0]]

    # qn index sort: [idx of shrink_q1, idx of shrink_q2] per endpoint.
    # For p1 the first occurrence of shrink_q* IS shared_idx (shrink values
    # are defined from it); for p2 argmax gives the first match (0 when
    # absent, matching the fill-0 lookup it replaces).
    p1_qn_sort = p1_qn_idx[shared_idx]
    pos2 = jnp.argmax(
        p2_qn[None, :] == jnp.stack([shrink_q1, shrink_q2])[:, None], axis=1
    )
    p2_qn_sort = p2_qn_idx[pos2]

    # joint-neighbor ordering: index 0 borders shrink_q1 — one batched reduce
    first_np = E_pp[1][pn_idx2[:, 0]]                        # [2]
    borders = (
        (E_pq[0][None, :] == first_np[:, None]) & (E_pq[1][None, :] == shrink_q1)
    ).any(axis=1)
    p1_pn_idx = jnp.where(borders[0], pn_idx2[0], pn_idx2[0, ::-1])
    p2_pn_idx = jnp.where(borders[1], pn_idx2[1], pn_idx2[1, ::-1])
    sq1_p1 = E_pp[1][p1_pn_idx[0]]
    sq2_p1 = E_pp[1][p1_pn_idx[1]]
    sq1_p2 = E_pp[1][p2_pn_idx[0]]
    sq2_p2 = E_pp[1][p2_pn_idx[1]]

    has_elim = elim_grain >= 0
    degenerate = (sq1_p1 == sq1_p2) | (sq2_p1 == sq2_p2)
    valid = valid & (has_elim | ~degenerate)

    force1 = jnp.where(
        valid & (sq1_p1 == sq1_p2) & (shrink_q1 != elim_grain), shrink_q1, -1
    )
    force2 = jnp.where(
        valid & (sq2_p1 == sq2_p2) & (shrink_q2 != elim_grain), shrink_q2, -1
    )

    # periodic midpoint reposition (:985-992) — one scatter, invalid dropped
    x_p1 = xj[p1s, :2]
    x_p2 = xj[p2s, :2]
    x_p2_m = _wrap(x_p2, x_p1)
    c = 0.5 * (x_p1 + x_p2_m)
    new_pos = jnp.stack([c, _wrap(c, x_p2)])
    xj_rows = jnp.where(valid, jnp.stack([p1s, p2s]), NJ)

    # The reference's orientation test (models.py:1000-1002) calls
    # point_in_triangle(x[p2], x[p1], ...) AFTER both points were set to the
    # same periodic midpoint — the "triangle" always has the query point
    # coinciding with vertex 1, making two of the three sign terms exactly
    # zero in non-FMA arithmetic, so the test degenerates to constant True.
    # (XLA's FMA contraction perturbs those exact zeros, which is how this
    # was discovered — see tests/test_topology_jit.py.) The effective
    # semantics are: swap unless the lookahead overrides.
    swap = jnp.asarray(True)

    # lookahead over remaining events (:1005-1013) — one batched reduce
    remaining = (jnp.arange(events.shape[0]) >= pos) & (
        jnp.arange(events.shape[0]) < n_events
    ) & (events >= 0)
    ev_safe = jnp.where(events >= 0, events, 0)
    nxt_a = jnp.where(remaining, E_pp[0, ev_safe], -2)
    nxt_b = jnp.where(remaining, E_pp[1, ev_safe], -2)

    vals = jnp.stack([sq1_p2, sq2_p2, sq1_p1, sq2_p1])
    hit = (
        (nxt_a[None, :] == vals[:, None]) | (nxt_b[None, :] == vals[:, None])
    ).any(axis=1)
    swap = jnp.where(hit[0] & ~hit[1], False, swap)
    swap = jnp.where(hit[1] & ~hit[0], True, swap)
    swap = jnp.where(hit[2] & ~hit[3], True, swap)
    swap = jnp.where(hit[3] & ~hit[2], False, swap)

    p1_qn_sort = jnp.where(swap, p1_qn_sort[::-1], p1_qn_sort)
    p2_qn_sort = jnp.where(swap, p2_qn_sort[::-1], p2_qn_sort)
    p1_pn_idx = jnp.where(swap, p1_pn_idx[::-1], p1_pn_idx)
    p2_pn_idx = jnp.where(swap, p2_pn_idx[::-1], p2_pn_idx)
    sq1_p2_f = jnp.where(swap, sq2_p2, sq1_p2)
    sq2_p1_f = jnp.where(swap, sq1_p1, sq2_p1)

    # rewires (:1030-1044), deferred to the apply step
    q_cols = jnp.where(valid, jnp.stack([p1_qn_sort[1], p2_qn_sort[0]]), EQ)
    p_cols = jnp.where(valid, jnp.stack([p1_pn_idx[1], p2_pn_idx[0]]), EP)
    return SwitchPlan(
        valid=valid, p1s=p1s, p2s=p2s,
        xj_rows=xj_rows, new_pos=new_pos,
        q_cols=q_cols, q_vals=jnp.stack([expand_q2, expand_q1]),
        p_cols=p_cols, p_vals=jnp.stack([p2s, p1s]),
        sq1_p2_f=sq1_p2_f, sq2_p1_f=sq2_p1_f,
        force=jnp.stack([force1, force2]),
    )


def _switch_apply_one(state: TopoState, plan: SwitchPlan):
    """Apply one event's write plan (write order matches the reference:
    midpoint move, jg rewires, jj row-0 rewires, then the two masked row-1
    rewrites — the second mask must see the first rewrite)."""
    xj = state.xj.at[plan.xj_rows, :2].set(plan.new_pos, mode="drop")
    E_pq = state.E_pq.at[1, plan.q_cols].set(plan.q_vals, mode="drop")
    E_pp = state.E_pp.at[0, plan.p_cols].set(plan.p_vals, mode="drop")
    row1 = E_pp[1]
    m1 = (E_pp[0] == plan.sq1_p2_f) & (row1 == plan.p2s)
    row1 = jnp.where(plan.valid & m1, plan.p1s, row1)
    m2 = (E_pp[0] == plan.sq2_p1_f) & (row1 == plan.p1s)
    row1 = jnp.where(plan.valid & m2, plan.p2s, row1)
    E_pp = jnp.stack([E_pp[0], row1])
    return state._replace(E_pp=E_pp, E_pq=E_pq, xj=xj)


def _switch_one(state: TopoState, e, events, pos, n_events, elim_grain):
    """One neighbor-switching event (models.switching_edge_index per-index
    body, :910-1045). Returns (state, force_elim_pair [2] with -1 fills)."""
    plan = _switch_plan(state, e, events, pos, n_events, elim_grain)
    return _switch_apply_one(state, plan), plan.force


def switch_events(state: TopoState, events: jnp.ndarray, n_events, elim_grain):
    """models.switching_edge_index (:901-1053): rollback the predicted
    displacement for every touched vertex, process events in order, rewrite
    displacements/grads. events: [MAX] edge indices (-1 padded)."""
    EP = state.E_pp.shape[1]
    ev_safe = jnp.where(events >= 0, events, 0)
    ev_valid = (events >= 0) & (jnp.arange(events.shape[0]) < n_events)
    va = jnp.where(ev_valid, state.E_pp[0, ev_safe], -1)
    vb = jnp.where(ev_valid, state.E_pp[1, ev_safe], -1)
    NJ = state.xj.shape[0]
    touched = jnp.zeros(NJ, bool)
    touched = touched.at[jnp.where(va >= 0, va, NJ)].set(True, mode="drop")
    touched = touched.at[jnp.where(vb >= 0, vb, NJ)].set(True, mode="drop")

    xj = state.xj
    xj = xj.at[:, :2].add(
        jnp.where(touched[:, None], -state.y_joint / JOINT_SCALE, 0.0)
    )
    state = state._replace(xj=xj)

    # dynamic-trip loop over the live prefix: padded slots are never
    # iterated at all (events are compacted to the front by every caller;
    # a stray -1 inside the prefix is still skipped by _switch_plan's
    # validity mask)
    MAXE = events.shape[0]
    forces0 = jnp.full((MAXE, 2), -1, jnp.int32)

    def body(carry):
        st, forces, i = carry
        st, force = _switch_one(st, events[i], events, i, n_events, elim_grain)
        return st, forces.at[i].set(force), i + 1

    n_trip = jnp.minimum(jnp.asarray(n_events, jnp.int32), MAXE)
    state, forces, _ = jax.lax.while_loop(
        lambda c: c[2] < n_trip, body,
        (state, forces0, jnp.asarray(0, jnp.int32)),
    )

    # displacement/grad rewrite (:1048-1050): the reference's save_prev is a
    # torch VIEW of the mutated row, so scale*(x - save_prev) is identically
    # ZERO — touched junctions leave with y == 0 and zeroed grad features
    # (see rollout.topology._switch_edges and scripts/ab_stepwise.py)
    new_y = jnp.where(touched[:, None], 0.0, state.y_joint)
    xj = state.xj
    xj = xj.at[:, 6:8].set(jnp.where(touched[:, None], 0.0, xj[:, 6:8]))
    return state._replace(xj=xj, y_joint=new_y), forces.reshape(-1)


def _switch_apply_wave(state: TopoState, P: SwitchPlan):
    """Apply one wave of mutually conflict-free switch plans (stacked on a
    leading axis) with merged scatters. Disjoint junction neighborhoods
    guarantee the per-event write sets never collide, so committing all
    plans at once equals any sequential order; the two masked row-1
    rewrites keep their in-event ordering (m2 sees m1's writes)."""
    xj = state.xj.at[P.xj_rows.reshape(-1), :2].set(
        P.new_pos.reshape(-1, 2), mode="drop")
    E_pq = state.E_pq.at[1, P.q_cols.reshape(-1)].set(
        P.q_vals.reshape(-1), mode="drop")
    E_pp = state.E_pp.at[0, P.p_cols.reshape(-1)].set(
        P.p_vals.reshape(-1), mode="drop")
    row0, row1 = E_pp[0], E_pp[1]
    # at most one event matches any column (disjointness), so argmax picks it
    m1 = (P.valid[:, None] & (row0[None, :] == P.sq1_p2_f[:, None])
          & (row1[None, :] == P.p2s[:, None]))
    row1 = jnp.where(m1.any(0), P.p1s[m1.argmax(0)], row1)
    m2 = (P.valid[:, None] & (row0[None, :] == P.sq2_p1_f[:, None])
          & (row1[None, :] == P.p1s[:, None]))
    row1 = jnp.where(m2.any(0), P.p2s[m2.argmax(0)], row1)
    return state._replace(E_pp=jnp.stack([row0, row1]), E_pq=E_pq, xj=xj)


def _conflict_waves(state: TopoState, events, ev_valid):
    """Schedule events into sequential waves of mutually conflict-free
    switches (VERDICT round-2 item 3: the reference's priority order is
    only load-bearing when events touch the same junctions,
    models.py:726-760).

    Two events conflict when their junction neighborhoods ({p1, p2} and
    all their jj neighbors) or grain neighborhoods (jg rings of p1/p2)
    intersect — a superset of every read key and write target of
    _switch_plan/_switch_apply_one, so disjoint events commute exactly.
    Conflicting events are grouped into connected components (label
    propagation) and serialized within their component in priority order;
    wave w executes every event whose component rank is w. Returns
    (rank [MAXE], n_waves)."""
    E_pp, E_pq = state.E_pp, state.E_pq
    MAXE = events.shape[0]
    ev_safe = jnp.where(ev_valid, events, 0)
    p1 = jnp.where(ev_valid, E_pp[0, ev_safe], -1)
    p2 = jnp.where(ev_valid, E_pp[1, ev_safe], -1)
    p1s = jnp.maximum(p1, 0)
    p2s = jnp.maximum(p2, 0)

    # jj neighbors of both endpoints (3 each, includes the partner) and jg
    # rings (3 grains each) — two batched queries
    ends = jnp.stack([p1s, p2s], axis=1)                      # [MAXE, 2]
    pn_cond = E_pp[0][None, None, :] == ends[:, :, None]      # [MAXE, 2, EP]
    pn_idx = jax.vmap(jax.vmap(lambda c: _nonzero(c, 3, E_pp.shape[1] - 1)))(
        pn_cond)
    pn = E_pp[1][pn_idx].reshape(MAXE, 6)
    qn_cond = E_pq[0][None, None, :] == ends[:, :, None]      # [MAXE, 2, EQ]
    qn_idx = jax.vmap(jax.vmap(lambda c: _nonzero(c, 3, E_pq.shape[1] - 1)))(
        qn_cond)
    qn = E_pq[1][qn_idx].reshape(MAXE, 6)

    J = jnp.concatenate([p1[:, None], p2[:, None], pn], axis=1)  # [MAXE, 8]
    J = jnp.where(ev_valid[:, None], J, -1)
    G = jnp.where(ev_valid[:, None], qn, -1)

    def inter(A):
        eq = (A[:, None, :, None] == A[None, :, None, :]) & (
            A[:, None, :, None] >= 0)
        return eq.any(axis=(2, 3))

    C = inter(J) | inter(G)
    C = C & ev_valid[:, None] & ev_valid[None, :]

    # connected components: iterate label minimization ceil(log2(MAXE)) + 1
    # times (component diameter halves per iteration)
    labels = jnp.where(ev_valid, jnp.arange(MAXE), MAXE)
    n_iter = int(np.ceil(np.log2(max(MAXE, 2)))) + 1
    for _ in range(n_iter):
        nbr_min = jnp.min(jnp.where(C, labels[None, :], MAXE), axis=1)
        labels = jnp.minimum(labels, nbr_min)

    lane = jnp.arange(MAXE)
    same = (labels[None, :] == labels[:, None]) & ev_valid[None, :]
    rank = (same & (lane[None, :] < lane[:, None])).sum(axis=1)
    rank = jnp.where(ev_valid, rank, MAXE)
    n_waves = jnp.where(ev_valid.any(), jnp.max(jnp.where(ev_valid, rank, -1)) + 1, 0)
    return rank, n_waves


def switch_events_waved(state: TopoState, events: jnp.ndarray, n_events,
                        elim_grain):
    """switch_events with speculative batched execution: conflict-free
    switches commit together in one vectorized wave; only overlapping
    chains serialize (one wave per component rank). Semantically equal to
    the sequential version — oracle-tested against it and against the host
    editor on recorded traces."""
    ev_safe = jnp.where(events >= 0, events, 0)
    ev_valid = (events >= 0) & (jnp.arange(events.shape[0]) < n_events)
    va = jnp.where(ev_valid, state.E_pp[0, ev_safe], -1)
    vb = jnp.where(ev_valid, state.E_pp[1, ev_safe], -1)
    NJ = state.xj.shape[0]
    touched = jnp.zeros(NJ, bool)
    touched = touched.at[jnp.where(va >= 0, va, NJ)].set(True, mode="drop")
    touched = touched.at[jnp.where(vb >= 0, vb, NJ)].set(True, mode="drop")

    xj = state.xj
    xj = xj.at[:, :2].add(
        jnp.where(touched[:, None], -state.y_joint / JOINT_SCALE, 0.0)
    )
    state = state._replace(xj=xj)

    rank, n_waves = _conflict_waves(state, events, ev_valid)
    MAXE = events.shape[0]
    forces0 = jnp.full((MAXE, 2), -1, jnp.int32)

    def wave_body(carry):
        st, forces, w = carry
        mask = ev_valid & (rank == w)
        plans = jax.vmap(
            lambda e, pos, m: _switch_plan(
                st, jnp.where(m, e, -1), events, pos, n_events, elim_grain)
        )(events, jnp.arange(MAXE), mask)
        st = _switch_apply_wave(st, plans)
        forces = jnp.where(mask[:, None], plans.force, forces)
        return st, forces, w + 1

    state, forces, _ = jax.lax.while_loop(
        lambda c: c[2] < n_waves, wave_body, (state, forces0, jnp.asarray(0)))

    new_y = jnp.where(touched[:, None], 0.0, state.y_joint)
    xj = state.xj
    xj = xj.at[:, 6:8].set(jnp.where(touched[:, None], 0.0, xj[:, 6:8]))
    return state._replace(xj=xj, y_joint=new_y), forces.reshape(-1)


def delete_grain(state: TopoState, grain):
    """models.delete_grain_index (:866-898) with appended reconnection.
    Neighbor queries batched and edits expressed as drop-mode scatters
    (launch-latency bound, see _switch_one)."""
    E_pp, E_pq = state.E_pp, state.E_pq
    EP, EQ = E_pp.shape[1], E_pq.shape[1]
    NG = state.mask_g.shape[0]
    NJ = state.mask_j.shape[0]
    g = jnp.where(grain >= 0, grain, 0)
    ring_cond = E_pq[1] == g
    ring = _nonzero(ring_cond, 3, EQ - 1)
    n_ring = ring_cond.sum()
    valid = (grain >= 0) & (n_ring == 2)
    p1 = E_pq[0][ring[0]]
    p2 = E_pq[0][ring[1]]
    p1 = jnp.where(valid, p1, 0)
    p2 = jnp.where(valid, p2, 0)

    n_cond = jnp.stack([
        (E_pp[0] == p1) & (E_pp[1] != p2),
        (E_pp[0] == p2) & (E_pp[1] != p1),
    ])
    n_idx = jax.vmap(lambda c: _nonzero(c, 1, EP - 1))(n_cond)[:, 0]
    valid = valid & n_cond.any(axis=1).all()
    np1 = E_pp[1][n_idx[0]]
    np2 = E_pp[1][n_idx[1]]

    ptr = state.append_ptr
    cols = jnp.where(valid, jnp.stack([ptr, ptr + 1]), EP)
    new_cols = jnp.stack([jnp.stack([np1, np2]), jnp.stack([np2, np1])], axis=1)
    E_pp = E_pp.at[:, cols].set(new_cols, mode="drop")
    ptr = jnp.where(valid, ptr + 2, ptr)

    mask_g = state.mask_g.at[jnp.where(valid, g, NG)].set(0, mode="drop")
    j_rows = jnp.where(valid, jnp.stack([p1, p2]), NJ)
    mask_j = state.mask_j.at[j_rows].set(0, mode="drop")

    kill_q = (E_pq[1] == g) | (E_pq[0] == p1) | (E_pq[0] == p2)
    E_pq = jnp.where(valid & kill_q[None, :], -1, E_pq)
    kill_p = (E_pp[0] == p1) | (E_pp[1] == p1) | (E_pp[0] == p2) | (E_pp[1] == p2)
    E_pp = jnp.where(valid & kill_p[None, :], -1, E_pp)

    return state._replace(
        E_pp=E_pp, E_pq=E_pq, mask_g=mask_g, mask_j=mask_j, append_ptr=ptr
    ), valid


# ---------------------------------------------------------------------------
# full update orchestration (models.GrainNN_classifier.update, :614-845)
# ---------------------------------------------------------------------------

MAX_SWITCH = 24    # neighbor-switching budget per step
MAX_ELIM = 8       # grain-elimination budget per step
MAX_TWOSIDED = 8
MAX_EXTRA = 2 * MAX_ELIM * (RING_MAX + 1)


def _ring_collapse(state: TopoState, g, y_grain, active_g=None):
    """Per-grain elimination: find the junction ring, pick the |ring|-2
    lowest-darea ring edges, switch them with elim_grain=g
    (models.py:638-690). Returns (state, ok, L2_events, n_l2, forces)."""
    E_pp, E_pq = state.E_pp, state.E_pq
    EP, EQ = E_pp.shape[1], E_pq.shape[1]
    gs = jnp.where(g >= 0, g, 0)
    ring_idx = _nonzero(E_pq[1] == gs, RING_MAX, EQ - 1)
    ring_n = (E_pq[1] == gs).sum()
    ok = (g >= 0) & (ring_n > 0) & (ring_n <= RING_MAX)
    Np = E_pq[0][ring_idx]  # [RING_MAX], garbage beyond ring_n
    if active_g is not None:
        # meltpool window: grain and its whole junction ring must be active
        # (topology.TopologyEditor.update:89-95)
        ok = ok & active_g[gs]
    if state.active_j is not None:
        lane0 = jnp.arange(RING_MAX)
        ring_active = jnp.where(
            lane0 < ring_n, state.active_j[jnp.clip(Np, 0)], True
        ).all()
        ok = ok & ring_active

    # Ring-edge discovery without the 120-combination scan: a column is a
    # ring edge iff BOTH endpoints lie in the (live) ring and the column is
    # the canonical p1<p2 direction — two [RING_MAX, EP] membership
    # compares replace 120 x 3 per-pair [EP]/[EQ] queries (the elimination
    # path's dominant vector cost on packed multi-lane graphs). Found
    # columns are re-ranked into the reference's combinations(Np, 2) order
    # by their ring-slot pair so the darea tie-break order is identical.
    lane_r = jnp.arange(RING_MAX)
    live_slot = lane_r < ring_n
    src_hit = (E_pp[0][None, :] == Np[:, None]) & live_slot[:, None]  # [R, EP]
    dst_hit = (E_pp[1][None, :] == Np[:, None]) & live_slot[:, None]
    cand_col = src_hit.any(0) & dst_hit.any(0) & (E_pp[0] < E_pp[1])
    src_slot = jnp.argmax(src_hit, axis=0)
    dst_slot = jnp.argmax(dst_hit, axis=0)
    i_slot = jnp.minimum(src_slot, dst_slot)
    j_slot = jnp.maximum(src_slot, dst_slot)
    comb_rank = i_slot * (2 * RING_MAX - i_slot - 1) // 2 + (j_slot - i_slot - 1)

    cols = _nonzero(cand_col, RING_MAX, EP - 1)               # [R] edge cols
    found = jnp.arange(RING_MAX) < cand_col.sum()
    ranks = jnp.where(found, comb_rank[cols], jnp.int32(2**30))
    order_c = jnp.argsort(ranks)
    L2 = jnp.where(found, cols, EP - 1)[order_c]

    # shared grain neighbor per found edge (models.py:666-673) — one
    # batched [R, EQ] query per endpoint
    ep1 = E_pp[0][L2]
    ep2 = E_pp[1][L2]
    nq1_idx = jax.vmap(
        lambda p: _nonzero((E_pq[0] == p) & (E_pq[1] != gs), 2, EQ - 1)
    )(ep1)                                                    # [R, 2]
    nq2_idx = jax.vmap(
        lambda p: _nonzero((E_pq[0] == p) & (E_pq[1] != gs), 2, EQ - 1)
    )(ep2)
    nq1 = E_pq[1][nq1_idx]
    nq2 = E_pq[1][nq2_idx]
    first_in = (nq1[:, 0] == nq2[:, 0]) | (nq1[:, 0] == nq2[:, 1])
    second_in = (nq1[:, 1] == nq2[:, 0]) | (nq1[:, 1] == nq2[:, 1])
    Nq = jnp.where(first_in, nq1[:, 0], nq1[:, 1])
    resolvable = first_in | second_in
    n_l2 = cand_col.sum()
    ok = ok & jnp.where(jnp.arange(RING_MAX) < n_l2, resolvable, True).all()
    ok = ok & (n_l2 == ring_n)
    # all shared grain neighbors distinct (models.py:683-684)
    lane = jnp.arange(RING_MAX)
    valid_lane = lane < n_l2
    dup = (
        (Nq[:, None] == Nq[None, :])
        & valid_lane[:, None] & valid_lane[None, :]
        & (lane[:, None] != lane[None, :])
    ).any()
    ok = ok & ~dup

    # ascending predicted darea; drop the final two (models.py:686-688)
    keys = jnp.where(valid_lane, y_grain[Nq, 0], jnp.inf)
    order = jnp.argsort(keys)
    L2_sorted = L2[order]
    n_events = jnp.maximum(n_l2 - 2, 0)
    events = jnp.where(jnp.arange(RING_MAX) < n_events, L2_sorted, -1)

    def do(state):
        st, forces = switch_events(state, events, n_events, gs)
        return st, forces

    def skip(state):
        return state, jnp.full((2 * RING_MAX,), -1, jnp.int32)

    state, forces = jax.lax.cond(ok, do, skip, state)
    return state, ok, events, n_events, forces


def _two_sided_cleanup(state: TopoState, num_grains, budget: int = MAX_TWOSIDED,
                       g_mask=None):
    """Single pass over grains left with <= 2 live ring edges
    (models.py:712-722,745-757). `budget` scales with the lane count for
    packed multi-rollout states.

    g_mask ([NG] bool, optional) restricts cleanup candidates — the
    working-set editor (editor_workset) passes its footprint so grains
    whose columns are only partially present in the mini graph can't be
    misread as two-sided (their true counts are unchanged this span)."""
    E_pq = state.E_pq
    live = E_pq[1] >= 0
    counts = jnp.zeros(num_grains, jnp.int32).at[
        jnp.where(live, E_pq[1], num_grains)
    ].add(1, mode="drop")
    bad = (counts > 0) & (counts <= 2)
    if g_mask is not None:
        bad = bad & g_mask
    targets = _nonzero(bad, budget, -1)
    targets = jnp.where(targets >= 0, targets, -1)

    # dynamic-trip loop over the compacted live prefix — typically 0 or 1
    # two-sided grains, so padded budget slots are never iterated
    def body(carry):
        st, dropped, i = carry
        g = targets[i]
        st, ok = delete_grain(st, g)
        dropped = dropped.at[i].set(jnp.where(ok, g, -1))
        return st, dropped, i + 1

    state, dropped, _ = jax.lax.while_loop(
        lambda c: (c[2] < budget) & (targets[jnp.minimum(c[2], budget - 1)] >= 0),
        body,
        (state, jnp.full((budget,), -1, jnp.int32), jnp.asarray(0, jnp.int32)),
    )
    return state, dropped


@partial(jax.jit, static_argnames=("num_grains", "max_switch"))
def update_jit(
    state: TopoState,
    edge_logits: jnp.ndarray,    # [EP] (slack columns padded with -inf)
    grain_events: jnp.ndarray,   # [GE] grain ids sorted by area asc, -1 pad
    y_grain: jnp.ndarray,        # [NG, 2] regressor grain outputs
    threshold: float,
    num_grains: int,
    active_g: jnp.ndarray | None = None,  # [NG] bool meltpool window, None = all
    max_switch: int = MAX_SWITCH,
    cleanup_g_mask: jnp.ndarray | None = None,  # [NG] bool, see _two_sided_cleanup
):
    """Full device-side topology update. Nucleation (array growth) runs as a
    separate pass afterwards — see nucleate_jit, mirroring the host editor's
    ordering (topology.TopologyEditor.update:154-158). Returns
    (state, switching_edges [max_switch, 2], extra_events [2*GE*(RING_MAX+1)
    + 2*max_switch]).

    Budgets scale with the inputs: the elimination budget is
    grain_events.shape[0] and the switch budget is `max_switch`, so a
    packed multi-lane state (device_rollout.pack_states) passes
    B x the single-lane budgets."""
    E_pp = state.E_pp
    EP = E_pp.shape[1]
    GE = grain_events.shape[0]
    max_extra = 2 * GE * (RING_MAX + 1) + 2 * max_switch
    ts_budget = max(MAX_TWOSIDED, GE)
    prob = jax.nn.sigmoid(edge_logits)
    cand = (prob > threshold) & (E_pp[0] < E_pp[1]) & (E_pp[0] >= 0)
    # host builds L1 in ascending edge order, then sorts desc by prob
    # (stable) — argsort(-prob) with invalid at the bottom matches
    keys = jnp.where(cand, -prob, jnp.inf)
    order = jnp.argsort(keys, stable=True)
    L1 = jnp.where(jnp.arange(EP) < cand.sum(), order, -1)[:max_switch]
    n_l1 = jnp.minimum(cand.sum(), max_switch)

    extra = jnp.full((max_extra,), -1, jnp.int32)
    n_extra = jnp.asarray(0, jnp.int32)

    def put_extra(extra, n, vals):
        # vectorized ordered append: one cumsum + one drop-mode scatter
        # (was a scan of len(vals) sequential single-element writes)
        ok = vals >= 0
        pos = n + jnp.cumsum(ok.astype(jnp.int32)) - 1
        tgt = jnp.where(ok, pos, extra.shape[0])
        extra = extra.at[tgt].set(vals, mode="drop")
        return extra, n + ok.sum().astype(jnp.int32)

    # ---------------- grain eliminations ------------------------------
    # dynamic-trip loop over the compacted candidate prefix: padded budget
    # slots are never iterated (elim_candidates compacts live ids first)
    def elim_body(carry):
        state, L1, extra, n_extra, i = carry
        g = grain_events[i]
        state, ok, L2, n_l2, forces = _ring_collapse(state, g, y_grain, active_g)
        extra, n_extra = put_extra(extra, n_extra, forces)

        def delete_all(state):
            state, _ = delete_grain(state, g)
            # forced deletions: loop the compacted live prefix only
            live_f = _nonzero(forces >= 0, forces.shape[0], -1)
            NF = forces.shape[0]

            def fbody(c):
                st, k = c
                st, _ = delete_grain(st, forces[live_f[k]])
                return st, k + 1

            state, _ = jax.lax.while_loop(
                lambda c: (c[1] < NF) & (live_f[jnp.minimum(c[1], NF - 1)] >= 0),
                fbody, (state, jnp.asarray(0, jnp.int32)),
            )
            return state

        state = jax.lax.cond(ok, delete_all, lambda s: s, state)
        # drop collapsed edges from the pending switch list (models.py:706-709)
        hit = (L1[:, None] == L2[None, :]) & (L2[None, :] >= 0) & ok
        L1 = jnp.where(hit.any(axis=1), -1, L1)
        state, dropped = jax.lax.cond(
            ok,
            lambda s: _two_sided_cleanup(s, num_grains, ts_budget,
                                         cleanup_g_mask),
            lambda s: (s, jnp.full((ts_budget,), -1, jnp.int32)),
            state,
        )
        return state, L1, extra, n_extra, i + 1

    state, L1, extra, n_extra, _ = jax.lax.while_loop(
        lambda c: (c[4] < GE)
        & (grain_events[jnp.minimum(c[4], GE - 1)] >= 0),
        elim_body,
        (state, L1, extra, n_extra, jnp.asarray(0, jnp.int32)),
    )

    # ---------------- neighbor switching ------------------------------
    L1_live = jnp.where(
        (L1 >= 0) & (state.E_pp[0, jnp.where(L1 >= 0, L1, 0)] >= 0), L1, -1
    )
    # compact, preserving order
    sel = _nonzero(L1_live >= 0, max_switch, max_switch - 1)
    L1c = jnp.where(jnp.arange(max_switch) < (L1_live >= 0).sum(), L1_live[sel], -1)
    n_sw = (L1_live >= 0).sum()
    # conflict-free switches commit together (waves); ring collapses above
    # stay sequential — consecutive ring edges share junctions by design
    _switch = switch_events_waved if USE_WAVED else switch_events
    state, forces = _switch(state, L1c, n_sw, jnp.asarray(-1))
    extra, n_extra = put_extra(extra, n_extra, forces)
    sw_safe = jnp.where(L1c >= 0, L1c, 0)
    switching = jnp.where(
        (L1c >= 0)[:, None],
        state.E_pp[:, sw_safe].T,
        -1,
    )

    state, dropped = _two_sided_cleanup(state, num_grains, ts_budget,
                                        cleanup_g_mask)
    extra, n_extra = put_extra(extra, n_extra, dropped)
    return state, switching, extra


# ---------------------------------------------------------------------------
# nucleation (models.py:769-837) — device-side, fixed budget
# ---------------------------------------------------------------------------

MAX_NUC = 4        # nucleation budget per step (prob per joint is ~1e-4)
NUC_AREA0 = 0.004


def _unit(p, pc, eps=1e-6):
    rel = p - pc
    rel = rel - 1.0 * (rel > 0.5) + 1.0 * (rel < -0.5)
    n = jnp.sqrt(jnp.sum(rel * rel))
    return rel / jnp.maximum(n, eps)


def _nucleate_one(state: TopoState, xg, n_g, n_j, junction, angles):
    """Insert one grain + two junctions at a live junction site
    (models.py:769-837 / topology.TopologyEditor._nucleate). The old
    junction and the two new ones form a triangle around the nucleus;
    the three old jg edges are redistributed so each new vertex borders
    the two old grains it faces."""
    E_pp, E_pq, xj = state.E_pp, state.E_pq, state.xj
    EP, EQ = E_pp.shape[1], E_pq.shape[1]
    NJ, NG = xj.shape[0], xg.shape[0]
    valid = junction >= 0
    jct = jnp.where(valid, junction, 0)

    # three joint neighbors and three grain neighbors (ascending column
    # order, as the host's boolean-mask indexing)
    pn_idx = _nonzero(E_pp[0] == jct, 3, EP - 1)
    j_nbrs = E_pp[1][pn_idx]
    qn_idx = _nonzero(E_pq[0] == jct, 3, EQ - 1)
    gns = E_pq[1][qn_idx]
    valid = valid & ((E_pp[0] == jct).sum() == 3) & ((E_pq[0] == jct).sum() == 3)

    # ordered[k] = the grain neighbor NOT bordering j_nbrs[k]; host keeps the
    # last non-adjacent candidate (topology.py:363-371)
    adj = jax.vmap(
        lambda jn: jax.vmap(
            lambda gn: ((E_pq[0] == jn) & (E_pq[1] == gn)).any()
        )(gns)
    )(j_nbrs)                                   # [3 j_nb, 3 gn]
    sel = jnp.where(~adj, jnp.arange(3)[None, :], -1).max(axis=1)  # [3]
    valid = valid & (sel >= 0).all()
    ordered = gns[jnp.clip(sel, 0)]
    gr0, gr1, gr2 = ordered[0], ordered[1], ordered[2]
    valid = valid & (gr0 != gr1) & (gr1 != gr2) & (gr0 != gr2)

    new_j1 = n_j
    new_j2 = n_j + 1
    site = xj[jct]
    delta_z = site[-1]
    theta = angles * (jnp.pi / 2)
    edge_len = jnp.sqrt(NUC_AREA0 * 4.0 / 3.0 / jnp.sqrt(3.0))

    grain_row = jnp.concatenate([
        site[:3],
        jnp.stack([
            NUC_AREA0, 0.0,
            jnp.cos(theta[0]), jnp.sin(theta[0]),
            jnp.cos(theta[1]), jnp.sin(theta[1]),
            NUC_AREA0, delta_z,
        ]),
    ]).astype(xg.dtype)
    xg = xg.at[jnp.where(valid, n_g, NG)].set(grain_row, mode="drop")

    # vertex triangle: old junction moves toward j_nb0; v1/v2 toward j_nb1/2
    center = site[:2]
    pos = jnp.stack([
        center + _unit(xj[j_nbrs[0], :2], center) * edge_len,
        center + _unit(xj[j_nbrs[1], :2], center) * edge_len,
        center + _unit(xj[j_nbrs[2], :2], center) * edge_len,
    ])
    v_new = jnp.tile(site[None, :], (2, 1))
    v_new = v_new.at[:, :2].set(pos[1:])
    v_new = v_new.at[:, -2:].set(0.0)
    jrows = jnp.where(valid, jnp.stack([new_j1, new_j2]), NJ)
    xj = xj.at[jrows].set(v_new, mode="drop")
    xj = xj.at[jnp.where(valid, jct, NJ), :2].set(pos[0], mode="drop")
    xj = xj.at[jnp.where(valid, jct, NJ), -2:].set(0.0, mode="drop")

    mask_j = state.mask_j.at[jrows].set(1, mode="drop")
    mask_g = state.mask_g.at[jnp.where(valid, n_g, NG)].set(1, mode="drop")

    # kill the three old jg edges of the junction
    kill_q = E_pq[0] == jct
    E_pq = jnp.where(valid & kill_q[None, :], -1, E_pq)

    # rewire the jj edges to/from j_nb1 / j_nb2 (topology.py:387-390)
    def rewire(E, row, cond, val):
        col = _nonzero(cond, 1, EP - 1)[0]
        return E.at[row, jnp.where(valid & cond.any(), col, EP)].set(
            val, mode="drop"
        )

    E_pp = rewire(E_pp, 1, (E_pp[0] == j_nbrs[1]) & (E_pp[1] == jct), new_j1)
    E_pp = rewire(E_pp, 1, (E_pp[0] == j_nbrs[2]) & (E_pp[1] == jct), new_j2)
    E_pp = rewire(E_pp, 0, (E_pp[0] == jct) & (E_pp[1] == j_nbrs[1]), new_j1)
    E_pp = rewire(E_pp, 0, (E_pp[0] == jct) & (E_pp[1] == j_nbrs[2]), new_j2)

    # append the 6 triangle jj edges and the 9 jg edges
    pp_new = jnp.stack([
        jnp.stack([jct, jct, new_j1, new_j1, new_j2, new_j2]),
        jnp.stack([new_j1, new_j2, jct, new_j2, jct, new_j1]),
    ])
    pp_cols = jnp.where(valid, state.append_ptr + jnp.arange(6), EP)
    E_pp = E_pp.at[:, pp_cols].set(pp_new, mode="drop")

    pq_new = jnp.stack([
        jnp.stack([jct, new_j1, new_j2, new_j1, new_j2, jct, new_j2, jct, new_j1]),
        jnp.stack([n_g, n_g, n_g, gr0, gr0, gr1, gr1, gr2, gr2]),
    ])
    pq_cols = jnp.where(valid, state.q_ptr + jnp.arange(9), EQ)
    E_pq = E_pq.at[:, pq_cols].set(pq_new, mode="drop")

    state = state._replace(
        E_pp=E_pp, E_pq=E_pq, xj=xj, mask_g=mask_g, mask_j=mask_j,
        append_ptr=jnp.where(valid, state.append_ptr + 6, state.append_ptr),
        q_ptr=jnp.where(valid, state.q_ptr + 9, state.q_ptr),
    )
    n_g = jnp.where(valid, n_g + 1, n_g)
    n_j = jnp.where(valid, n_j + 2, n_j)
    return state, xg, n_g, n_j, valid


@jax.jit
def nucleate_jit(
    state: TopoState,
    xg: jnp.ndarray,        # [NGcap, 11] grain features (pad rows free)
    n_g: jnp.ndarray,       # scalar int32: live grain count (next grain id)
    n_j: jnp.ndarray,       # scalar int32: live joint count (next joint id)
    rand_j: jnp.ndarray,    # [NJcap] uniform draws (pad rows >= 1.0)
    angles: jnp.ndarray,    # [MAX_NUC, 2] uniform draws, consumed in site order
    nucleation_prob: float,
):
    """Device-side nucleation pass (models.py:769-837). Requires state.q_ptr
    set and >= 9*MAX_NUC slack E_pq columns, >= 6*MAX_NUC slack E_pp columns,
    >= MAX_NUC free grain rows and >= 2*MAX_NUC free joint rows. Returns
    (state, xg, n_g, n_j, n_nucleated)."""
    sites = _nonzero(
        (rand_j < nucleation_prob) & (state.mask_j > 0), MAX_NUC, -1
    )
    sites = jnp.where(sites >= 0, sites, -1)

    def body(carry, inp):
        st, xg, n_g, n_j = carry
        site, ang = inp
        st, xg, n_g, n_j, ok = jax.lax.cond(
            site >= 0,
            lambda s: _nucleate_one(*s),
            lambda s: (s[0], s[1], s[2], s[3], jnp.asarray(False)),
            (st, xg, n_g, n_j, site, ang),
        )
        return (st, xg, n_g, n_j), ok

    (state, xg, n_g, n_j), oks = jax.lax.scan(
        body, (state, xg, n_g, n_j), (sites, angles)
    )
    return state, xg, n_g, n_j, oks.sum()
