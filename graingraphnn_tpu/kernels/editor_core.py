"""Fused topology-editor core (reference: models.py:614-1053).

rollout/topology_jit.py expresses the reference's sequential edge surgery as
jit-compatible HLO — correct, but each event is a chain of ~50 tiny
gather/scatter/reduce HLOs inside a `lax.while_loop`, and each HLO pays
fixed TPU dispatch overhead: the editor is 50-57% of a 120 um rollout step
(artifacts/STEP_BREAKDOWN.json) while its actual arithmetic is microseconds.

This module re-expresses the SAME semantics in a form that compiles to one
Pallas TPU kernel (kernels/editor_pallas.py): the whole graph state
(E_pp/E_pq rows, junction positions/gradients, masks) lives in VMEM as
[1, N] row vectors, and every dynamic index operation becomes a masked
iota-reduction or a full-row select — straight-line VPU code with no
per-op dispatch. The exact op set is chosen to be legal BOTH in Mosaic
(inside pallas_call) and in plain XLA, so the identical code path runs on
CPU for oracle tests (tests/test_editor_fused.py asserts bit-equality
against topology_jit.update_jit, itself byte-matched to the reference).

Conventions:
  * big vectors are [1, N] (lane-major), tiny per-ring vectors are [K, 1]
    (sublane-major), event lists carried as [K, 1] columns, output lists
    as [1, K] rows;
  * dynamic gather  v[i]      ->  sum(where(iota == i, v, 0))
  * dynamic scatter v[i] = x  ->  where(iota == i, x, v)   (i >= N drops)
  * first-k-indices (jnp.nonzero) -> chained masked min-reductions
  * argsort over <= RING_MAX keys -> iterative stable selection
Scope: the nucleation-free editor pass, static OR moving melt pool (round
5: the active-window masks `aj`/`ag` gate switches and ring collapses
exactly as topology_jit does; models.py:641-648,912); the nucleation pass
stays on topology_jit.nucleate_jit (array growth, runs after this editor).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..rollout import topology_jit as tj

RING = tj.RING_MAX
# plain int (NOT jnp.int32): a module-level jnp scalar would be captured as
# a constant by pallas_call, which Mosaic rejects
BIG = 2**30


def _io(n):
    """[1, n] int32 lane iota."""
    return jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)


def _ioc(k):
    """[k, 1] int32 sublane iota."""
    return jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)


def _gat(vec, idx):
    """vec[0, idx] as a scalar; 0 when idx is outside [0, N)."""
    return jnp.sum(jnp.where(_io(vec.shape[1]) == idx, vec, 0))


def _sca(vec, idx, val):
    """vec with vec[0, idx] = val; dropped when idx is outside [0, N)."""
    return jnp.where(_io(vec.shape[1]) == idx, jnp.asarray(val, vec.dtype), vec)


def _atc(col, i):
    """col[i, 0] as a scalar for a [k, 1] column."""
    return jnp.sum(jnp.where(_ioc(col.shape[0]) == i, col, 0))


def _gat_col(vec, idx_col):
    """Gather a [1, N] row at [k, 1] indices -> [k, 1]."""
    oh = _io(vec.shape[1]) == idx_col                     # [k, N]
    return jnp.sum(jnp.where(oh, vec, 0), axis=1, keepdims=True)


def _first_k(cond, k, fill):
    """First k ascending indices where cond [1, N] holds, as k scalars;
    `fill` beyond the population (== jnp.nonzero(..., size=k, fill))."""
    io = _io(cond.shape[1])
    out = []
    prev = jnp.int32(-1)
    for _ in range(k):
        m = jnp.min(jnp.where(cond & (io > prev), io, BIG))
        out.append(jnp.where(m >= BIG, jnp.int32(fill), m))
        prev = jnp.where(m >= BIG, BIG - 1, m)
    return out


def _first_k_col(cond, k, fill):
    """_first_k returning a [k, 1] column (k may be larger, loop-carried)."""
    io = _io(cond.shape[1])
    res = jnp.full((k, 1), fill, jnp.int32)

    def body(i, carry):
        res, prev = carry
        m = jnp.min(jnp.where(cond & (io > prev), io, BIG))
        res = jnp.where(_ioc(k) == i, jnp.where(m >= BIG, jnp.int32(fill), m),
                        res)
        return res, jnp.where(m >= BIG, BIG - 1, m)

    res, _ = jax.lax.fori_loop(0, k, body, (res, jnp.int32(-1)))
    return res


def _first2_rows(cond, fill):
    """Per-row first two indices of cond [k, N] -> two [k, 1] columns."""
    io = _io(cond.shape[1])
    m0 = jnp.min(jnp.where(cond, io, BIG), axis=1, keepdims=True)
    m1 = jnp.min(jnp.where(cond & (io > m0), io, BIG), axis=1, keepdims=True)
    f = jnp.int32(fill)
    return jnp.where(m0 >= BIG, f, m0), jnp.where(m1 >= BIG, f, m1)


def _order_asc(keys, k):
    """Stable ascending argsort of a [k, 1] float column (ties by index),
    identical to jnp.argsort(keys) with its default stable sort."""
    iok = _ioc(k)
    order = jnp.zeros((k, 1), jnp.int32)

    # `taken` carried as int32: Mosaic cannot carry i1 vectors through
    # scf.for (same for every loop-carried mask below)
    def body(i, carry):
        order, taken = carry
        free = taken == 0
        masked = jnp.where(free, keys, jnp.inf)
        m = jnp.min(masked)
        idx = jnp.min(jnp.where((masked == m) & free, iok, BIG))
        order = jnp.where(iok == i, idx, order)
        taken = jnp.where(iok == idx, 1, taken)
        return order, taken

    order, _ = jax.lax.fori_loop(
        0, k, body, (order, jnp.zeros((k, 1), jnp.int32)))
    return order


def _permute_col(vec, order, k):
    """vec[order] for [k, 1] columns."""
    iok = _ioc(k)

    def body(i, out):
        oi = jnp.sum(jnp.where(iok == i, order, 0))
        v = jnp.sum(jnp.where(iok == oi, vec, 0))
        return jnp.where(iok == i, v, out)

    return jax.lax.fori_loop(0, k, body, jnp.zeros((k, 1), vec.dtype))


def _first2_of3(b0, b1, b2):
    """jnp.nonzero([b0,b1,b2], size=2, fill_value=0) as two scalars."""
    f = jnp.where(b0, 0, jnp.where(b1, 1, jnp.where(b2, 2, 0)))
    s = jnp.where(b1 & (f < 1), 1, jnp.where(b2 & (f < 2), 2, 0))
    return jnp.int32(f), jnp.int32(s)


def _pick3(v0, v1, v2, idx):
    return jnp.where(idx == 0, v0, jnp.where(idx == 1, v1, v2))


def _wrap_s(p, pc):
    rel = p - pc
    return p - 1.0 * (rel > 0.5) + 1.0 * (rel < -0.5)


# ---------------------------------------------------------------------------
# editor state as a flat tuple (pytree-free: every leaf a jnp array/scalar)
# ---------------------------------------------------------------------------
# st = (pp0, pp1, pq0, pq1, posx, posy, gx, gy, yjx, yjy, mg, mj, ptr)
#   pp0/pp1 [1, EP] i32, pq0/pq1 [1, EQ] i32,
#   posx/posy/gx/gy/yjx/yjy [1, NJ] f32, mg [1, NG] i32, mj [1, NJ] i32,
#   ptr scalar i32.


def _switch_one(st, e, events, pos, n_events, elim_grain, aj):
    """One neighbor-switching event — topology_jit._switch_plan +
    _switch_apply_one (reference models.py:910-1045) in masked-reduction
    form. events: [K, 1] column; aj: [1, NJ] i32 meltpool active-joint
    window (all-ones = static melt pool). Returns (st, force1, force2)."""
    (pp0, pp1, pq0, pq1, posx, posy, gx, gy, yjx, yjy, mg, mj, ptr) = st
    EP = pp0.shape[1]
    EQ = pq0.shape[1]
    NJ = posx.shape[1]
    K = events.shape[0]

    p1 = _gat(pp0, e)
    p2 = _gat(pp1, e)
    valid = (e >= 0) & (p1 >= 0) & (p2 >= 0)
    p1s = jnp.where(valid, p1, 0)
    p2s = jnp.where(valid, p2, 0)
    # meltpool window: skip switches touching an inactive joint
    # (topology_jit._switch_plan:129-132; topology.TopologyEditor
    # _switch_edges:229)
    valid = valid & (_gat(aj, p1s) > 0) & (_gat(aj, p2s) > 0)

    # grain rings of both endpoints (3 each)
    a0, a1, a2 = _first_k(pq0 == p1s, 3, EQ - 1)
    b0, b1, b2 = _first_k(pq0 == p2s, 3, EQ - 1)
    q10, q11, q12 = _gat(pq1, a0), _gat(pq1, a1), _gat(pq1, a2)
    q20, q21, q22 = _gat(pq1, b0), _gat(pq1, b1), _gat(pq1, b2)

    # other joint neighbors of both endpoints (2 each)
    c0, c1 = _first_k((pp0 == p1s) & (pp1 != p2s), 2, EP - 1)
    d0, d1 = _first_k((pp0 == p2s) & (pp1 != p1s), 2, EP - 1)

    in20 = (q10 == q20) | (q10 == q21) | (q10 == q22)
    in21 = (q11 == q20) | (q11 == q21) | (q11 == q22)
    in22 = (q12 == q20) | (q12 == q21) | (q12 == q22)
    in10 = (q20 == q10) | (q20 == q11) | (q20 == q12)
    in11 = (q21 == q10) | (q21 == q11) | (q21 == q12)
    in12 = (q22 == q10) | (q22 == q11) | (q22 == q12)
    s2 = in20.astype(jnp.int32) + in21 + in22
    s1 = in10.astype(jnp.int32) + in11 + in12
    ok_shape = (s2 == 2) & ((3 - s2) == 1) & ((3 - s1) == 1)
    valid = valid & ok_shape

    # shrink pair keeps p1-ring order; expand = the two non-shared grains
    sh0, sh1 = _first2_of3(in20, in21, in22)
    shrink_q1 = _pick3(q10, q11, q12, sh0)
    shrink_q2 = _pick3(q10, q11, q12, sh1)
    e1_idx, _ = _first2_of3(~in20, ~in21, ~in22)
    e2_idx, _ = _first2_of3(~in10, ~in11, ~in12)
    expand_q1 = _pick3(q10, q11, q12, e1_idx)
    expand_q2 = _pick3(q20, q21, q22, e2_idx)

    qs10 = _pick3(a0, a1, a2, sh0)
    qs11 = _pick3(a0, a1, a2, sh1)
    # first occurrence of shrink_q* in p2's ring (argmax: 0 when absent)
    m0 = jnp.where(q20 == shrink_q1, 0,
                   jnp.where(q21 == shrink_q1, 1,
                             jnp.where(q22 == shrink_q1, 2, 0)))
    m1 = jnp.where(q20 == shrink_q2, 0,
                   jnp.where(q21 == shrink_q2, 1,
                             jnp.where(q22 == shrink_q2, 2, 0)))
    qs20 = _pick3(b0, b1, b2, m0)
    qs21 = _pick3(b0, b1, b2, m1)

    # joint-neighbor ordering: index 0 borders shrink_q1
    fn1 = _gat(pp1, c0)
    fn2 = _gat(pp1, d0)
    border1 = jnp.any((pq0 == fn1) & (pq1 == shrink_q1))
    border2 = jnp.any((pq0 == fn2) & (pq1 == shrink_q1))
    pn10 = jnp.where(border1, c0, c1)
    pn11 = jnp.where(border1, c1, c0)
    pn20 = jnp.where(border2, d0, d1)
    pn21 = jnp.where(border2, d1, d0)
    sq1_p1 = _gat(pp1, pn10)
    sq2_p1 = _gat(pp1, pn11)
    sq1_p2 = _gat(pp1, pn20)
    sq2_p2 = _gat(pp1, pn21)

    has_elim = elim_grain >= 0
    degenerate = (sq1_p1 == sq1_p2) | (sq2_p1 == sq2_p2)
    valid = valid & (has_elim | ~degenerate)
    force1 = jnp.where(
        valid & (sq1_p1 == sq1_p2) & (shrink_q1 != elim_grain), shrink_q1, -1)
    force2 = jnp.where(
        valid & (sq2_p1 == sq2_p2) & (shrink_q2 != elim_grain), shrink_q2, -1)

    # periodic midpoint reposition (models.py:985-992)
    x1x, x1y = _gat(posx, p1s), _gat(posy, p1s)
    x2x, x2y = _gat(posx, p2s), _gat(posy, p2s)
    x2mx, x2my = _wrap_s(x2x, x1x), _wrap_s(x2y, x1y)
    cx = 0.5 * (x1x + x2mx)
    cy = 0.5 * (x1y + x2my)
    n2x, n2y = _wrap_s(cx, x2x), _wrap_s(cy, x2y)

    # lookahead over remaining events (models.py:1005-1013)
    iokk = _ioc(K)
    remaining = (iokk >= pos) & (iokk < n_events) & (events >= 0)
    ev_safe = jnp.where(events >= 0, events, 0)
    nxt_a = jnp.where(remaining, _gat_col(pp0, ev_safe), -2)
    nxt_b = jnp.where(remaining, _gat_col(pp1, ev_safe), -2)

    def _hit(v):
        return jnp.any((nxt_a == v) | (nxt_b == v))

    h0, h1, h2, h3 = _hit(sq1_p2), _hit(sq2_p2), _hit(sq1_p1), _hit(sq2_p1)
    swap = jnp.asarray(True)
    swap = jnp.where(h0 & ~h1, False, swap)
    swap = jnp.where(h1 & ~h0, True, swap)
    swap = jnp.where(h2 & ~h3, True, swap)
    swap = jnp.where(h3 & ~h2, False, swap)

    qs10, qs11 = jnp.where(swap, qs11, qs10), jnp.where(swap, qs10, qs11)
    qs20, qs21 = jnp.where(swap, qs21, qs20), jnp.where(swap, qs20, qs21)
    pn10, pn11 = jnp.where(swap, pn11, pn10), jnp.where(swap, pn10, pn11)
    pn20, pn21 = jnp.where(swap, pn21, pn20), jnp.where(swap, pn20, pn21)
    sq1_p2_f = jnp.where(swap, sq2_p2, sq1_p2)
    sq2_p1_f = jnp.where(swap, sq1_p1, sq2_p1)

    # ---- apply (write order matches _switch_apply_one) ----
    r1 = jnp.where(valid, p1s, NJ)
    r2 = jnp.where(valid, p2s, NJ)
    posx = _sca(_sca(posx, r1, cx), r2, n2x)
    posy = _sca(_sca(posy, r1, cy), r2, n2y)
    qc1 = jnp.where(valid, qs11, EQ)
    qc2 = jnp.where(valid, qs20, EQ)
    pq1 = _sca(_sca(pq1, qc1, expand_q2), qc2, expand_q1)
    pc1 = jnp.where(valid, pn11, EP)
    pc2 = jnp.where(valid, pn20, EP)
    pp0 = _sca(_sca(pp0, pc1, p2s), pc2, p1s)
    mm1 = (pp0 == sq1_p2_f) & (pp1 == p2s)
    pp1 = jnp.where(valid & mm1, p1s, pp1)
    mm2 = (pp0 == sq2_p1_f) & (pp1 == p1s)
    pp1 = jnp.where(valid & mm2, p2s, pp1)

    st = (pp0, pp1, pq0, pq1, posx, posy, gx, gy, yjx, yjy, mg, mj, ptr)
    return st, force1, force2


def switch_events(st, events, n_events, elim_grain, aj):
    """topology_jit.switch_events (models.py:901-1053): rollback predicted
    displacement of touched vertices, process events in order, zero
    displacements/grads. events: [K, 1] column of E_pp indices (-1 pad);
    aj: [1, NJ] i32 active-joint window. Returns (st, forces [1, 2K])."""
    (pp0, pp1, pq0, pq1, posx, posy, gx, gy, yjx, yjy, mg, mj, ptr) = st
    NJ = posx.shape[1]
    K = events.shape[0]
    iokk = _ioc(K)
    ev_valid = (events >= 0) & (iokk < n_events)
    ev_safe = jnp.where(events >= 0, events, 0)
    va = jnp.where(ev_valid, _gat_col(pp0, ev_safe), -1)
    vb = jnp.where(ev_valid, _gat_col(pp1, ev_safe), -1)
    ioj = _io(NJ)
    touched = jnp.any((ioj == va) | (ioj == vb), axis=0, keepdims=True)

    posx = posx + jnp.where(touched, -yjx / tj.JOINT_SCALE, 0.0)
    posy = posy + jnp.where(touched, -yjy / tj.JOINT_SCALE, 0.0)
    st = (pp0, pp1, pq0, pq1, posx, posy, gx, gy, yjx, yjy, mg, mj, ptr)

    forces0 = jnp.full((1, 2 * K), -1, jnp.int32)
    n_trip = jnp.minimum(jnp.asarray(n_events, jnp.int32), K)
    io2k = _io(2 * K)

    def body(i, carry):
        st, forces = carry

        def do(args):
            st, forces = args
            st, f1, f2 = _switch_one(st, _atc(events, i), events, i,
                                     n_events, elim_grain, aj)
            forces = jnp.where(io2k == 2 * i, f1,
                               jnp.where(io2k == 2 * i + 1, f2, forces))
            return st, forces

        return jax.lax.cond(i < n_trip, do, lambda a: a, (st, forces))

    st, forces = jax.lax.fori_loop(0, K, body, (st, forces0))

    (pp0, pp1, pq0, pq1, posx, posy, gx, gy, yjx, yjy, mg, mj, ptr) = st
    yjx = jnp.where(touched, 0.0, yjx)
    yjy = jnp.where(touched, 0.0, yjy)
    gx = jnp.where(touched, 0.0, gx)
    gy = jnp.where(touched, 0.0, gy)
    st = (pp0, pp1, pq0, pq1, posx, posy, gx, gy, yjx, yjy, mg, mj, ptr)
    return st, forces


def delete_grain(st, grain):
    """topology_jit.delete_grain (models.py:866-898). Returns (st, valid)."""
    (pp0, pp1, pq0, pq1, posx, posy, gx, gy, yjx, yjy, mg, mj, ptr) = st
    EP = pp0.shape[1]
    EQ = pq0.shape[1]
    NG = mg.shape[1]
    NJ = mj.shape[1]
    g = jnp.where(grain >= 0, grain, 0)
    ring_cond = pq1 == g
    r0, r1 = _first_k(ring_cond, 2, EQ - 1)
    n_ring = jnp.sum(ring_cond)
    valid = (grain >= 0) & (n_ring == 2)
    p1 = jnp.where(valid, _gat(pq0, r0), 0)
    p2 = jnp.where(valid, _gat(pq0, r1), 0)

    cnd1 = (pp0 == p1) & (pp1 != p2)
    cnd2 = (pp0 == p2) & (pp1 != p1)
    (i1,) = _first_k(cnd1, 1, EP - 1)
    (i2,) = _first_k(cnd2, 1, EP - 1)
    valid = valid & jnp.any(cnd1) & jnp.any(cnd2)
    np1 = _gat(pp1, i1)
    np2 = _gat(pp1, i2)

    col0 = jnp.where(valid, ptr, EP)
    col1 = jnp.where(valid, ptr + 1, EP)
    pp0 = _sca(_sca(pp0, col0, np1), col1, np2)
    pp1 = _sca(_sca(pp1, col0, np2), col1, np1)
    ptr = jnp.where(valid, ptr + 2, ptr)

    mg = _sca(mg, jnp.where(valid, g, NG), 0)
    mj = _sca(_sca(mj, jnp.where(valid, p1, NJ), 0),
              jnp.where(valid, p2, NJ), 0)

    kill_q = (pq1 == g) | (pq0 == p1) | (pq0 == p2)
    pq0 = jnp.where(valid & kill_q, -1, pq0)
    pq1 = jnp.where(valid & kill_q, -1, pq1)
    kill_p = (pp0 == p1) | (pp1 == p1) | (pp0 == p2) | (pp1 == p2)
    pp0 = jnp.where(valid & kill_p, -1, pp0)
    pp1 = jnp.where(valid & kill_p, -1, pp1)

    st = (pp0, pp1, pq0, pq1, posx, posy, gx, gy, yjx, yjy, mg, mj, ptr)
    return st, valid


def _ring_collapse(st, g, y_g0, aj, ag):
    """topology_jit._ring_collapse (models.py:638-690). y_g0: [1, NG]
    predicted darea row; aj/ag: [1, NJ]/[1, NG] i32 meltpool windows
    (all-ones = static melt pool). Returns (st, ok, events [RING,1],
    forces [1, 2*RING])."""
    (pp0, pp1, pq0, pq1, *_rest) = st
    EP = pp0.shape[1]
    EQ = pq0.shape[1]
    gs = jnp.where(g >= 0, g, 0)
    ring_cond = pq1 == gs
    ring_idx = _first_k_col(ring_cond, RING, EQ - 1)
    ring_n = jnp.sum(ring_cond)
    ok = (g >= 0) & (ring_n > 0) & (ring_n <= RING)
    Np = _gat_col(pq0, ring_idx)                      # [RING, 1]

    iokr = _ioc(RING)
    live_slot = iokr < ring_n
    # meltpool window: grain and its whole junction ring must be active
    # (topology_jit._ring_collapse:521-528; topology.update:89-95)
    ok = ok & (_gat(ag, gs) > 0)
    ring_aj = _gat_col(aj, jnp.maximum(Np, 0))        # [RING, 1]
    n_inactive = jnp.sum(((ring_aj == 0) & live_slot).astype(jnp.int32))
    ok = ok & (n_inactive == 0)
    src_hit = (pp0 == Np) & live_slot                 # [RING, EP]
    dst_hit = (pp1 == Np) & live_slot
    cand_col = (jnp.any(src_hit, axis=0, keepdims=True)
                & jnp.any(dst_hit, axis=0, keepdims=True)
                & (pp0 < pp1))                        # [1, EP]
    src_slot = jnp.min(jnp.where(src_hit, iokr, BIG), axis=0, keepdims=True)
    dst_slot = jnp.min(jnp.where(dst_hit, iokr, BIG), axis=0, keepdims=True)
    src_slot = jnp.where(cand_col, src_slot, 0)
    dst_slot = jnp.where(cand_col, dst_slot, 0)
    i_slot = jnp.minimum(src_slot, dst_slot)
    j_slot = jnp.maximum(src_slot, dst_slot)
    comb_rank = i_slot * (2 * RING - i_slot - 1) // 2 + (j_slot - i_slot - 1)

    cols = _first_k_col(cand_col, RING, EP - 1)
    n_l2 = jnp.sum(cand_col)
    found = iokr < n_l2
    ranks = jnp.where(found, _gat_col(comb_rank, cols), BIG).astype(jnp.float32)
    order_c = _order_asc(ranks, RING)
    L2 = _permute_col(jnp.where(found, cols, EP - 1), order_c, RING)

    # shared grain neighbor per found edge (models.py:666-673)
    ep1 = _gat_col(pp0, L2)
    ep2 = _gat_col(pp1, L2)
    nq1_i0, nq1_i1 = _first2_rows((pq0 == ep1) & (pq1 != gs), EQ - 1)
    nq2_i0, nq2_i1 = _first2_rows((pq0 == ep2) & (pq1 != gs), EQ - 1)
    nq1_0 = _gat_col(pq1, nq1_i0)
    nq1_1 = _gat_col(pq1, nq1_i1)
    nq2_0 = _gat_col(pq1, nq2_i0)
    nq2_1 = _gat_col(pq1, nq2_i1)
    first_in = (nq1_0 == nq2_0) | (nq1_0 == nq2_1)
    second_in = (nq1_1 == nq2_0) | (nq1_1 == nq2_1)
    Nq = jnp.where(first_in, nq1_0, nq1_1)
    resolvable = first_in | second_in
    # int-form all(where(found, resolvable, True)): Mosaic cannot lower a
    # bool select on [RING, 1] columns (i8->i1 trunci)
    n_unresolved = jnp.sum((found & ~resolvable).astype(jnp.int32))
    ok = ok & (n_unresolved == 0)
    ok = ok & (n_l2 == ring_n)

    # all shared grain neighbors distinct (models.py:683-684)
    def dup_body(i, dup):
        v = _atc(Nq, i)
        hits = (Nq == v) & found & (iokr > i)
        return dup | (jnp.any(hits) & (i < n_l2))

    dup = jax.lax.fori_loop(0, RING, dup_body, jnp.asarray(False))
    ok = ok & ~dup

    # ascending predicted darea; drop the final two (models.py:686-688)
    keys = jnp.where(found, _gat_col(y_g0, Nq), jnp.inf)
    order = _order_asc(keys, RING)
    L2_sorted = _permute_col(L2, order, RING)
    n_events = jnp.maximum(n_l2 - 2, 0)
    events = jnp.where(iokr < n_events, L2_sorted, -1)

    def do(st):
        return switch_events(st, events, n_events, gs, aj)

    def skip(st):
        return st, jnp.full((1, 2 * RING), -1, jnp.int32)

    st, forces = jax.lax.cond(ok, do, skip, st)
    return st, ok, events, forces


def _two_sided_cleanup(st, num_grains: int, budget: int):
    """topology_jit._two_sided_cleanup (models.py:712-722,745-757).
    Grain live-edge counts via chunked [128, EQ] membership compares (no
    scatter-add primitive in Mosaic). Returns (st, dropped [1, budget])."""
    pq1 = st[3]
    NG = num_grains
    live = pq1 >= 0
    # int32 marker row, not bool: Mosaic cannot lower a select that WRITES
    # a bool vector (i8->i1 trunci); bool compares as select masks are fine
    bad = jnp.zeros((1, NG), jnp.int32)
    io128 = _ioc(128)
    iog = _io(NG)
    nchunks = -(-NG // 128)

    def cbody(ci, bad):
        ids = ci * 128 + io128
        hits = (pq1 == ids) & live                    # [128, EQ]
        cnt = jnp.sum(hits.astype(jnp.int32), axis=1, keepdims=True)
        isbad = (cnt > 0) & (cnt <= 2)
        oh = iog == ids                               # [128, NG]
        return jnp.where(jnp.any(oh & isbad, axis=0, keepdims=True),
                         1, bad)

    bad = jax.lax.fori_loop(0, nchunks, cbody, bad)
    targets = _first_k_col(bad > 0, budget, -1)
    iob = _io(budget)

    def body(k, carry):
        st, dropped = carry
        t = _atc(targets, k)

        def do(args):
            st, dropped = args
            st, okd = delete_grain(st, t)
            dropped = jnp.where(iob == k, jnp.where(okd, t, -1), dropped)
            return st, dropped

        return jax.lax.cond(t >= 0, do, lambda a: a, (st, dropped))

    st, dropped = jax.lax.fori_loop(
        0, budget, body, (st, jnp.full((1, budget), -1, jnp.int32)))
    return st, dropped


def editor_core(pp0, pp1, pq0, pq1, posx, posy, gx, gy, yjx, yjy, mg, mj,
                ptr, y_g0, prob, grain_events, threshold, num_grains: int,
                max_switch: int, aj=None, ag=None):
    """Full fused editor — topology_jit.update_jit semantics (reference
    models.py:614-845) on row-vector state. grain_events: [1, GE] row;
    aj [1, NJ] / ag [1, NG] i32 are the moving-meltpool active windows
    (models.py:641-648,912; None = all-active static melt pool).
    Returns the updated state tuple plus (sw0, sw1 [1, max_switch] switching
    endpoints, extra [1, max_extra])."""
    if aj is None:
        aj = jnp.ones(mj.shape, jnp.int32)
    if ag is None:
        ag = jnp.ones(mg.shape, jnp.int32)
    EP = pp0.shape[1]
    GE = grain_events.shape[1]
    MS = max_switch
    max_extra = 2 * GE * (RING + 1) + 2 * MS
    ts_budget = max(tj.MAX_TWOSIDED, GE)
    ioms = _ioc(MS)
    ioex = _io(max_extra)

    # ---- L1 selection: stable descending-prob candidates --------------
    cand = (prob > threshold) & (pp0 < pp1) & (pp0 >= 0)
    n_cand = jnp.sum(cand)
    ioe = _io(EP)

    def sel_body(k, carry):
        L1, taken = carry
        free = cand & (taken == 0)
        masked = jnp.where(free, prob, -jnp.inf)
        m = jnp.max(masked)
        idx = jnp.min(jnp.where((masked == m) & free, ioe, BIG))
        pick = k < n_cand
        L1 = jnp.where(ioms == k, jnp.where(pick, idx, -1), L1)
        taken = jnp.where(pick & (ioe == idx), 1, taken)
        return L1, taken

    L1, _ = jax.lax.fori_loop(
        0, MS, sel_body,
        (jnp.full((MS, 1), -1, jnp.int32), jnp.zeros((1, EP), jnp.int32)))

    st = (pp0, pp1, pq0, pq1, posx, posy, gx, gy, yjx, yjy, mg, mj, ptr)
    extra = jnp.full((1, max_extra), -1, jnp.int32)
    n_extra = jnp.int32(0)

    def put_extra(extra, n, vals_row):
        def body(k, carry):
            extra, n = carry
            v = _gat(vals_row, k)
            wr = v >= 0
            extra = jnp.where(wr & (ioex == n), v, extra)
            return extra, n + wr.astype(jnp.int32)

        return jax.lax.fori_loop(0, vals_row.shape[1], body, (extra, n))

    # ---- grain eliminations -------------------------------------------
    def elim_body(i, carry):
        st, L1, extra, n_extra = carry
        g = _gat(grain_events, i)

        def do(args):
            st, L1, extra, n_extra = args
            y_g0_cur = y_g0
            st, okc, L2ev, forces = _ring_collapse(st, g, y_g0_cur, aj, ag)
            extra, n_extra = put_extra(extra, n_extra, forces)

            def delete_all(st):
                st, _v = delete_grain(st, g)

                def fbody(k, st):
                    fv = _gat(forces, k)
                    return jax.lax.cond(
                        fv >= 0, lambda s: delete_grain(s, fv)[0],
                        lambda s: s, st)

                return jax.lax.fori_loop(0, forces.shape[1], fbody, st)

            st = jax.lax.cond(okc, delete_all, lambda s: s, st)

            # drop collapsed edges from the pending switch list
            def drop_body(j, L1):
                v = _atc(L2ev, j)
                return jnp.where((L1 == v) & (v >= 0) & okc, -1, L1)

            L1 = jax.lax.fori_loop(0, RING, drop_body, L1)
            st = jax.lax.cond(
                okc,
                lambda s: _two_sided_cleanup(s, num_grains, ts_budget)[0],
                lambda s: s, st)
            return st, L1, extra, n_extra

        return jax.lax.cond(g >= 0, do, lambda a: a, (st, L1, extra, n_extra))

    st, L1, extra, n_extra = jax.lax.fori_loop(
        0, GE, elim_body, (st, L1, extra, n_extra))

    # ---- neighbor switching -------------------------------------------
    pp0_cur = st[0]
    L1_safe = jnp.where(L1 >= 0, L1, 0)
    L1_live = jnp.where((L1 >= 0) & (_gat_col(pp0_cur, L1_safe) >= 0), L1, -1)

    def cmp_body(k, carry):
        L1c, n = carry
        v = _atc(L1_live, k)
        wr = v >= 0
        L1c = jnp.where(wr & (ioms == n), v, L1c)
        return L1c, n + wr.astype(jnp.int32)

    L1c, n_sw = jax.lax.fori_loop(
        0, MS, cmp_body, (jnp.full((MS, 1), -1, jnp.int32), jnp.int32(0)))

    st, forces = switch_events(st, L1c, n_sw, jnp.int32(-1), aj)
    extra, n_extra = put_extra(extra, n_extra, forces)

    pp0_f, pp1_f = st[0], st[1]
    sw_safe = jnp.where(L1c >= 0, L1c, 0)
    live_sw = L1c >= 0
    sw0 = jnp.where(live_sw, _gat_col(pp0_f, sw_safe), -1)
    sw1 = jnp.where(live_sw, _gat_col(pp1_f, sw_safe), -1)

    st, dropped = _two_sided_cleanup(st, num_grains, ts_budget)
    extra, n_extra = put_extra(extra, n_extra, dropped)
    return st, sw0, sw1, extra
