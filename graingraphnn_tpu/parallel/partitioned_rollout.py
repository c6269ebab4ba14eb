"""Composed multi-chip partitioned rollout (SURVEY §2.8; VERDICT r4 task 1).

Rounds 2-4 built every partitioned piece as a separate single-span leg:
the halo-striped span forward fed a replicated editor, and the
column-sharded editor ran detached from any forward. This module chains
them into ONE multi-span loop — the multi-chip counterpart of the
reference rollout loop (test.py:353-577) and of the single-device
device_rollout scan:

  per span:
    <1> halo-striped span FORWARD (parallel.halo.make_halo_span_forward):
        nodes partitioned into D periodic x-stripes, both model forwards
        run under shard_map with two neighbor ppermutes per conv; stripe
        capacities are pinned at span 0 so the whole rollout compiles the
        forward once.
    <2> feature integration + z advance and <3a> elimination candidates
        (device_rollout.integrate_stage / elim_candidates) on the
        replicated node arrays (O(N) — consistent with the sharded
        editor's node-array story, sharded_editor.py docstring).
    <3b> column-sharded topology EDIT (parallel.sharded_editor): edge COO
        arrays sharded by column blocks, detection/closure/scatter-back
        O(E/D) per chip, the O(workset) mini edit replicated. A workset
        bust (`invalid`) triggers the documented size-up-and-rerun
        protocol: the span re-runs with doubled wq/wp capacities (the
        grown workset persists for later spans) — no silent `invalid`
        (VERDICT r4 task 7; counterpart of the reference's loud asserts,
        models.py:681-683).
    <5> ELL REBUILD/MAINTENANCE + finalize (device_rollout.finalize_stage,
        the exact code the single-device step runs): incremental
        maintained_cols when persistent ELL structures exist, stable E_pp
        compaction, grain centers from the post-edit rings.

The stripes are rebuilt from the moved positions at the top of every span
(host-side build_striped — the re-partitioning step), so the loop is
host-orchestrated per span with all compute under jit/shard_map.

Exactness: every stage is individually parity-tested against its
single-device counterpart (tests/test_halo.py, tests/test_sharded_editor.py);
the COMPOSED trajectory is asserted against the single-device
device_rollout scan on the real seed10020 graph and a 240 um-scale
synthetic in tests/test_partitioned_rollout.py — identical topology
(E_pp/E_pq/masks bit-equal), identical per-span event sets, positions
allclose (the striped forward reorders float accumulations, so positions
carry fp-noise-level differences; all discrete decisions still match).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ..graph import schema
from ..graph.state import round_up
from ..rollout import device_rollout as dr
from ..rollout import topology_jit as tj
from . import halo
from . import sharded_editor as se


def _np_lengths(pos_src, pos_dst, src, dst):
    """Periodic edge lengths on host, float32, matching the device formula
    (device_rollout._coo_lengths) op-for-op."""
    s = np.where(src >= 0, src, 0)
    d = np.where(dst >= 0, dst, 0)
    rel = (pos_src[s] - pos_dst[d]).astype(np.float32)
    rel = rel - (rel > 0.5).astype(np.float32) + (rel < -0.5).astype(np.float32)
    return np.sqrt(np.sum(rel * rel, axis=-1, dtype=np.float32))


class PartitionedRollout:
    """Multi-span partitioned rollout over a device mesh.

    Parameters mirror device_rollout.make_rollout_scan; `wq`/`wp` are the
    sharded editor's initial workset capacities (doubled on a bust, up to
    `max_retries` times per span). Scope matches the sharded pieces:
    periodic BC, static melt pool, nucleation-free.

    `stripe_offsets=(offset_gx [NG], offset_jx [NJ], domain_factor)`
    stripes the forward by PHYSICAL x — ((scaled + offset)/factor) —
    instead of the patch-scaled feature x: under patch rescaling the
    scaled torus keeps the 40 um interaction range (~0.14) whatever the
    physical domain size, capping D at ~4; physical striping restores
    edge lengths ~0.14/factor so D scales with the domain (D=8+ for the
    120/240 um cases). Initial offsets come from
    device_driver.init_scaled_state; unlike the reference reconstruction
    (which keeps them frozen), the loop MAINTAINS them per span by
    detecting scaled-torus wrap crossings (|dx| > 0.5 between spans —
    per-span motion is ~0.04, so crossings are unambiguous): a frozen
    offset goes stale by a whole patch width at the first crossing,
    which would misplace the node by D*factor/8 stripes. Because the
    offsets (and the grown editor workset) mutate with the trajectory,
    use ONE PartitionedRollout instance per rollout when
    `stripe_offsets` is set — construct a fresh one to start over.
    """

    def __init__(self, reg_params, hp_r, cls_params, hp_c, mesh: Mesh,
                 axis: str = "gp", *,
                 span: int = 6,
                 r_threshold: float = 1e-4,
                 c_threshold: float = 0.6,
                 ring: int = tj.RING_MAX,
                 max_elim: int = tj.MAX_ELIM,
                 max_switch: int = tj.MAX_SWITCH,
                 wq: int = 1024, wp: int = 1024, rounds: int = 3,
                 max_retries: int = 8, t_max: int = 256,
                 cap_headroom: float = 1.5,
                 stripe_offsets=None):
        self.rp, self.hp_r = reg_params, hp_r
        self.cp, self.hp_c = cls_params, hp_c
        self.mesh, self.axis = mesh, axis
        self.D = mesh.shape[axis]
        self.span = span
        self.r_threshold = r_threshold
        self.c_threshold = c_threshold
        self.ring = ring
        self.max_elim = max_elim
        self.max_switch = max_switch
        self.rounds = rounds
        self.max_retries = max_retries
        self.t_max = t_max
        self.cap_headroom = cap_headroom
        self.stripe_offsets = None
        if stripe_offsets is not None:
            off_g, off_j, factor = stripe_offsets
            self.stripe_offsets = (np.asarray(off_g, np.float64).reshape(-1),
                                   np.asarray(off_j, np.float64).reshape(-1),
                                   float(factor))
        # the mini edit's internal budgets (top_k over the workset, the
        # fill-sentinel tail) need a minimum width to trace
        floor = max(128, 2 * max_switch)
        self._wq, self._wp = max(wq, floor), max(wp, floor)
        self._caps: Optional[Dict[str, int]] = None
        self._editors: Dict[tuple, object] = {}

        self._span_fwd = halo.make_halo_span_forward(hp_r, hp_c, mesh, axis)

        @jax.jit
        def _pre(state: dr.DeviceRolloutState, pred_j, pred_g, grain_area):
            xg, xj = dr.integrate_stage(state, pred_j, pred_g, span)
            ge, n_cand = dr.elim_candidates(
                state, grain_area, r_threshold, max_elim)
            return xg, xj, ge, n_cand

        self._pre = _pre

        @jax.jit
        def _fin(E_pp_old, E_pq_old, E_pp_new, E_pq_new,
                 pull_cols, push_cols, connect_cols, xg, xj):
            return dr.finalize_stage(
                E_pp_old, E_pq_old, E_pp_new, E_pq_new,
                pull_cols, push_cols, connect_cols, xg, xj,
                ring=ring, t_max=t_max)

        self._fin = _fin

    # ------------------------------------------------------------------
    def _editor(self, wq: int, wp: int, rounds: int):
        key = (wq, wp, rounds)
        if key not in self._editors:
            self._editors[key] = jax.jit(se.make_sharded_editor(
                self.mesh, self.axis, wq=wq, wp=wp, rounds=rounds,
                max_switch=self.max_switch))
        return self._editors[key]

    def _stripe_x(self, xg, xj):
        """Physical stripe coordinates when patch offsets are present;
        maintains the offsets across spans by detecting wrap crossings
        of the scaled torus (see class docstring)."""
        if self.stripe_offsets is None:
            return None
        off_g, off_j, factor = self.stripe_offsets
        prev = getattr(self, "_prev_stripe_x", None)
        if prev is not None:
            pgx, pjx = prev
            dg = xg[:, 0] - pgx
            off_g = off_g - (dg > 0.5) + (dg < -0.5)
            dj = xj[:, 0] - pjx
            off_j = off_j - (dj > 0.5) + (dj < -0.5)
            self.stripe_offsets = (off_g, off_j, factor)
        self._prev_stripe_x = (xg[:, 0].copy(), xj[:, 0].copy())
        return {"grain": ((xg[:, 0] + off_g) / factor) % 1.0,
                "joint": ((xj[:, 0] + off_j) / factor) % 1.0}

    def _stripe_caps(self, feats, ei, ew, mask, stripe_x):
        """Pin stripe capacities at span 0 with headroom so the sharded
        forward compiles once; re-pinned (recompile) only if a later span
        outgrows them."""
        _s, meta = halo.build_striped(feats, ei, ew, mask, self.D,
                                      stripe_x=stripe_x)
        h = self.cap_headroom
        return {
            "grain_cap": round_up(int(meta.grain_cap * h) + 8, 8),
            "joint_cap": round_up(int(meta.joint_cap * h) + 8, 8),
            "jj_cap": round_up(int(meta.jj_cap * h) + 8, 8),
        }

    # ------------------------------------------------------------------
    def step(self, st: dr.DeviceRolloutState):
        """One composed span. Returns (next_state, aux dict)."""
        xg = np.asarray(st.xg)
        xj = np.asarray(st.xj)
        E_pp = np.asarray(st.E_pp)
        E_pq = np.asarray(st.E_pq)
        EP, EQ = E_pp.shape[1], E_pq.shape[1]
        if EP % self.D or EQ % self.D:
            raise ValueError(
                f"edge capacities ({EP}, {EQ}) must divide the mesh axis "
                f"size {self.D} (init_device_state rounds to 128 columns)")
        live = (E_pp[0] >= 0) & (E_pp[1] >= 0)
        if ((E_pp[0] >= 0) != (E_pp[1] >= 0)).any():
            raise AssertionError("half-dead E_pp column (invariant bust)")

        # <1> striped span forward from the current positions
        pq_len = _np_lengths(xj[:, :2], xg[:, :2], E_pq[0], E_pq[1])
        pp_len = _np_lengths(xj[:, :2], xj[:, :2], E_pp[0], E_pp[1])
        push_t, pull_t, conn_t = schema.EDGE_TYPES
        feats = {"grain": xg, "joint": xj}
        ei = {push_t: np.stack([E_pq[1], E_pq[0]]), pull_t: E_pq,
              conn_t: E_pp}
        ew = {push_t: pq_len[:, None], pull_t: pq_len[:, None],
              conn_t: pp_len[:, None]}
        mask = {"grain": np.asarray(st.mask_g, np.float32),
                "joint": np.asarray(st.mask_j, np.float32)}
        stripe_x = self._stripe_x(xg, xj)
        if self._caps is None:
            self._caps = self._stripe_caps(feats, ei, ew, mask, stripe_x)
        try:
            pred = self._span_fwd(self.rp, self.cp, feats, ei, ew, mask,
                                  self.D, caps=self._caps,
                                  stripe_x=stripe_x)
        except ValueError as e:
            if "stripe capacity" not in str(e):
                raise
            # a stripe outgrew the pinned headroom: re-pin (recompile)
            self._caps = self._stripe_caps(feats, ei, ew, mask, stripe_x)
            pred = self._span_fwd(self.rp, self.cp, feats, ei, ew, mask,
                                  self.D, caps=self._caps,
                                  stripe_x=stripe_x)

        # <2>/<3a> integration + elimination candidates (replicated)
        pred_j = jnp.asarray(pred["joint"], jnp.float32)
        pred_g = jnp.asarray(pred["grain"], jnp.float32)
        area = jnp.asarray(pred["grain_area"], jnp.float32)
        xg2, xj2, ge, n_cand = self._pre(st, pred_j, pred_g, area)

        # <3b> column-sharded edit, with the size-up-and-rerun protocol
        lg = np.full(EP, se.NEG, np.float32)
        lg[np.nonzero(live)[0]] = np.asarray(pred["edge_event"], np.float32)
        lg_j = jnp.asarray(lg)
        ct = jnp.asarray(self.c_threshold, jnp.float32)
        wq, wp, rounds = self._wq, self._wp, self.rounds
        retries = 0
        while True:
            edit = self._editor(wq, wp, rounds)
            (E_pp2, E_pq2, xj3, mg2, mj2, _n_pp2, sw, ex, invalid) = edit(
                st.E_pp, st.E_pq, lg_j, xj2, pred_j,
                st.mask_g, st.mask_j, st.n_pp, ge, pred_g, ct)
            if not bool(np.asarray(invalid)):
                break
            # size-up-and-rerun: each retry doubles the workset (covers a
            # gather overflow — an event-dense span whose footprint is a
            # large fraction of E) AND adds a closure round (covers a
            # guard-shell hit — a cascade deeper than the hop budget).
            # Once the workset exceeds the whole padded edge array, what
            # remains is a genuine append-capacity bust.
            if retries >= self.max_retries or wp > 2 * EP:
                raise RuntimeError(
                    f"sharded editor still invalid at workset {wq}/{wp}, "
                    f"{rounds} closure rounds (E_pp capacity {EP}) — "
                    f"raise pp_cap (append headroom) on the rollout state")
            wq, wp, rounds = 2 * wq, 2 * wp, rounds + 1
            retries += 1
        self._wq, self._wp, self.rounds = wq, wp, rounds  # growth persists

        # <5> shared finalize: ELL maintenance + compaction + centers
        (E_pp3, n_pp3, pull_cols, push_cols, connect_cols, xg3,
         ov_fin) = self._fin(
            st.E_pp, st.E_pq, E_pp2, E_pq2,
            st.pull_cols, st.push_cols, st.connect_cols, xg2, xj3)
        if bool(np.asarray(ov_fin)):
            raise RuntimeError("ELL maintenance overflow (ring bust) in "
                               "the partitioned finalize — raise ring")

        st2 = dr.DeviceRolloutState(
            xg=xg3, xj=xj3, E_pp=E_pp3, E_pq=E_pq2,
            mask_g=mg2, mask_j=mj2, n_pp=n_pp3,
            pull_cols=pull_cols, push_cols=push_cols,
            connect_cols=connect_cols)
        aux = {
            "grain_events": np.asarray(ge),
            "extra_events": np.asarray(ex),
            "switching": np.asarray(sw),
            "elim_saturated": bool(np.asarray(n_cand) > self.max_elim),
            "editor_retries": retries,
            # the composed path's capacity failures raise above instead of
            # flagging; keep the device-driver aux contract
            "ring_overflow": False,
            "pp_overflow": False,
        }
        return st2, aux

    def run(self, st: dr.DeviceRolloutState, n_steps: int):
        """Advance n_steps spans. Returns (state, aux) with aux values
        stacked on a leading step axis (the device scan's layout)."""
        aux_steps = []
        for _ in range(n_steps):
            st, aux = self.step(st)
            aux_steps.append(aux)
        stacked = {
            k: np.stack([a[k] for a in aux_steps])
            for k in aux_steps[0]
        }
        return st, stacked
