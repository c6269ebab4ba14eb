"""Rollout inference engine (reference test.py:72-611, the flagship path).

Per step (z-layer):
  <1> jitted regressor + classifier forward on the padded GraphSample
  <2> feature integration (Rmodel.update, models.py:473-527) + z advance
  <3> event thresholding + host topology editor (TopologyEditor)
  <4> planar-graph reconstruction, rasterization, layer error + event
      accuracy vs the PF truth
  <5> grain centers + edge lengths recomputed for the next step

The jit boundary: model forwards run on device with static shapes (node/edge
capacities change only when nucleation outgrows them); everything
data-dependent (the editor, region rebuild, raster) runs on host, mirroring
the reference's CPU rollout loop.
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..graph import schema, state
from ..graph import state as state_mod
from ..graph.planar import PlanarGraph
from ..models import grain_nn
from .qoi import (
    event_hit_rate,
    misorientation_curve,
    size_distribution_ks,
    volume_graph,
    volume_truth,
)
from .topology import TopologyEditor

TRAIN_FRAMES = 120       # test.py:190
TRAIN_DELTA_Z = 0.4      # test.py:191


class RolloutEngine:
    def __init__(
        self,
        reg_params,
        hp_r,
        cls_params,
        hp_c,
        *,
        r_threshold: float = 1e-4,   # test.py:187
        c_threshold: float = 0.6,    # test.py:188
        seed: int = 0,
        verbose: bool = False,
        jit_editor: bool = False,
        halo: Optional[tuple] = None,
    ):
        """`halo`: (mesh, D[, axis]) — partition BOTH model forwards over a
        device mesh with halo-exchange stripes (parallel.halo) inside every
        rollout span; the topology editor stays replicated on host. Stripes
        are rebuilt from the moved junction positions each span. Periodic
        BC only. This is the multi-chip rollout leg (SURVEY §2.8): the
        same graph, partitioned, must roll out identically to one device
        (tests/test_halo.py)."""
        # a list/tuple of param pytrees = an ensemble: members are stacked on
        # a leading axis, the forward vmaps over it and averages predictions.
        # Regressor outputs are post-nonlinearity (tanh/relu), so their mean
        # is a standard deep-ensemble mean. The classifier's edge_event is a
        # LOGIT (grain_nn.apply_classifier), sigmoided only downstream
        # (topology.py) — it is averaged in probability space and converted
        # back to a logit so c_threshold keeps its single-model calibration.
        self._ens_r = isinstance(reg_params, (list, tuple))
        if self._ens_r:
            reg_params = jax.tree_util.tree_map(
                lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *reg_params
            )
        self._ens_c = isinstance(cls_params, (list, tuple))
        if self._ens_c:
            cls_params = jax.tree_util.tree_map(
                lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *cls_params
            )
        self.reg_params = reg_params
        self.hp_r = hp_r
        self.cls_params = cls_params
        self.hp_c = hp_c
        self.r_threshold = r_threshold
        self.c_threshold = c_threshold
        self.jit_editor = jit_editor
        self._halo_span = None
        self._halo_D = None
        if halo is not None:
            from ..parallel.halo import make_halo_span_forward

            mesh, D = halo[0], halo[1]
            axis = halo[2] if len(halo) > 2 else "gp"
            assert not (self._ens_r or self._ens_c), \
                "halo rollout covers single-model checkpoints"
            self._halo_span = make_halo_span_forward(hp_r, hp_c, mesh, axis)
            self._halo_D = D
        self.editor = TopologyEditor(
            threshold=c_threshold, rng=np.random.default_rng(seed), verbose=verbose
        )
        self.verbose = verbose
        self._fwd_cache = {}

    def _jit_update(self, x, edges, pred, mask, nucleation_prob=0.0,
                    active_grains=None, active_joints=None):
        """Device-side topology update (rollout.topology_jit), matching the
        host editor's semantics — incl. the moving-meltpool active window
        and nucleation (as a second device pass, mirroring the host's
        ordering at topology.py:154-158)."""
        from . import topology_jit as tj

        nuc = nucleation_prob > 1e-6
        NG, NJ = len(x["grain"]), len(x["joint"])
        pad_g = tj.MAX_NUC if nuc else 0
        pad_j = 2 * tj.MAX_NUC if nuc else 0

        E_base = edges["connect"]
        slack = 2 * (tj.MAX_ELIM * 3 + tj.MAX_TWOSIDED + 2) + 6 * pad_g
        # bucket the padded width so the jitted update recompiles only when
        # the live edge count crosses a 64-column boundary
        EP = state_mod.round_up(E_base.shape[1] + slack, 64)
        E_pp = np.full((2, EP), -1, np.int64)
        E_pp[:, : E_base.shape[1]] = E_base
        EQ_base = edges["pull"].shape[1]
        EQ = state_mod.round_up(EQ_base + 9 * pad_g, 64) if nuc else EQ_base
        E_pq = np.full((2, EQ), -1, np.int64)
        E_pq[:, :EQ_base] = edges["pull"]

        def pad_rows(a, n, fill=0.0):
            if n == 0:
                return a
            out = np.full((len(a) + n,) + a.shape[1:], fill, a.dtype)
            out[: len(a)] = a
            return out

        xj = pad_rows(np.asarray(x["joint"], np.float64), pad_j)
        yj = pad_rows(np.asarray(pred["joint"], np.float64), pad_j)
        active_j = None
        if active_joints is not None:
            active_j = jnp.asarray(pad_rows(np.asarray(active_joints), pad_j))
        state = tj.TopoState(
            E_pp=jnp.asarray(E_pp, jnp.int32),
            E_pq=jnp.asarray(E_pq, jnp.int32),
            xj=jnp.asarray(xj, jnp.float32),
            y_joint=jnp.asarray(yj, jnp.float32),
            mask_g=jnp.asarray(pad_rows(mask["grain"][:, 0], pad_g), jnp.int32),
            mask_j=jnp.asarray(pad_rows(mask["joint"][:, 0], pad_j), jnp.int32),
            append_ptr=jnp.asarray(E_base.shape[1], jnp.int32),
            active_j=active_j,
            q_ptr=jnp.asarray(EQ_base, jnp.int32) if nuc else None,
        )
        logits = np.full(EP, -1e30, np.float32)
        logits[: E_base.shape[1]] = pred["edge_event"]
        ge = np.full(tj.MAX_ELIM, -1, np.int32)
        ev = np.asarray(pred["grain_event"])[: tj.MAX_ELIM]
        ge[: len(ev)] = ev
        active_g = None
        if active_grains is not None:
            active_g = jnp.asarray(pad_rows(np.asarray(active_grains), pad_g))
        state2, switching, extra = tj.update_jit(
            state,
            jnp.asarray(logits),
            jnp.asarray(ge),
            jnp.asarray(pred["grain"], jnp.float32),
            self.c_threshold,
            NG,
            active_g,
        )

        # ---- nucleation pass: same RNG stream as the host editor ---------
        if nuc:
            rand = self.editor.rng.random(NJ)
            mask_j_now = np.asarray(state2.mask_j)[:NJ]
            n_sites = int(((rand < nucleation_prob) & (mask_j_now > 0)).sum())
            angles = np.zeros((tj.MAX_NUC, 2))
            if n_sites:
                angles[:n_sites] = self.editor.rng.random(
                    (min(n_sites, tj.MAX_NUC), 2)
                )
            xg = pad_rows(np.asarray(x["grain"], np.float64), pad_g)
            state2, xg_out, n_g2, n_j2, _ = tj.nucleate_jit(
                state2,
                jnp.asarray(xg, jnp.float32),
                jnp.asarray(NG, jnp.int32),
                jnp.asarray(NJ, jnp.int32),
                jnp.asarray(pad_rows(rand, pad_j, fill=1.0), jnp.float32),
                jnp.asarray(angles, jnp.float32),
                float(nucleation_prob),
            )
            n_g2, n_j2 = int(n_g2), int(n_j2)
            x["grain"] = np.asarray(xg_out, np.float64)[:n_g2]
            mask["grain"] = np.asarray(state2.mask_g)[:n_g2, None]
        else:
            n_g2, n_j2 = NG, NJ
            mask["grain"][:, 0] = np.asarray(state2.mask_g)[:NG]

        # back to host layout: compact deleted slots (test-time arrays are
        # host-rebuilt each step anyway)
        E_pp2 = np.asarray(state2.E_pp)
        E_pq2 = np.asarray(state2.E_pq)
        new_edges = {
            "connect": E_pp2[:, E_pp2[0] >= 0].astype(np.int64),
            "pull": E_pq2[:, E_pq2[0] >= 0].astype(np.int64),
        }
        new_edges["push"] = new_edges["pull"][::-1].copy()
        x["joint"] = np.asarray(state2.xj, np.float64)[:n_j2]
        if nuc:
            mask["joint"] = np.asarray(state2.mask_j)[:n_j2, None]
        else:
            mask["joint"][:, 0] = np.asarray(state2.mask_j)[:NJ]
        switching = np.asarray(switching)
        switching = switching[switching[:, 0] >= 0]
        extra = np.asarray(extra)
        extra = extra[extra >= 0].astype(np.int64)
        return x, new_edges, switching, extra

    def _log(self, *a):
        if self.verbose:
            print(*a)

    # ------------------------------------------------------------------
    def _forward(self, x, edges, edge_attr, caps):
        """Jitted regressor+classifier forward on padded arrays. One compile
        per capacity bucket. With `halo` set, both forwards run partitioned
        over the mesh instead (stripes rebuilt from current positions)."""
        if self._halo_span is not None:
            ei = {
                schema.EDGE_TYPES[0]: edges["push"],
                schema.EDGE_TYPES[1]: edges["pull"],
                schema.EDGE_TYPES[2]: edges["connect"],
            }
            pred = self._halo_span(
                self.reg_params, self.cls_params,
                {"grain": x["grain"], "joint": x["joint"]}, ei, edge_attr,
                {"grain": self._mask["grain"], "joint": self._mask["joint"]},
                self._halo_D,
            )
            y_r = {"joint": pred["joint"], "grain": pred["grain"],
                   "grain_area": pred["grain_area"]}
            y_c = {"edge_event": pred["edge_event"], "edge": pred["edge"]}
            return (y_r, y_c), None
        key = caps
        if key not in self._fwd_cache:
            def fwd(sample):
                if self._ens_r:
                    y_r = jax.tree_util.tree_map(
                        lambda a: a.mean(axis=0),
                        jax.vmap(
                            lambda p: grain_nn.apply_regressor(p, self.hp_r, sample)
                        )(self.reg_params),
                    )
                else:
                    y_r = grain_nn.apply_regressor(self.reg_params, self.hp_r, sample)
                if self._ens_c:
                    def cfwd(p):
                        y = grain_nn.apply_classifier(p, self.hp_c, sample)
                        return {**y, "edge_event": jax.nn.sigmoid(y["edge_event"])}

                    y_c = jax.tree_util.tree_map(
                        lambda a: a.mean(axis=0), jax.vmap(cfwd)(self.cls_params)
                    )
                    pm = jnp.clip(y_c["edge_event"], 1e-7, 1.0 - 1e-7)
                    y_c = {**y_c, "edge_event": jnp.log(pm) - jnp.log1p(-pm)}
                else:
                    y_c = grain_nn.apply_classifier(self.cls_params, self.hp_c, sample)
                return (y_r, y_c)
            self._fwd_cache[key] = jax.jit(fwd)

        ng, nj, ne = caps
        push, pull = edges["push"], edges["pull"]
        attr = dict(edge_attr)
        if self._bc == "noflux":
            # exclude boundary-grain (id 0) edges from the model input
            # (test.py:365-375) — its ring is unbounded and unphysical
            keep_p = push[0] > 0
            keep_q = pull[1] > 0
            attr = {
                schema.EDGE_TYPES[0]: edge_attr[schema.EDGE_TYPES[0]][keep_p],
                schema.EDGE_TYPES[1]: edge_attr[schema.EDGE_TYPES[1]][keep_q],
                schema.EDGE_TYPES[2]: edge_attr[schema.EDGE_TYPES[2]],
            }
            push = push[:, keep_p]
            pull = pull[:, keep_q]
        # grains grow more sides as neighbors are eliminated — size the ring
        # capacity from the live degree distribution (bucketed for compiles)
        live_dst = pull[1][pull[1] >= 0]
        max_ring = int(np.bincount(live_dst).max()) if len(live_dst) else 1
        ring = max(schema.DEFAULT_GRAIN_RING, state.round_up(max_ring, 8))
        sample = state.build_sample(
            {"grain": x["grain"], "joint": x["joint"]},
            {schema.EDGE_TYPES[0]: push,
             schema.EDGE_TYPES[1]: pull,
             schema.EDGE_TYPES[2]: edges["connect"]},
            attr,
            {"grain": self._mask["grain"], "joint": self._mask["joint"]},
            grain_cap=ng, joint_cap=nj, jj_edge_cap=ne, grain_ring=ring,
        )
        y_r, y_c = self._fwd_cache[key](sample)
        return jax.tree_util.tree_map(np.asarray, (y_r, y_c)), sample

    # ------------------------------------------------------------------
    def run(
        self,
        hg0,                      # HeteroState (test sample, gradient-augmented)
        traj,                     # TrajectoryExtractor with PF truth loaded
        *,
        span: Optional[int] = None,
        compare: bool = True,
        growth_height: float = -1.0,
        reconstruct: bool = True,
        nucleation_density: float = 0.0,
        reconst_mesh_size: float = 0.08,
        temporal: bool = False,
        interp_frames: int = 0,
        collect_fields: bool = False,
        meltpool: Optional[Dict] = None,
        clamp_gr: Optional[tuple] = None,
    ) -> Dict:
        """`meltpool`: moving-melt-pool geometry {r0, z0, melt_pool_angle}
        (test.py:315-324); None for the static (line) melt pool.

        `clamp_gr`: (G_min, G_max, R_min, R_max) — clamp the thermal
        features (joint cols 3/4, encoded 1-G/10 and R/2) to the training
        hull before inference. OFF by default: the reference extrapolates
        freely (README.md:69 evaluates 120um at G=10, R=2 with a model
        trained near G~2, R~0.6). The 120um calibration isolated the
        event over-prediction to exactly this thermal extrapolation
        (artifacts/CALIBRATION_120um.json: clamping lands the event count
        inside the reference's 644-704 band); this option ships that
        counterfactual as a documented inference-time mitigation."""
        span = span or getattr(hg0, "span", 6)
        t_start = time.time()

        # ---- initialization (test.py:288-347) ----------------------------
        x = {
            "grain": np.array(hg0.feature_dicts["grain"], dtype=np.float64),
            "joint": np.array(hg0.feature_dicts["joint"], dtype=np.float64),
        }
        edges = {
            "push": np.array(hg0.edge_index_dicts[schema.EDGE_TYPES[0]], dtype=np.int64),
            "pull": np.array(hg0.edge_index_dicts[schema.EDGE_TYPES[1]], dtype=np.int64),
            "connect": np.array(hg0.edge_index_dicts[schema.EDGE_TYPES[2]], dtype=np.int64),
        }
        edge_attr = {
            et: np.array(hg0.edge_weight_dicts[et], dtype=np.float64)
            for et in schema.EDGE_TYPES
        }
        # live jj edges only (deleted slots were compacted by append_history)
        live = edges["connect"][0] > -1
        edges["connect"] = edges["connect"][:, live]

        mask = {
            "grain": np.array(hg0.mask["grain"], dtype=np.int64).reshape(-1, 1),
            "joint": np.ones((len(x["joint"]), 1), dtype=np.int64),  # test.py:291
        }
        if clamp_gr is not None:
            g_min, g_max, r_min, r_max = clamp_gr
            g = 10.0 * (1.0 - x["joint"][:, 3])
            r = 2.0 * x["joint"][:, 4]
            x["joint"][:, 3] = 1.0 - np.clip(g, g_min, g_max) / 10.0
            x["joint"][:, 4] = np.clip(r, r_min, r_max) / 2.0
        self._mask = mask
        self._bc = traj.BC
        if self._halo_span is not None and traj.BC != "periodic":
            raise ValueError("halo-partitioned rollout covers periodic BC")

        # patch rescaling for domains larger than the 40um training patch
        # (test.py:29-55,310-312): local geometry statistics are scaled to
        # match the training distribution, with per-node offsets folded out
        # when reconstructing in global coordinates
        domain_factor = traj.lxd / traj.patch_size
        offset_j = np.zeros((len(x["joint"]), 2))
        if domain_factor > 1:
            for et in edge_attr:
                edge_attr[et] = edge_attr[et] * domain_factor
            x["grain"][:, :2] *= domain_factor
            x["joint"][:, :2] *= domain_factor
            offset_j = np.floor(x["joint"][:, :2])
            x["joint"][:, :2] -= offset_j
            if traj.BC == "periodic":
                off_g = x["grain"][:, :2] - x["grain"][:, :2] % 1
            else:
                off_g = np.floor(x["grain"][:, :2])
            x["grain"][:, :2] -= off_g

        # planar bookkeeping graph for reconstruction/QoIs
        pg = PlanarGraph(bc=traj.BC, imagesize=traj.imagesize)
        pg.raise_err = False
        pg.max_y = getattr(traj, "max_y", 1.0)
        num_regions = traj.num_regions
        theta_z = np.array(traj.theta_z)

        area_traj = [dict(traj.area_traj[0])] if traj.area_traj else [{}]
        extraV_traj = []

        imagesize = (
            (int(traj.lxd / reconst_mesh_size) + 1, int(traj.lyd / reconst_mesh_size) + 1)
            if reconstruct else (0, 0)
        )

        s_full = traj.patch_size / traj.mesh_size + 1

        def to_global(X):
            """Fold patch-scaling offsets out for reconstruction/QoIs
            (test.py:471-474)."""
            if domain_factor <= 1:
                return X
            Xg = {k: v.copy() for k, v in X.items()}
            n = len(offset_j)
            Xg["joint"][:n, :2] = (Xg["joint"][:n, :2] + offset_j) / domain_factor
            return Xg

        def gnn_update(frame, X, topo):
            """graph_trajectory.GNN_update (:1010-1103)."""
            X = to_global(X)
            X_j = X["joint"][:, :2]
            X_g = X["grain"][:, 3:5]
            mask_j = mask["joint"][:, 0]
            mask_g = mask["grain"][:, 0]
            pg.vertices = {
                i: X_j[i].tolist() for i in range(len(X_j)) if mask_j[i] == 1
            }
            area_counts = {}
            area_sum = np.sum(X_g[:, 0] * mask_g) / (traj.lxd / traj.patch_size) ** 2
            for idx in range(len(X_g)):
                if mask_g[idx] > 0:
                    area_counts[idx + 1] = X_g[idx, 0] * s_full**2 / area_sum
            extraV_traj.append(mask_g * X_g[:, 1] / schema.TARGET_SCALING["grain"] * s_full**3)
            if frame > 0:
                area_traj.append(area_counts)
            else:
                area_traj[0] = area_counts
            if topo:
                v2j = {}
                for grain, joint in edges["push"].T:
                    v2j.setdefault(int(joint), set()).add(int(grain) + 1)
                for k, v in v2j.items():
                    assert len(v) == 3, (k, v)
                pg.joint2vertex = {tuple(sorted(v)): k for k, v in v2j.items()}
                pg.vertex2joint = {v: k for k, v in pg.joint2vertex.items()}
                pg.edges = [[int(i), int(j)] for i, j in edges["connect"].T]
            pg.rebuild_regions()
            return area_counts

        frames_total = traj.frames
        if growth_height > 0:
            final_height = traj.ini_height + growth_height
        else:
            final_height = traj.final_height
        frames_total = int((final_height - traj.ini_height) / TRAIN_DELTA_Z) + 1
        frame_ratio = getattr(traj, "train_test_frame_ratio", 1)

        # moving melt pool (test.py:315-324): a sliding active window whose
        # width follows the melt-front slope; the frame budget is set by how
        # many window advances fit in the domain
        melt = None
        if meltpool is not None:
            angle = meltpool["melt_pool_angle"]
            gap = span * TRAIN_DELTA_Z * np.cos(angle) ** 2 / np.tan(angle) / traj.lxd
            win = (meltpool["r0"] - meltpool["z0"]) / np.tan(angle) / traj.lxd
            melt = {
                "r0": meltpool["r0"], "z0": meltpool["z0"], "gap": gap,
                "melt_left": 0.0, "melt_right": win, "melt_extra": win + gap,
            }
            frames_total = int(np.floor((1 - win) / gap)) * span + 1

        # temporal mode: varying (G, R) schedule vs build height
        # (test.py:345-346,377-379 + graph_trajectory.GR_seq_from_time)
        g_list = r_list = None
        if temporal:
            from ..data.thermal import gr_sequence_from_time

            g_list, r_list = gr_sequence_from_time(
                traj.seed, 2 ** (traj.seed % 10), TRAIN_DELTA_Z * span,
                (frames_total - 1) // span, traj.ini_height, final_height,
            )

        gnn_update(0, x, topo=True)
        alpha_field_list = []
        if reconstruct:
            pg.rasterize(imagesize)
            if collect_fields:
                alpha_field_list.append(pg.alpha_field.T.copy())
        prev_X = {k: v.copy() for k, v in x.items()}
        layer_err_list = []
        if compare:
            pg.layer_error(traj.alpha_pde_frames[:, :, 0].T)
            layer_err_list.append((traj.ini_height, pg.error_layer))

        grain_event_list: list = []
        event_steps: list = []
        grain_acc_list = [(traj.ini_height, 0, 0, 0)]
        grain_events_truth = traj.grain_events if traj.grain_events else [set()] * frames_total

        # padded capacities (one compile while they hold)
        def caps():
            return (
                state.round_up(len(x["grain"]), 8),
                state.round_up(len(x["joint"]), 16),
                state.round_up(edges["connect"].shape[1], 32),
            )

        # ---- the rollout loop (test.py:353-577) -------------------------
        for frame in range(span, frames_total, span):
            self._log(f"--- progress {frame/(frames_total-1):1.2f} ---")
            height = traj.ini_height + frame * TRAIN_DELTA_Z

            # <1> forward
            if temporal:
                g_now = g_list[frame // span - 1]
                r_now = r_list[frame // span - 1]
                if clamp_gr is not None:
                    g_now = np.clip(g_now, clamp_gr[0], clamp_gr[1])
                    r_now = np.clip(r_now, clamp_gr[2], clamp_gr[3])
                x["joint"][:, 3] = 1 - g_now / 10
                x["joint"][:, 4] = r_now / 2
            (y_r, y_c), _sample = self._forward(
                {k: v.astype(np.float32) for k, v in x.items()}, edges, edge_attr, caps()
            )
            ng, nj = len(x["grain"]), len(x["joint"])
            ne = edges["connect"].shape[1]
            pred = {
                "joint": np.asarray(y_r["joint"], np.float64)[:nj],
                "grain": np.asarray(y_r["grain"], np.float64)[:ng],
                "grain_area": np.asarray(y_r["grain_area"], np.float64)[:ng],
                "edge_event": np.asarray(y_c["edge_event"], np.float64)[:ne],
                "edge": np.asarray(y_c["edge"], np.float64)[:ne],
            }

            # <2> feature integration (models.Rmodel.update, :473-527)
            active_joints = active_grains = None
            if melt is not None:
                # moving-meltpool active window (models.py:480-507): only
                # nodes inside the melt window evolve; predictions near the
                # trailing edge are tapered and scaled by front curvature
                n_off = len(offset_j)
                gx_j = (x["joint"][:n_off, :2] + offset_j) / max(domain_factor, 1)
                gx_g = x["grain"][:, :2] / max(domain_factor, 1)

                def window(xc):
                    near = (xc - melt["melt_extra"]) / (
                        melt["melt_right"] - melt["melt_extra"]
                    )
                    near = np.clip(near, 0.0, 1.0)
                    near[xc < melt["melt_left"]] = 0.0
                    return near

                def curvature(xc):
                    return melt["z0"] + (melt["r0"] - melt["z0"]) * (
                        xc - melt["melt_left"]
                    ) / (melt["melt_right"] - melt["melt_left"])

                aw_j = np.zeros(len(x["joint"]))
                aw_j[:n_off] = window(gx_j[:, 0])
                aw_g = window(gx_g[:, 0])
                pred["joint"] = pred["joint"] * aw_j[:, None]
                pred["joint"][:n_off, 1] *= melt["r0"] / curvature(gx_j[:, 0])
                pred["grain"][:, 0] *= aw_g * melt["r0"] / curvature(gx_g[:, 0])
                pred["grain"][:, 1] *= aw_g
                active_joints = aw_j > 0.9999
                active_grains = aw_g > 0.9999

            x["joint"][:, :2] += pred["joint"] / schema.TARGET_SCALING["joint"]
            x["grain"][:, schema.GRAIN_AREA_COL] += (
                pred["grain"][:, 0] / schema.TARGET_SCALING["grain"]
            )
            x["grain"][:, schema.GRAIN_EXTRAV_COL] = pred["grain"][:, 1]
            x["joint"][:, 6:8] = pred["joint"]
            x["grain"][:, schema.GRAIN_DAREA_COL] = pred["grain"][:, 0]
            # z advance + clamp (test.py:401-407)
            x["grain"][:, 2] += span / (TRAIN_FRAMES + 1)
            x["joint"][:, 2] += span / (TRAIN_FRAMES + 1)
            zmax = TRAIN_FRAMES / (TRAIN_FRAMES + 1)
            if x["grain"][0, 2] > zmax:
                x["grain"][:, 2] = zmax
                x["joint"][:, 2] = zmax

            # <3> events + topology edits
            live_g = mask["grain"][:, 0] > 0
            cand = np.nonzero(live_g & (pred["grain_area"] < self.r_threshold))[0]
            cand = cand[np.argsort(pred["grain_area"][cand])]
            if traj.BC == "noflux":
                cand = cand[cand != 0]
            pred["grain_event"] = cand

            nucleation_prob = (
                nucleation_density * traj.lxd * traj.lxd * TRAIN_DELTA_Z
                / max(int(mask["joint"].sum()), 1)
            )
            if melt is not None:
                # editor honors the active window (models.py:641-648,912)
                cand = cand[active_grains[cand]]
                pred["grain_event"] = cand
            if self.jit_editor:
                x, edges, switching_list, extra_events = self._jit_update(
                    x, edges, pred, mask, nucleation_prob=nucleation_prob,
                    active_grains=active_grains, active_joints=active_joints,
                )
            else:
                x, edges, switching_list, extra_events = self.editor.update(
                    x, edges, pred, mask, nucleation_prob=nucleation_prob,
                    active_grains=active_grains, active_joints=active_joints,
                )
            pred["grain_event"] = np.concatenate([pred["grain_event"], extra_events])

            # no-flux boundary handling (test.py:446-466): reset the boundary
            # grain, snap boundary joints to the wall, clamp coordinates
            if traj.BC == "noflux":
                x["grain"][0, :2] = 0.5
                x["grain"][0, 3:5] = 0
                x["grain"][0, -1] = 0
                n_off = len(offset_j)
                xj = x["joint"]
                xj[:n_off, :2] = (xj[:n_off, :2] + offset_j) / max(domain_factor, 1)
                max_y = getattr(traj, "max_y", 1.0)
                bnd = np.unique(edges["push"][1, edges["push"][0] == 0])
                for p in bnd:
                    d = np.array([xj[p, 0], 1.0 - xj[p, 0], xj[p, 1], max_y - xj[p, 1]])
                    side = int(np.argmin(d))
                    xj[p, [0, 0, 1, 1][side]] = [0.0, 1.0, 0.0, max_y][side]
                xj[:, 0] = np.clip(xj[:, 0], 0.0, 1.0)
                xj[:, 1] = np.clip(xj[:, 1], 0.0, max_y)
                if domain_factor > 1:
                    xj[:n_off, :2] = xj[:n_off, :2] * domain_factor - offset_j

            if len(x["grain"]) > num_regions:
                add_angles = np.arccos(x["grain"][num_regions:, 5])
                theta_z = np.concatenate([theta_z, add_angles])
                num_regions = len(x["grain"])

            grain_event_list.extend(int(g) for g in pred["grain_event"])
            # calibration breakdown: area-triggered vs editor-forced events
            event_steps.append({
                "height": float(height),
                "area_elim": int(len(cand)),
                "forced_elim": int(len(extra_events)),
                "switches": int(len(switching_list)),
            })
            topo = len(pred["grain_event"]) > 0 or len(switching_list) > 0

            # <4> reconstruction + evaluation
            gnn_update(frame, x, topo)
            truth_frames = grain_events_truth[: frame // frame_ratio + 1]
            truth = set()
            for s_ in truth_frames:
                truth |= set(s_)
            truth = {int(i) - 1 for i in truth}
            tp, n_truth, n_pred = event_hit_rate(set(grain_event_list), truth)
            grain_acc_list.append((height, n_truth, n_pred, tp))
            self._log(f"grain events hit rate: {tp}/{n_truth} (predicted {n_pred})")

            if reconstruct:
                # interpolated intermediate layers for smoother 3D stacks
                # (test.py:494-528): blend joint coordinates between the
                # previous and current step, using whichever step's topology
                # is closer
                for k in range(interp_frames):
                    coeff = (1 + k) / (1 + interp_frames)
                    mean_x = {kk: v.copy() for kk, v in x.items()}
                    n_prev = min(len(prev_X["joint"]), len(mean_x["joint"]))
                    mean_x["joint"][:n_prev, :2] = (
                        coeff * x["joint"][:n_prev, :2]
                        + (1 - coeff) * prev_X["joint"][:n_prev, :2]
                    )
                    gnn_update(frame, mean_x, topo=False)
                    pg.rasterize(imagesize)
                    if collect_fields:
                        alpha_field_list.append(pg.alpha_field.T.copy())
                if interp_frames:
                    gnn_update(frame, x, topo=False)
                pg.rasterize(imagesize)
                if collect_fields:
                    alpha_field_list.append(pg.alpha_field.T.copy())
            if compare:
                t_idx = frame // frame_ratio
                t_idx = min(t_idx, traj.alpha_pde_frames.shape[2] - 1)
                pg.layer_error(traj.alpha_pde_frames[:, :, t_idx].T)
                layer_err_list.append((height, pg.error_layer))
                self._log(f"layer error {pg.error_layer:.4f}")
            prev_X = {k: v.copy() for k, v in x.items()}

            if melt is not None:
                # advance the sliding window (test.py:551-554)
                melt["melt_left"] += melt["gap"]
                melt["melt_right"] += melt["gap"]
                melt["melt_extra"] += melt["gap"]

            # <5> next-step inputs: grain centers + fresh edge lengths
            for grain, coor in pg.region_center.items():
                if domain_factor > 1:
                    x["grain"][grain - 1, :2] = (
                        np.asarray(coor) * domain_factor
                    ) % 1  # test.py:556-559
                else:
                    x["grain"][grain - 1, :2] = coor
            edge_attr = {}
            for et, key in ((schema.EDGE_TYPES[0], "push"),
                            (schema.EDGE_TYPES[1], "pull"),
                            (schema.EDGE_TYPES[2], "connect")):
                e = edges[key]
                src_t, dst_t = et[0], et[-1]
                src_x = x[src_t][e[0], :2]
                dst_x = x[dst_t][e[1], :2]
                rel = src_x - dst_x
                rel += -1.0 * (rel > 0.5) + 1.0 * (rel < -0.5)
                edge_attr[et] = np.sqrt(np.sum(rel**2, axis=1))[:, None]

        elapsed = time.time() - t_start

        # ---- final QoIs (test.py:584-601) -------------------------------
        result = {
            "inference_time": elapsed,
            "alpha_field_list": alpha_field_list if collect_fields else None,
            "grain_acc_list": grain_acc_list,
            "layer_err_list": layer_err_list,
            "final_layer_error": layer_err_list[-1][1] if layer_err_list else None,
            "mean_layer_error": float(np.mean([e for _, e in layer_err_list])) if layer_err_list else None,
            "events_tp": grain_acc_list[-1][3],
            "events_truth": grain_acc_list[-1][1],
            "events_pred": grain_acc_list[-1][2],
            "num_grains_final": len(x["grain"]),
            "num_grains_live": int((mask["grain"][:, 0] > 0).sum()),
            "event_steps": event_steps,
        }
        delta_h = (
            (final_height - traj.ini_height) / traj.mesh_size / (frames_total - 1) * span
        )
        vol_pred = volume_graph(area_traj, extraV_traj, num_regions, delta_h)
        result["misorientation"] = misorientation_curve(theta_z, vol_pred)
        if compare and hasattr(traj, "totalV_frames"):
            vol_truth = volume_truth(
                traj.totalV_frames, traj.extraV_frames, span, frames_total,
                traj.ini_height, final_height, traj.mesh_size,
                traj.imagesize[0], frame_ratio,
            )
            ks, p, err_mu = size_distribution_ks(
                vol_pred[-1], vol_truth[-1], traj.mesh_size
            )
            result.update({"KS": ks, "KS_p": p, "size_err": err_mu})
        return result
