"""CLI driver for the device-resident rollout scan (reference loop:
test.py:353-577, device counterpart of rollout.engine.run).

The zero-host-transfer scan (rollout.device_rollout) previously existed only
for bench.py and the tests; this module makes the flagship throughput path
reachable from `cli.test --device_resident`: spans run on device in chunks
of `eval_every`, and QoIs (planar reconstruction, layer error vs the PF
truth, event accuracy, size-distribution KS) are pulled at that cadence —
the raster stays on host, the dynamics never leave the chip.

Capacity busts fail loudly: the scan's `ring_overflow` / `pp_overflow`
flags (silently-dropped edges) raise instead of producing QoIs on a
corrupted graph; `elim_saturated` (per-step elimination budget deferrals)
is surfaced in the result.

Scope matches device_rollout: periodic BC, with generate-mode nucleation
(round 4) and the moving melt pool's sliding active window (round 5:
melt_stage in the scan, active masks honored by BOTH the HLO and the
fused Pallas editor). Patch rescaling for domains larger than the
training patch (test.py:29-55,310-312) is applied on host before packing
the state.
"""

from __future__ import annotations

import time
from typing import Dict

import jax.numpy as jnp
import numpy as np

from ..graph import schema
from ..graph.planar import PlanarGraph
from . import device_rollout as dr
from .qoi import (
    event_hit_rate,
    misorientation_curve,
    size_distribution_ks,
    volume_graph,
    volume_truth,
)

TRAIN_FRAMES = 120   # test.py:190
TRAIN_DELTA_Z = 0.4  # test.py:191


def init_scaled_state(hg0, traj, *, pp_cap=None, nucleation_slack=0):
    """Patch-rescaled device state from a test-mode HeteroState
    (engine.run:282-324 / test.py:29-55,310-312): for domains larger than
    the 40 um training patch, local geometry is scaled to the training
    distribution with per-joint offsets kept for reconstruction in global
    coordinates. Returns (state, offset_j, domain_factor)."""
    x = {
        "grain": np.array(hg0.feature_dicts["grain"], dtype=np.float64),
        "joint": np.array(hg0.feature_dicts["joint"], dtype=np.float64),
    }
    edges = {
        "pull": np.array(hg0.edge_index_dicts[schema.EDGE_TYPES[1]], np.int64),
        "connect": np.array(hg0.edge_index_dicts[schema.EDGE_TYPES[2]], np.int64),
    }
    live = edges["connect"][0] > -1
    edges["connect"] = edges["connect"][:, live]
    mask = {
        "grain": np.array(hg0.mask["grain"], np.int64).reshape(-1),
        "joint": np.ones(len(x["joint"]), np.int64),
    }

    domain_factor = traj.lxd / traj.patch_size
    offset_j = np.zeros((len(x["joint"]), 2))
    if domain_factor > 1:
        x["grain"][:, :2] *= domain_factor
        x["joint"][:, :2] *= domain_factor
        offset_j = np.floor(x["joint"][:, :2])
        x["joint"][:, :2] -= offset_j
        x["grain"][:, :2] -= x["grain"][:, :2] - x["grain"][:, :2] % 1

    st = dr.init_device_state(
        {k: v.astype(np.float32) for k, v in x.items()}, edges,
        {"grain": mask["grain"], "joint": mask["joint"]}, pp_cap=pp_cap,
        nucleation_slack=nucleation_slack,
    )
    return st, offset_j, domain_factor


def run_device_resident(
    hg0,
    traj,
    reg_params,
    hp_r,
    cls_params,
    hp_c,
    *,
    span: int = 6,
    r_threshold: float = 1e-4,
    c_threshold: float = 0.6,
    eval_every: int = 1,
    compare: bool = True,
    reconstruct: bool = True,
    growth_height: float = -1.0,
    reconst_mesh_size: float = 0.08,
    pallas: bool = False,
    fused_editor: bool | None = None,
    verbose: bool = False,
    nucleation_density: float = 0.0,
    seed: int = 0,
    partition: int = 0,
    meltpool: Dict | None = None,
) -> Dict:
    # fused_editor=None: auto — the single-launch Pallas editor
    # (kernels.editor_pallas, bit-identical edits, ~2x step time) on TPU;
    # the HLO editor elsewhere (the fused core also runs as plain XLA but
    # costs more compile time than it saves on CPU)
    if fused_editor is None:
        import jax
        fused_editor = jax.devices()[0].platform == "tpu"
    if traj.BC != "periodic":
        raise ValueError("device-resident rollout covers periodic BC; "
                         "use the host engine for noflux")
    # meltpool: the moving melt pool's sliding active window (round 5:
    # melt_stage in the device scan + active-window masks in BOTH editors;
    # engine counterpart mirrors models.py:480-507 / test.py:315-324)
    nuc = nucleation_density > 0
    # generous headroom: nucleation events are rare (prob/joint ~1e-4)
    nuc_slack = 256 if nuc else 0
    st, offset_j, domain_factor = init_scaled_state(
        hg0, traj, nucleation_slack=nuc_slack)
    nuc_rng = np.random.default_rng(seed)

    pg = PlanarGraph(bc=traj.BC, imagesize=traj.imagesize)
    pg.raise_err = False
    num_regions = traj.num_regions
    theta_z = np.array(traj.theta_z)
    s_full = traj.patch_size / traj.mesh_size + 1
    imagesize = (
        (int(traj.lxd / reconst_mesh_size) + 1,
         int(traj.lyd / reconst_mesh_size) + 1)
        if reconstruct else (0, 0)
    )

    final_height = (traj.ini_height + growth_height if growth_height > 0
                    else traj.final_height)
    frames_total = int((final_height - traj.ini_height) / TRAIN_DELTA_Z) + 1
    melt_term = None
    melt_gap = 0.0
    if meltpool is not None:
        angle = meltpool["melt_pool_angle"]
        melt_gap = (span * TRAIN_DELTA_Z * np.cos(angle) ** 2
                    / np.tan(angle) / traj.lxd)
        win = (meltpool["r0"] - meltpool["z0"]) / np.tan(angle) / traj.lxd
        frames_total = int(np.floor((1 - win) / melt_gap)) * span + 1
        off_x = np.zeros(int(st.xj.shape[0]), np.float32)
        off_x[: len(offset_j)] = offset_j[:, 0]
        melt_term = {
            "r0": float(meltpool["r0"]), "z0": float(meltpool["z0"]),
            "win": float(win), "gap": float(melt_gap),
            "domain_factor": float(max(domain_factor, 1)),
            "offset_x": jnp.asarray(off_x),
            "n_off": int(len(offset_j)),
        }
    frame_ratio = getattr(traj, "train_test_frame_ratio", 1)
    frames = list(range(span, frames_total, span))

    area_traj = [dict(traj.area_traj[0])] if traj.area_traj else [{}]
    extraV_traj = []
    layer_err_list = []
    grain_event_list: list = []
    grain_acc_list = [(traj.ini_height, 0, 0, 0)]
    events_truth_sets = traj.grain_events if traj.grain_events else [set()] * frames_total

    def observe(state: dr.DeviceRolloutState, frame: int):
        """Host-side reconstruction + QoIs from a pulled device state
        (engine.gnn_update / graph_trajectory.GNN_update:1010-1103)."""
        xg = np.asarray(state.xg, np.float64)
        xj = np.asarray(state.xj, np.float64)
        mg = np.asarray(state.mask_g)
        mj = np.asarray(state.mask_j)
        E_pq = np.asarray(state.E_pq)
        E_pp = np.asarray(state.E_pp)

        pos_j = xj[:, :2].copy()
        if domain_factor > 1:
            n = len(offset_j)
            pos_j[:n] = (pos_j[:n] + offset_j) / domain_factor
        pg.vertices = {
            i: pos_j[i].tolist() for i in range(len(pos_j)) if mj[i] == 1
        }
        area_counts = {}
        area_sum = np.sum(xg[:, 3] * mg) / (traj.lxd / traj.patch_size) ** 2
        for idx in range(len(xg)):
            if mg[idx] > 0:
                area_counts[idx + 1] = xg[idx, 3] * s_full**2 / area_sum
        extraV_traj.append(
            mg * xg[:, 4] / schema.TARGET_SCALING["grain"] * s_full**3)
        if frame > 0:
            area_traj.append(area_counts)

        v2j: Dict[int, set] = {}
        live_q = E_pq[0] >= 0
        for j, g in E_pq[:, live_q].T:
            v2j.setdefault(int(j), set()).add(int(g) + 1)
        pg.joint2vertex = {tuple(sorted(v)): k for k, v in v2j.items()}
        pg.vertex2joint = {v: k for k, v in pg.joint2vertex.items()}
        live_p = E_pp[0] >= 0
        pg.edges = [[int(i), int(j)] for i, j in E_pp[:, live_p].T]
        pg.rebuild_regions()
        if reconstruct:
            pg.rasterize(imagesize)
        if compare:
            t_idx = min(frame // frame_ratio,
                        traj.alpha_pde_frames.shape[2] - 1)
            pg.layer_error(traj.alpha_pde_frames[:, :, t_idx].T)
            height = traj.ini_height + frame * TRAIN_DELTA_Z
            layer_err_list.append((height, pg.error_layer))
            if verbose:
                print(f"frame {frame}: layer error {pg.error_layer:.4f}")

    from ..rollout import topology_jit as tj

    nuc_density_term = (
        nucleation_density * traj.lxd * traj.lxd * TRAIN_DELTA_Z
        if nuc else 0.0)
    if partition:
        # composed multi-chip partitioned rollout (SURVEY §2.8): halo-
        # striped span forward + column-sharded editor + shared finalize
        # over a `partition`-device mesh (parallel.partitioned_rollout);
        # trajectory-equal to the single-device scan (tests)
        if nuc or melt_term is not None:
            raise ValueError("--partition covers the nucleation-free "
                             "static-meltpool rollout; nucleation and the "
                             "moving melt pool run on the single-device "
                             "scan")
        if pallas:
            raise ValueError("--partition uses the striped XLA forward; "
                             "--pallas applies to the single-device scan")
        from ..parallel import mesh as mesh_mod
        from ..parallel import partitioned_rollout as pro

        pmesh = mesh_mod.make_mesh([("gp", partition)],
                                   n_devices=partition)
        stripe_offsets = None
        if domain_factor > 1:
            # stripe by PHYSICAL x (scaled + patch offset over factor):
            # the scaled torus keeps the 40um interaction range whatever
            # the domain size, capping D at ~4; physical striping lets D
            # scale with the domain (PartitionedRollout docstring)
            gx_phys = np.asarray(hg0.feature_dicts["grain"], float)[:, 0]
            off_gx = np.floor(gx_phys * domain_factor)
            stripe_offsets = (off_gx, offset_j[:, 0], domain_factor)
        roll = pro.PartitionedRollout(
            reg_params, hp_r, cls_params, hp_c, pmesh, span=span,
            r_threshold=r_threshold, c_threshold=c_threshold,
            stripe_offsets=stripe_offsets)

        def run_chunk(s, melt_lefts=None):
            return roll.run(s, eval_every)
    else:
        run_chunk = dr.make_rollout_scan(
            reg_params, hp_r, cls_params, hp_c,
            n_steps=eval_every, r_threshold=r_threshold,
            c_threshold=c_threshold, span=span, pallas=pallas,
            fused_editor=fused_editor, nuc_density_term=nuc_density_term,
            melt_term=melt_term,
        )

    # frame-0 observation: seeds area/extraV trajectories (volume_graph
    # indexes them aligned) and, under compare, the layer-error baseline
    pg0 = dr.DeviceRolloutState(
        xg=st.xg, xj=st.xj, E_pp=st.E_pp, E_pq=st.E_pq,
        mask_g=st.mask_g, mask_j=st.mask_j, n_pp=st.n_pp)
    observe(pg0, 0)
    if compare:
        layer_err_list[:] = [(traj.ini_height, layer_err_list[-1][1])]

    t0 = time.time()
    saturated_steps = 0
    done = 0
    NJcap = int(st.xj.shape[0])
    while done < len(frames):
        melt_lefts = None
        if melt_term is not None:
            # the window advances by `gap` AFTER each span (engine
            # :686-688): global step t uses melt_left = t * gap
            melt_lefts = jnp.asarray(
                (done + np.arange(eval_every)) * melt_gap, jnp.float32)
        if nuc:
            # per-step uniforms for the whole chunk (device-resident scan
            # consumes them as xs); capacity-width draws — the stream
            # deviates from the host engine's live-count-width draws, so
            # cross-path event parity is certified by the oracle test
            # (test_device_scan_nucleation_matches_oracle), not by seeds
            rand = nuc_rng.random((eval_every, NJcap)).astype(np.float32)
            angles = nuc_rng.random(
                (eval_every, tj.MAX_NUC, 2)).astype(np.float32)
            st, aux = run_chunk(st, jnp.asarray(rand), jnp.asarray(angles),
                                melt_lefts)
        else:
            st, aux = run_chunk(st, melt_lefts=melt_lefts)
        ge = np.asarray(aux["grain_events"])      # [chunk, MAX_ELIM]
        extra = np.asarray(aux["extra_events"])   # [chunk, MAX_EXTRA]
        for flag in (("ring_overflow", "pp_overflow", "nuc_overflow")
                     if nuc else ("ring_overflow", "pp_overflow")):
            hits = np.asarray(aux[flag])
            if bool(hits.any()):
                raise RuntimeError(
                    f"device rollout capacity bust: {flag} at step "
                    f"{done + int(np.argmax(hits))} — raise ring/pp_cap")
        saturated_steps += int(np.asarray(aux["elim_saturated"]).sum())

        steps_here = min(eval_every, len(frames) - done)
        for k in range(steps_here):
            grain_event_list.extend(int(g) for g in ge[k] if g >= 0)
            grain_event_list.extend(int(g) for g in extra[k] if g >= 0)
        done += steps_here
        frame = frames[done - 1]
        observe(st, frame)

        truth = set()
        for s_ in events_truth_sets[: frame // frame_ratio + 1]:
            truth |= set(s_)
        truth = {int(i) - 1 for i in truth}
        tp, n_truth, n_pred = event_hit_rate(set(grain_event_list), truth)
        height = traj.ini_height + frame * TRAIN_DELTA_Z
        grain_acc_list.append((height, n_truth, n_pred, tp))
        if verbose:
            print(f"frame {frame}: events {tp}/{n_truth} (pred {n_pred})")
    elapsed = time.time() - t0

    result = {
        "inference_time": elapsed,
        "grain_acc_list": grain_acc_list,
        "layer_err_list": layer_err_list,
        "final_layer_error": layer_err_list[-1][1] if layer_err_list else None,
        "mean_layer_error": (float(np.mean([e for _, e in layer_err_list]))
                             if layer_err_list else None),
        "events_tp": grain_acc_list[-1][3],
        "events_truth": grain_acc_list[-1][1],
        "events_pred": grain_acc_list[-1][2],
        "elim_saturated_steps": saturated_steps,
        "num_grains_live": int(np.asarray(st.mask_g).sum()),
    }
    delta_h = ((final_height - traj.ini_height) / traj.mesh_size
               / (frames_total - 1) * span * eval_every)
    # nucleation grows the grain id range mid-rollout: size the volume
    # arrays to the largest snapshot; nucleated grains recover their
    # sampled orientation from the final device state (xg col 5 = cos
    # theta, mirroring engine.py's arccos(grain col 5) extension — the
    # reference extends theta_z the same way at test.py's GNN_update)
    n_vol = max([num_regions] + [len(v) for v in extraV_traj])
    vol_pred = volume_graph(area_traj, extraV_traj, n_vol, delta_h)
    theta_pad = np.zeros(n_vol + 1)
    theta_pad[: len(theta_z)] = theta_z
    if n_vol + 1 > len(theta_z):
        xg_final = np.asarray(st.xg)
        new_rows = xg_final[len(theta_z) - 1: n_vol, 5]
        theta_pad[len(theta_z):] = np.arccos(np.clip(new_rows, -1.0, 1.0))
    result["misorientation"] = misorientation_curve(theta_pad, vol_pred)
    if compare and hasattr(traj, "totalV_frames"):
        vol_truth = volume_truth(
            traj.totalV_frames, traj.extraV_frames, span, frames_total,
            traj.ini_height, final_height, traj.mesh_size,
            traj.imagesize[0], frame_ratio,
        )
        ks, p, err_mu = size_distribution_ks(
            vol_pred[-1], vol_truth[-1], traj.mesh_size)
        result.update({"KS": ks, "KS_p": p, "size_err": err_mu})
    return result
