"""The COMPOSED multi-chip partitioned rollout (halo-striped span forward
-> column-sharded editor -> shared ELL rebuild/finalize) must reproduce the
single-device device_rollout trajectory span for span — on the real
seed10020 case with the shipped weights (full horizon) and on a 240 um
generate-mode Voronoi synthetic (25k edges, incremental ELL maintenance
active). VERDICT r4 task 1; runs on the virtual 8-device CPU mesh."""

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graingraphnn_tpu.data import extraction, heterograph
from graingraphnn_tpu.graph import schema, synthetic
from graingraphnn_tpu.models import grain_nn, hyper
from graingraphnn_tpu.parallel import mesh as mesh_mod
from graingraphnn_tpu.parallel import partitioned_rollout as pr
from graingraphnn_tpu.rollout import device_driver as dd
from graingraphnn_tpu.rollout import device_rollout as dr

CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", "data_cache")


@pytest.fixture(scope="module")
def real_models():
    rp, hp_r, _ = __import__(
        "graingraphnn_tpu.train.checkpoint", fromlist=["load"]
    ).load("artifacts/40um/regressor0")
    cp, hp_c, extra = __import__(
        "graingraphnn_tpu.train.checkpoint", fromlist=["load"]
    ).load("artifacts/40um/classifier1")
    return rp, hp_r, cp, hp_c, extra.get("threshold", 0.6)


def _assert_trajectory_equal(st1, st_ref, aux, aux_ref):
    """Discrete structures bit-equal; positions allclose (the striped
    forward reorders float accumulations -> fp-noise-level drift)."""
    for name in ("E_pp", "E_pq", "mask_g", "mask_j", "n_pp",
                 "pull_cols", "push_cols", "connect_cols"):
        a, b = getattr(st1, name), getattr(st_ref, name)
        if a is None or b is None:
            assert a is None and b is None, name
            continue
        a, b = np.asarray(a), np.asarray(b)
        assert (a == b).all(), (name, np.argwhere(a != b)[:5])
    for key in ("switching", "grain_events", "extra_events"):
        a = np.stack(aux[key]) if isinstance(aux[key], (list,)) else aux[key]
        b = np.asarray(aux_ref[key])
        assert (np.asarray(a) == b).all(), key
    np.testing.assert_allclose(
        np.asarray(st1.xj), np.asarray(st_ref.xj), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(st1.xg), np.asarray(st_ref.xg), atol=2e-5)


def test_composed_rollout_matches_device_seed10020(real_models):
    """Full horizon (20 spans, ~140 switches + ~70 eliminations) on the
    real 40 um PF case, D=4 stripes."""
    rp, hp_r, cp, hp_c, ct = real_models
    traj = extraction.TrajectoryExtractor(lxd=40, seed=10020, frames=121)
    traj.match_graph = False
    traj.extract("/root/reference/rawdat_PF/40_40", cache_dir=CACHE_DIR)
    hg0 = extraction.make_test_sample(traj, span=6)
    st0 = dr.state_from_heterograph(hg0)

    N, D = 20, 4
    mesh = mesh_mod.make_mesh([("gp", D)], n_devices=D)
    roll = pr.PartitionedRollout(rp, hp_r, cp, hp_c, mesh, span=6,
                                 c_threshold=ct)
    st1, aux = roll.run(st0, N)
    run = dr.make_rollout_scan(rp, hp_r, cp, hp_c, n_steps=N,
                               c_threshold=ct)
    st_ref, aux_ref = run(st0)
    assert not bool(np.asarray(aux_ref["ring_overflow"]).any())
    # real events fired (the loop is exercised, not a no-op chain)
    n_switch = sum(int((np.asarray(s)[:, 0] >= 0).sum())
                   for s in aux["switching"])
    n_elim = sum(int((g >= 0).sum()) for g in aux["grain_events"])
    assert n_switch > 50 and n_elim > 30, (n_switch, n_elim)
    _assert_trajectory_equal(st1, st_ref, aux, aux_ref)


def _state_240um():
    """240 um generate-mode Voronoi (4176 grains, ~25k jj edges — past the
    crossbar cap, so the state carries persistent ELL structures and the
    composed finalize runs incremental maintenance). Cached: the Voronoi
    raster + tensorize costs ~60 s."""
    cache = os.path.join(CACHE_DIR, "partrollout_240um_state_v2.pkl")
    if os.path.exists(cache):
        with open(cache, "rb") as f:
            fields, offs = pickle.load(f)
        return dr.DeviceRolloutState(*[
            jnp.asarray(a) if a is not None else None
            for a in fields]), offs
    traj = extraction.TrajectoryExtractor(
        lxd=240, seed=1, frames=121, bc="periodic",
        physical_params={"G": 4.0, "R": 1.0})
    ids, counts = np.unique(traj.alpha_field, return_counts=True)
    traj.area_counts = dict(zip(ids, counts))
    traj.area_traj.append(dict(traj.area_counts))
    traj.states.append(heterograph.tensorize(traj, 0))
    hg0 = extraction.make_test_sample(traj, span=6)
    gx_phys = np.asarray(hg0.feature_dicts["grain"], float)[:, 0]
    st0, off_j, fac = dd.init_scaled_state(hg0, traj)
    offs = (np.floor(gx_phys * fac), off_j[:, 0], fac)
    os.makedirs(CACHE_DIR, exist_ok=True)
    with open(cache, "wb") as f:
        pickle.dump(([np.asarray(a) if a is not None else None
                      for a in st0], offs), f)
    return st0, offs


def test_composed_rollout_matches_device_240um(real_models):
    """240 um-scale synthetic on the FULL virtual 8-mesh: 5 spans with
    dense events (24 switches + 8 eliminations per span at the shipped
    threshold); span 0's ~20k-edge footprint exercises the
    size-up-and-rerun workset protocol, the incremental
    pull/push/connect structures are maintained through the composed
    finalize, and the forward stripes by PHYSICAL x (patch offsets,
    wrap-maintained per span) — the scaled torus caps D at 4, physical
    striping lifts it to 8+."""
    rp, hp_r, cp, hp_c, ct = real_models
    st0, offs = _state_240um()
    assert st0.pull_cols is not None  # incremental path active

    D = 8
    mesh = mesh_mod.make_mesh([("gp", D)], n_devices=D)
    roll = pr.PartitionedRollout(rp, hp_r, cp, hp_c, mesh, span=6,
                                 c_threshold=ct, wq=8192, wp=8192,
                                 stripe_offsets=offs)
    st1, aux = roll.run(st0, 5)
    assert aux["editor_retries"][0] > 0  # span-0 workset grew (protocol)
    n_switch = sum(int((np.asarray(s)[:, 0] >= 0).sum())
                   for s in aux["switching"])
    assert n_switch > 50, n_switch

    run = dr.make_rollout_scan(rp, hp_r, cp, hp_c, n_steps=5,
                               c_threshold=ct)
    st_ref, aux_ref = run(st0)
    assert not bool(np.asarray(aux_ref["ring_overflow"]).any())
    _assert_trajectory_equal(st1, st_ref, aux, aux_ref)


def test_composed_rollout_workset_retry_from_tiny():
    """Injected workset overflow: a floor-sized initial workset must trip
    `invalid`, double until it fits, and still produce the exact
    single-device result — the documented size-up-and-rerun protocol
    (sharded_editor.py:28-29), now implemented and loud."""
    feats, ei, _ew, masks, _ = synthetic.brick_wall_arrays(ng=128, seed=3)
    x = {"grain": feats["grain"], "joint": feats["joint"]}
    edges = {"pull": np.asarray(ei[schema.EDGE_TYPES[1]], np.int64),
             "connect": np.asarray(ei[schema.EDGE_TYPES[2]], np.int64)}
    mask = {"grain": masks["grain"].reshape(-1).astype(np.int64),
            "joint": masks["joint"].reshape(-1).astype(np.int64)}
    st0 = dr.init_device_state(x, edges, mask)

    hp_r = hyper.regressor(0, layer_size=16)
    hp_c = hyper.classifier_transfered(1, layer_size=16)
    rp = grain_nn.init_regressor(jax.random.PRNGKey(0), hp_r)
    cp = grain_nn.init_classifier(jax.random.PRNGKey(1), hp_c,
                                  regressor_params=rp)
    # spread the random-init edge-event logits so threshold margins
    # dominate the striped forward's fp noise; threshold at the largest
    # gap among the top candidates -> a few real switches per span
    cp = dict(cp)
    cp["lin2"] = {"w": cp["lin2"]["w"] * 8.0, "b": cp["lin2"]["b"]}
    sample, _ = dr.make_sample(st0)
    y_c = grain_nn.apply_classifier(cp, hp_c, sample)
    Epp = np.asarray(st0.E_pp)
    cand = (Epp[0] < Epp[1]) & (Epp[0] >= 0)
    lgs = np.sort(np.asarray(y_c["edge_event"])[cand])[::-1]
    gaps = lgs[:5] - lgs[1:6]
    k = int(np.argmax(gaps))
    assert gaps[k] > 1e-3
    ct = float(jax.nn.sigmoid((lgs[k] + lgs[k + 1]) / 2))

    D = 8
    mesh = mesh_mod.make_mesh([("gp", D)], n_devices=D)
    roll = pr.PartitionedRollout(rp, hp_r, cp, hp_c, mesh, span=6,
                                 c_threshold=ct, wq=16, wp=16)
    assert roll._wp >= 128  # floored to a traceable width
    floor = roll._wp
    st1, aux = roll.run(st0, 3)
    assert aux["editor_retries"][0] > 0
    assert roll._wp > floor  # the grown workset persisted

    run = dr.make_rollout_scan(rp, hp_r, cp, hp_c, n_steps=3,
                               c_threshold=ct)
    st_ref, aux_ref = run(st0)
    _assert_trajectory_equal(st1, st_ref, aux, aux_ref)
