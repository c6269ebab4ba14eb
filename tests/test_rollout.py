"""Rollout engine smoke tests (CPU, random weights, generate-mode — no PF
data needed): the full <1>-<5> step machinery must run, preserve invariants,
and produce finite QoIs for periodic and noflux boundaries, with both
editors."""

import jax
import numpy as np
import pytest

from graingraphnn_tpu.data import extraction, heterograph
from graingraphnn_tpu.models import grain_nn, hyper
from graingraphnn_tpu.rollout.engine import RolloutEngine


def make_traj(bc="periodic", seed=5):
    traj = extraction.TrajectoryExtractor(
        lxd=40, seed=seed, frames=121, bc=bc,
        physical_params={"G": 4.0, "R": 1.0},
    )
    ids, counts = np.unique(traj.alpha_field, return_counts=True)
    traj.area_counts = dict(zip(ids, counts))
    traj.area_traj.append(dict(traj.area_counts))
    traj.states.append(heterograph.tensorize(traj, 0))
    return traj


@pytest.fixture(scope="module")
def models():
    hp_r = hyper.regressor(0, layer_size=16)
    hp_c = hyper.classifier_transfered(1, layer_size=16)
    rp = grain_nn.init_regressor(jax.random.PRNGKey(0), hp_r)
    cp = grain_nn.init_classifier(jax.random.PRNGKey(1), hp_c, regressor_params=rp)
    return rp, hp_r, cp, hp_c


@pytest.mark.parametrize("bc", ["periodic", "noflux"])
def test_rollout_runs(models, bc):
    rp, hp_r, cp, hp_c = models
    traj = make_traj(bc)
    hg0 = extraction.make_test_sample(traj, span=6)
    eng = RolloutEngine(rp, hp_r, cp, hp_c, c_threshold=0.99)
    res = eng.run(hg0, traj, span=6, compare=False, growth_height=4.8,
                  reconstruct=True)
    assert np.isfinite(res["misorientation"]).all()
    assert res["inference_time"] > 0


def test_rollout_jit_editor(models):
    rp, hp_r, cp, hp_c = models
    traj = make_traj("periodic")
    hg0 = extraction.make_test_sample(traj, span=6)
    eng = RolloutEngine(rp, hp_r, cp, hp_c, c_threshold=0.99, jit_editor=True)
    res = eng.run(hg0, traj, span=6, compare=False, growth_height=4.8)
    assert np.isfinite(res["misorientation"]).all()


def test_rollout_jit_editor_nucleation(models):
    """Generate-mode nucleation through the device-side editor: grains must
    be inserted (same RNG stream as the host editor) and QoIs stay finite."""
    rp, hp_r, cp, hp_c = models
    density = 20.0  # per-joint prob ~ density*lxd^2*dz/NJ — high enough to fire

    traj_h = make_traj("periodic")
    n0 = len(traj_h.states[0].feature_dicts["grain"])
    hg0 = extraction.make_test_sample(traj_h, span=6)
    eng_h = RolloutEngine(rp, hp_r, cp, hp_c, c_threshold=0.99, seed=11)
    res_h = eng_h.run(hg0, traj_h, span=6, compare=False, growth_height=4.8,
                      nucleation_density=density, reconstruct=False)

    traj_j = make_traj("periodic")
    hg0 = extraction.make_test_sample(traj_j, span=6)
    eng_j = RolloutEngine(rp, hp_r, cp, hp_c, c_threshold=0.99, seed=11,
                          jit_editor=True)
    res_j = eng_j.run(hg0, traj_j, span=6, compare=False, growth_height=4.8,
                      nucleation_density=density, reconstruct=False)

    # both paths nucleated (grain arrays grew) with the same RNG stream;
    # positions drift (editor fp32 vs fp64) so counts may differ slightly
    assert res_h["num_grains_final"] > n0
    assert res_j["num_grains_final"] > n0
    assert np.isfinite(res_j["misorientation"]).all()


def test_ell_ring_growth():
    """Regression for the 120um mid-rollout crash ('degree overflow: dst 155
    has more than 16 neighbors'): as eliminations merge rings, a grain's
    degree can exceed DEFAULT_GRAIN_RING; the engine sizes the ELL ring
    capacity from the live degree distribution (engine._forward) in 8-wide
    buckets. build_ell must hard-fail below the true degree and succeed at
    the bucketed capacity."""
    from graingraphnn_tpu.graph import schema, state

    deg = schema.DEFAULT_GRAIN_RING + 2  # 18: one grain outgrows the default
    src = np.arange(deg, dtype=np.int64)          # joints 0..17 -> grain 0
    dst = np.zeros(deg, dtype=np.int64)
    attr = np.ones(deg)

    with pytest.raises(ValueError, match="degree overflow"):
        state.build_ell(src, dst, attr, num_dst=4, max_deg=schema.DEFAULT_GRAIN_RING)

    ring = max(schema.DEFAULT_GRAIN_RING, state.round_up(deg, 8))
    assert ring == 24
    nbr, length, mask = state.build_ell(src, dst, attr, num_dst=4, max_deg=ring)
    assert mask[0].sum() == deg
    np.testing.assert_array_equal(np.sort(nbr[0][mask[0] > 0]), src)


def test_rollout_jit_editor_meltpool(models):
    """Moving-meltpool active window through the device-side editor."""
    rp, hp_r, cp, hp_c = models
    meltpool = {"r0": 0.8, "z0": 0.4, "melt_pool_angle": np.pi / 4}

    traj = make_traj("periodic")
    hg0 = extraction.make_test_sample(traj, span=6)
    eng = RolloutEngine(rp, hp_r, cp, hp_c, c_threshold=0.99, jit_editor=True)
    res = eng.run(hg0, traj, span=6, compare=False, meltpool=meltpool,
                  reconstruct=False)
    assert np.isfinite(res["misorientation"]).all()


def test_clamp_gr_mitigation(models):
    """--clamp_gr (VERDICT round-2 item 8): thermal features clamped to the
    training hull must change inference on an out-of-hull case (G=4, R=1 vs
    the hull point G=1.904, R=0.558) and leave an in-hull case untouched."""
    rp, hp_r, cp, hp_c = models
    traj = make_traj("periodic")
    import copy

    state0 = copy.deepcopy(traj.states[0])

    def run(clamp):
        traj.states[0] = copy.deepcopy(state0)
        hg0 = extraction.make_test_sample(traj, span=6)
        eng = RolloutEngine(rp, hp_r, cp, hp_c, c_threshold=0.99)
        return eng.run(hg0, traj, span=6, compare=False, growth_height=4.8,
                       clamp_gr=clamp)

    res_off = run(None)
    res_on = run((1.904, 1.904, 0.558, 0.558))
    assert not np.allclose(res_on["misorientation"], res_off["misorientation"])
    # clamping to a hull that already contains the case is a no-op
    res_noop = run((0.0, 100.0, 0.0, 100.0))
    np.testing.assert_allclose(
        res_noop["misorientation"], res_off["misorientation"], rtol=1e-6)
