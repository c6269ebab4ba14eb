"""Halo-exchange striped partitioning must match the single-device forward
on the REAL seed10020 graph (118 grains / 236 joints, periodic)."""

import jax
import numpy as np
import pytest

from graingraphnn_tpu.data import reference_io
from graingraphnn_tpu.graph import schema, state
from graingraphnn_tpu.models import grain_nn, hyper
from graingraphnn_tpu.parallel import halo, mesh as mesh_mod

FIXTURE = "/root/reference/graphs/40_40/seed10020_G1.904_R0.558_span6.pkl"


@pytest.fixture(scope="module")
def graph():
    return reference_io.heterograph_to_arrays(
        reference_io.load_sample_list(FIXTURE)[0]
    )


def test_halo_forward_matches_single_device(graph):
    a = graph
    hp = hyper.regressor(0, layer_size=8)
    params = grain_nn.init_regressor(jax.random.PRNGKey(0), hp)

    # single-device reference
    single = state.build_sample(
        a["features"], a["edge_index"], a["edge_weight"], a["mask"]
    )
    y_ref = grain_nn.apply_regressor(params, hp, single)

    D = 4  # stripe width 0.25 >> max edge length (~0.11)
    striped, meta = halo.build_striped(
        a["features"], a["edge_index"], a["edge_weight"], a["mask"], D
    )
    mesh = mesh_mod.make_mesh([("gp", D)], n_devices=D)
    fwd = halo.make_halo_forward(hp, mesh, model="regressor")
    y = fwd(params, striped)

    joint = meta.scatter_back(np.asarray(y["joint"]), "joint")
    grain = meta.scatter_back(np.asarray(y["grain"]), "grain")
    np.testing.assert_allclose(joint, np.asarray(y_ref["joint"]), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(grain, np.asarray(y_ref["grain"]), rtol=2e-5, atol=2e-5)


def test_halo_train_step_matches_single_device(graph):
    """Loss value and post-step params of the halo train step must match a
    single-device step on the same graph (gradients flow back through the
    ppermutes to the owning stripe)."""
    import optax

    from graingraphnn_tpu.train import loss as loss_mod

    a = graph
    hp = hyper.regressor(0, layer_size=8)
    params = grain_nn.init_regressor(jax.random.PRNGKey(0), hp)

    rng = np.random.default_rng(7)
    ng = len(a["features"]["grain"])
    nj = len(a["features"]["joint"])
    targets = {
        "grain": rng.normal(size=(ng, 2)).astype(np.float32) * 0.1,
        "joint": rng.normal(size=(nj, 2)).astype(np.float32) * 0.1,
    }

    tx = optax.sgd(1e-2)

    single = state.build_sample(
        a["features"], a["edge_index"], a["edge_weight"], a["mask"], targets
    )

    def loss_fn(p):
        return loss_mod.regressor_loss(grain_nn.apply_regressor(p, hp, single), single)

    l_ref, grads_ref = jax.value_and_grad(loss_fn)(params)
    updates, _ = tx.update(grads_ref, tx.init(params), params)
    import optax as _ox

    p_ref = _ox.apply_updates(params, updates)

    D = 4
    striped, _meta = halo.build_striped(
        a["features"], a["edge_index"], a["edge_weight"], a["mask"], D, targets
    )
    mesh = mesh_mod.make_mesh([("gp", D)], n_devices=D)
    step = halo.make_halo_train_step(hp, tx, mesh)
    p_halo, _opt, l_halo = step(params, tx.init(params), striped)

    np.testing.assert_allclose(float(l_halo), float(l_ref), rtol=1e-5)
    flat_ref = jax.tree_util.tree_leaves(p_ref)
    flat_halo = jax.tree_util.tree_leaves(p_halo)
    for r, h in zip(flat_ref, flat_halo):
        np.testing.assert_allclose(
            np.asarray(h), np.asarray(r), rtol=2e-4, atol=2e-6
        )


def test_halo_rejects_too_many_stripes(graph):
    a = graph
    with pytest.raises(ValueError, match="non-adjacent"):
        halo.build_striped(
            a["features"], a["edge_index"], a["edge_weight"], a["mask"], 16
        )


def test_halo_rollout_span_matches_single_device():
    """Multi-chip ROLLOUT leg (SURVEY §2.8): the engine with both forwards
    partitioned over halo stripes must roll the REAL seed10020 case out
    identically to the single-device engine — same trajectory, same events
    (the editor is replicated; only the forward is sharded)."""
    from graingraphnn_tpu.data import extraction
    from graingraphnn_tpu.rollout.engine import RolloutEngine
    from graingraphnn_tpu.train import checkpoint

    traj = extraction.TrajectoryExtractor(lxd=40, seed=10020, frames=121)
    traj.match_graph = False
    traj.extract("/root/reference/rawdat_PF/40_40", cache_dir="data_cache")
    params_r, hp_r, _ = checkpoint.load("artifacts/40um/regressor0")
    params_c, hp_c, _ = checkpoint.load("artifacts/40um/classifier1")

    import copy

    state0 = copy.deepcopy(traj.states[0])

    def run(halo):
        # make_test_sample mutates states[0] in place (append_history
        # grows feature columns); restore the pristine state per run
        traj.states[0] = copy.deepcopy(state0)
        hg0 = extraction.make_test_sample(traj, span=6)
        eng = RolloutEngine(params_r, hp_r, params_c, hp_c,
                            c_threshold=0.6, seed=10020, halo=halo)
        return eng.run(hg0, traj, span=6, compare=False, growth_height=14.4)

    res_single = run(None)
    D = 4
    mesh = mesh_mod.make_mesh([("gp", D)], n_devices=D)
    res_halo = run((mesh, D))

    assert res_halo["events_pred"] == res_single["events_pred"]
    assert res_halo["num_grains_live"] == res_single["num_grains_live"]
    np.testing.assert_allclose(
        res_halo["misorientation"], res_single["misorientation"],
        rtol=1e-4, atol=1e-5,
    )
