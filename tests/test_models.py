"""Model-level checks: exact parameter-count parity with the reference
logfiles, forward shapes/ranges, jit + vmap compatibility."""

import jax
import jax.numpy as jnp
import numpy as np

from graingraphnn_tpu.graph import schema, state
from graingraphnn_tpu.models import grain_nn, hyper
from tests.util import synthetic_sample


def test_regressor_param_count_matches_reference():
    # model/regressor0_logfile: "total number of trained parameters 1204612"
    hp = hyper.regressor(0)
    params = grain_nn.init_regressor(jax.random.PRNGKey(0), hp)
    assert grain_nn.count_params(params) == 1_204_612


def test_classifier_param_count_matches_reference():
    # model/classifier1_logfile: "total number of trained parameters 1204806"
    hp = hyper.classifier_transfered(1)
    params = grain_nn.init_classifier(jax.random.PRNGKey(0), hp)
    assert grain_nn.count_params(params) == 1_204_806


def test_hyper_grid_decode():
    hp = hyper.regressor(0)
    assert (hp.lr, hp.layer_size, hp.batch_size, hp.decay_step) == (
        50e-4, 96, 4, 10,
    )
    hp = hyper.classifier_transfered(1)
    assert hp.lr == 25e-4 and hp.layer_size == 96 and hp.batch_size == 32
    assert hp.window == 3 and hp.epoch == 20


def test_regressor_forward_shapes_and_ranges():
    hp = hyper.regressor(0, layer_size=16)
    params = grain_nn.init_regressor(jax.random.PRNGKey(0), hp)
    s = synthetic_sample(ng=16, nj=32)
    y = grain_nn.apply_regressor(params, hp, s)
    assert y["joint"].shape == (32, 2)
    assert y["grain"].shape == (16, 2)
    assert y["grain_area"].shape == (16,)
    assert np.all(np.abs(np.asarray(y["joint"])) <= 1.0)
    assert np.all(np.asarray(y["grain"][:, 1]) >= 0.0)
    # grain_area = tanh(darea)/20 + area_old (models.py:445-446)
    np.testing.assert_allclose(
        np.asarray(y["grain_area"]),
        np.asarray(
            y["grain"][:, 0] / schema.TARGET_SCALING["grain"]
            + s.grain_x[:, schema.GRAIN_AREA_COL]
        ),
        atol=1e-6,
    )


def test_classifier_forward_shapes():
    hp = hyper.classifier_transfered(1, layer_size=16)
    params = grain_nn.init_classifier(jax.random.PRNGKey(0), hp)
    s = synthetic_sample(ng=16, nj=32)
    y = grain_nn.apply_classifier(params, hp, s)
    assert y["edge_event"].shape == (s.num_jj_edges,)
    assert y["edge"].shape == (s.num_jj_edges, 2)


def test_jit_and_vmap():
    hp = hyper.regressor(0, layer_size=8)
    params = grain_nn.init_regressor(jax.random.PRNGKey(0), hp)
    samples = [synthetic_sample(ng=16, nj=32, seed=i) for i in range(3)]
    batch = state.stack(samples)

    fwd = jax.jit(jax.vmap(lambda s: grain_nn.apply_regressor(params, hp, s)))
    y = fwd(batch)
    assert y["joint"].shape == (3, 32, 2)

    y0 = grain_nn.apply_regressor(params, hp, samples[0])
    np.testing.assert_allclose(
        np.asarray(y["joint"][0]), np.asarray(y0["joint"]), rtol=1e-5, atol=1e-5
    )


def test_classifier_transfer_copies_regressor_trunk():
    hp_r = hyper.regressor(0, layer_size=8)
    hp_c = hyper.classifier_transfered(1, layer_size=8)
    rp = grain_nn.init_regressor(jax.random.PRNGKey(0), hp_r)
    cp = grain_nn.init_classifier(jax.random.PRNGKey(1), hp_c, regressor_params=rp)
    r_leaf = rp["encoder"][0]["conv"]["push"]["key"]["w"]
    c_leaf = cp["encoder"][0]["conv"]["push"]["key"]["w"]
    np.testing.assert_array_equal(np.asarray(r_leaf), np.asarray(c_leaf))


def test_grad_flows():
    hp = hyper.regressor(0, layer_size=8)
    params = grain_nn.init_regressor(jax.random.PRNGKey(0), hp)
    s = synthetic_sample(ng=16, nj=32)

    def loss(p):
        y = grain_nn.apply_regressor(p, hp, s)
        return jnp.mean(y["joint"] ** 2) + jnp.mean(y["grain"] ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)


def test_regressor_history_branch():
    hp = hyper.regressor(0, layer_size=8, history=True, window=1)
    params = grain_nn.init_regressor(jax.random.PRNGKey(0), hp)
    s = synthetic_sample(ng=16, nj=32)
    y = grain_nn.apply_regressor(params, hp, s)
    assert y["joint"].shape == (32, 2)
    assert "lstm" in params


def test_regressor_edge_len_head():
    hp = hyper.regressor(0, layer_size=8, edge_len=True)
    params = grain_nn.init_regressor(jax.random.PRNGKey(0), hp)
    s = synthetic_sample(ng=16, nj=32)
    y = grain_nn.apply_regressor(params, hp, s)
    assert y["edge"].shape == (s.num_jj_edges,)
    assert np.all(np.abs(np.asarray(y["edge"])) <= 1.0)


def test_two_layer_stack_uses_sage_cells():
    hp = hyper.regressor(0, layer_size=8, layers=2)
    assert hp.cell_kinds == ("pgclstm", "sage")
    params = grain_nn.init_regressor(jax.random.PRNGKey(0), hp)
    assert len(params["encoder"]) == 2
    s = synthetic_sample(ng=16, nj=32)
    y = grain_nn.apply_regressor(params, hp, s)
    assert y["joint"].shape == (32, 2)
    assert np.isfinite(np.asarray(y["joint"])).all()


def test_no_attention_ablation_differs():
    """periodconv.py twin: attention disabled -> plain masked neighbor sum."""
    from graingraphnn_tpu.ops import period_conv as pc
    s = synthetic_sample(ng=16, nj=32)
    params = pc.init_period_conv(jax.random.PRNGKey(3), 8, 11, 8, 1)
    out_a = pc.apply_period_conv(
        params, s.joint_x, s.grain_x, s.pull_nbr, s.pull_len, s.pull_mask,
        num_gates=1, out_channels=8, attention=True)
    out_n = pc.apply_period_conv(
        params, s.joint_x, s.grain_x, s.pull_nbr, s.pull_len, s.pull_mask,
        num_gates=1, out_channels=8, attention=False)
    assert np.isfinite(np.asarray(out_n)).all()
    assert np.abs(np.asarray(out_a) - np.asarray(out_n)).max() > 1e-4


def test_non_recurrent_pgc_cell():
    from graingraphnn_tpu.models import cells
    from graingraphnn_tpu.graph import schema
    s = synthetic_sample(ng=16, nj=32)
    params = cells.init_pgc(jax.random.PRNGKey(4), schema.GRAIN_DIM, schema.JOINT_DIM, 8)
    state = cells.zero_state(s, 8)
    h, c = cells.apply_pgc(params, s, s.grain_x, s.joint_x, state, 8)
    assert h["grain"].shape == (16, 8) and h["joint"].shape == (32, 8)
    assert np.all(np.asarray(h["grain"]) >= 0)  # ReLU activation
