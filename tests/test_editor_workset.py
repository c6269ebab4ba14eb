"""Working-set editor exactness: rollout.editor_workset.workset_update must
reproduce topology_jit.update_jit bit-for-bit on the real seed fixture —
including under heavy elimination cascades (forced deletions, two-sided
cleanup) and at saturating switch rates, where the fallback paths engage."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graingraphnn_tpu.data import extraction
from graingraphnn_tpu.models import grain_nn, hyper
from graingraphnn_tpu.rollout import device_rollout as dr
from graingraphnn_tpu.rollout import editor_workset as ew
from graingraphnn_tpu.rollout import topology_jit as tj

from test_device_rollout import make_traj


@pytest.fixture(scope="module")
def setup():
    hp_r = hyper.regressor(0, layer_size=16)
    hp_c = hyper.classifier_transfered(1, layer_size=16)
    rp = grain_nn.init_regressor(jax.random.PRNGKey(0), hp_r)
    cp = grain_nn.init_classifier(jax.random.PRNGKey(1), hp_c,
                                  regressor_params=rp)
    traj = make_traj()
    hg0 = extraction.make_test_sample(traj, span=6)
    return rp, hp_r, cp, hp_c, hg0


def _edit_inputs(rp, hp_r, cp, hp_c, state, r_threshold):
    sample, y_r, y_c, _ = dr.forward_stage(rp, hp_r, cp, hp_c, state,
                                           tj.RING_MAX)
    xg, xj = dr.integrate_stage(state, y_r["joint"], y_r["grain"], 6)
    ge, _ = dr.elim_candidates(state, y_r["grain_area"], r_threshold)
    jj_live = state.E_pp[0] >= 0
    logits = jnp.where(jj_live, y_c["edge_event"], dr.NEG)
    tstate = tj.TopoState(
        E_pp=state.E_pp, E_pq=state.E_pq, xj=xj, y_joint=y_r["joint"],
        mask_g=state.mask_g, mask_j=state.mask_j, append_ptr=state.n_pp,
    )
    return tstate, logits, ge, y_r["grain"]


def _assert_equal_updates(tstate, logits, ge, y_grain, ct, NG, **ws_kwargs):
    full, sw_f, ex_f = tj.update_jit(
        tstate, logits, ge, y_grain, ct, NG)
    mini, sw_m, ex_m = jax.jit(
        lambda s, l, g, y: ew.workset_update(s, l, g, y, ct, NG,
                                             **ws_kwargs)
    )(tstate, logits, ge, y_grain)
    for f in ("E_pp", "E_pq", "xj", "mask_g", "mask_j", "append_ptr"):
        a = np.asarray(getattr(full, f))
        b = np.asarray(getattr(mini, f))
        assert (a == b).all(), (f, np.argwhere(a != b)[:5])
    assert (np.asarray(sw_f) == np.asarray(sw_m)).all()
    assert (np.asarray(ex_f) == np.asarray(ex_m)).all()
    return full


def test_workset_matches_full_editor_across_thresholds(setup):
    rp, hp_r, cp, hp_c, hg0 = setup
    st = dr.state_from_heterograph(hg0)
    NG = st.xg.shape[0]
    # (c_threshold, r_threshold): quiet, switch-heavy, cascade-heavy
    for ct, rt in ((0.99, 1e-4), (0.5, 1e-4), (0.5, 0.05), (0.3, 0.2)):
        tstate, logits, ge, y_g = jax.jit(
            lambda s: _edit_inputs(rp, hp_r, cp, hp_c, s, rt))(st)
        _assert_equal_updates(tstate, logits, ge, y_g, ct, NG)


def test_workset_multi_step_rollout_identical(setup):
    """Chained spans: feed each span's workset result into the next and
    keep asserting equality (structure drift would compound)."""
    rp, hp_r, cp, hp_c, hg0 = setup
    st = dr.state_from_heterograph(hg0)
    NG = st.xg.shape[0]
    for k in range(4):
        tstate, logits, ge, y_g = jax.jit(
            lambda s: _edit_inputs(rp, hp_r, cp, hp_c, s, 0.02))(st)
        full = _assert_equal_updates(tstate, logits, ge, y_g, 0.6, NG)
        E_pp, n_pp = dr.compact_stage(full.E_pp)
        st = st._replace(
            xj=full.xj, E_pp=E_pp, E_pq=full.E_pq,
            mask_g=full.mask_g, mask_j=full.mask_j, n_pp=n_pp,
            pull_cols=None, push_cols=None, connect_cols=None)


def test_workset_small_caps_fall_back_exactly(setup):
    """Tiny workset capacities force the fallback cond: still exact."""
    rp, hp_r, cp, hp_c, hg0 = setup
    st = dr.state_from_heterograph(hg0)
    NG = st.xg.shape[0]
    tstate, logits, ge, y_g = jax.jit(
        lambda s: _edit_inputs(rp, hp_r, cp, hp_c, s, 0.05))(st)
    _assert_equal_updates(tstate, logits, ge, y_g, 0.5, NG, wq=160, wp=160)


def test_workset_dead_tail_invariant_detected(setup):
    """A live last E_pq column (legacy states without the padded tail)
    must route to the full editor, not silently corrupt."""
    rp, hp_r, cp, hp_c, hg0 = setup
    st = dr.state_from_heterograph(hg0)
    NG = st.xg.shape[0]
    tstate, logits, ge, y_g = jax.jit(
        lambda s: _edit_inputs(rp, hp_r, cp, hp_c, s, 1e-4))(st)
    # make the tail live: workset must fall back and stay exact
    bad = tstate._replace(
        E_pq=tstate.E_pq.at[:, -1].set(jnp.asarray([0, 0])))
    full, sw_f, ex_f = tj.update_jit(bad, logits, ge, y_g, 0.6, NG)
    mini, sw_m, ex_m = ew.workset_update(bad, logits, ge, y_g, 0.6, NG)
    for f in ("E_pp", "E_pq", "mask_g", "mask_j"):
        assert (np.asarray(getattr(full, f))
                == np.asarray(getattr(mini, f))).all(), f
