"""Column-sharded topology editor == replicated full-array editor, on the
real seed fixture and on a larger synthetic microstructure, over a virtual
8-device mesh (conftest forces CPU + 8 XLA host devices)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graingraphnn_tpu.data import extraction
from graingraphnn_tpu.graph import schema, synthetic
from graingraphnn_tpu.models import grain_nn, hyper
from graingraphnn_tpu.parallel import mesh as mesh_mod
from graingraphnn_tpu.parallel import sharded_editor as se
from graingraphnn_tpu.rollout import device_rollout as dr
from graingraphnn_tpu.rollout import topology_jit as tj

from test_device_rollout import make_traj
from test_editor_workset import _edit_inputs

D = 8


def _pad_to_blocks(tstate, logits):
    """Pad the column axes to a multiple of D with dead columns (keeps the
    global last column dead) and return padded (tstate, logits)."""
    def width(n):
        return -(-(n + 1) // D) * D
    EP, EQ = tstate.E_pp.shape[1], tstate.E_pq.shape[1]
    wp, wq = width(EP), width(EQ)
    E_pp = jnp.asarray(se.pad_cols_to(tstate.E_pp, wp))
    E_pq = jnp.asarray(se.pad_cols_to(tstate.E_pq, wq))
    lg = jnp.full(wp, se.NEG, jnp.float32).at[:EP].set(logits)
    return tstate._replace(E_pp=E_pp, E_pq=E_pq), lg


def _run_both(tstate, logits, ge, y_grain, ct, *, wq=1024, wp=1024,
              rounds=3):
    NG = tstate.mask_g.shape[0]
    tstate, logits = _pad_to_blocks(tstate, logits)

    full, sw_f, ex_f = tj.update_jit(tstate, logits, ge, y_grain, ct, NG)

    mesh = mesh_mod.make_mesh([("gp", D)], n_devices=D)
    f = se.make_sharded_editor(mesh, "gp", wq=wq, wp=wp, rounds=rounds)
    (E_pp, E_pq, xj, mask_g, mask_j, n_pp, sw_s, ex_s, invalid) = jax.jit(f)(
        tstate.E_pp, tstate.E_pq, logits, tstate.xj, tstate.y_joint,
        tstate.mask_g, tstate.mask_j, tstate.append_ptr, ge, y_grain,
        jnp.asarray(ct, jnp.float32),
    )
    assert not bool(invalid), "sharded editor flagged invalid workset"
    for name, a, b in (
        ("E_pp", full.E_pp, E_pp), ("E_pq", full.E_pq, E_pq),
        ("xj", full.xj, xj), ("mask_g", full.mask_g, mask_g),
        ("mask_j", full.mask_j, mask_j),
        ("n_pp", full.append_ptr, n_pp),
        ("switching", sw_f, sw_s), ("extra", ex_f, ex_s),
    ):
        a, b = np.asarray(a), np.asarray(b)
        assert (a == b).all(), (name, np.argwhere(a != b)[:5])


def test_sharded_editor_matches_replicated_seed10020():
    hp_r = hyper.regressor(0, layer_size=16)
    hp_c = hyper.classifier_transfered(1, layer_size=16)
    rp = grain_nn.init_regressor(jax.random.PRNGKey(0), hp_r)
    cp = grain_nn.init_classifier(jax.random.PRNGKey(1), hp_c,
                                  regressor_params=rp)
    traj = make_traj()
    hg0 = extraction.make_test_sample(traj, span=6)
    st = dr.state_from_heterograph(hg0)
    # switch-heavy and cascade-heavy spans
    for ct, rt in ((0.5, 1e-4), (0.5, 0.05)):
        tstate, logits, ge, y_g = jax.jit(
            lambda s: _edit_inputs(rp, hp_r, cp, hp_c, s, rt))(st)
        _run_both(tstate, logits, ge, y_g, ct)


def test_sharded_editor_matches_replicated_synthetic_large():
    """~1000-grain synthetic brick-wall microstructure (the 240um-scale
    stand-in used by the scaling benches) with synthetic logits driving
    dozens of switch candidates."""
    feats, ei, ew_, masks, _t = synthetic.spatial_ring_arrays(ng=1024, seed=3)
    x = {"grain": feats["grain"], "joint": feats["joint"]}
    edges = {
        "pull": np.asarray(ei[schema.EDGE_TYPES[1]], np.int64),
        "connect": np.asarray(ei[schema.EDGE_TYPES[2]], np.int64),
    }
    mask = {
        "grain": masks["grain"].reshape(-1).astype(np.int64),
        "joint": masks["joint"].reshape(-1).astype(np.int64),
    }
    st = dr.init_device_state(x, edges, mask)
    NJ = st.xj.shape[0]

    rng = np.random.default_rng(7)
    logits = jnp.asarray(
        np.where(np.asarray(st.E_pp[0]) >= 0,
                 rng.normal(-5.2, 2.0, st.E_pp.shape[1]), se.NEG),
        jnp.float32)
    ge = jnp.full((tj.MAX_ELIM,), -1, jnp.int32)
    y_g = jnp.asarray(rng.normal(0, 0.3, (st.xg.shape[0], 2)), jnp.float32)
    tstate = tj.TopoState(
        E_pp=st.E_pp, E_pq=st.E_pq, xj=st.xj,
        y_joint=jnp.zeros((NJ, 2), jnp.float32),
        mask_g=st.mask_g, mask_j=st.mask_j, append_ptr=st.n_pp,
    )
    n_cand = int(np.asarray(
        (jax.nn.sigmoid(logits) > 0.5) & (st.E_pp[0] < st.E_pp[1])
        & (st.E_pp[0] >= 0)).sum())
    assert n_cand > 5, n_cand
    _run_both(tstate, logits, ge, y_g, 0.5, wq=4096, wp=4096, rounds=2)
