"""Oracle tests for the fused single-launch editor (kernels/editor_core +
kernels/editor_pallas): update_fused must reproduce topology_jit.update_jit
EXACTLY (ints bit-equal, floats allclose) on the real seed10020 graph —
update_jit is itself byte-matched to the reference editor
(models.py:614-845) by tests/test_topology_jit.py and scripts/ab_stepwise.py,
so equality here certifies the fused path end to end."""

import jax.numpy as jnp
import numpy as np
import pytest

from graingraphnn_tpu.kernels import editor_pallas as epal
from graingraphnn_tpu.rollout import topology_jit as tj
from tests.test_topology import load_graph, neutral_pred  # noqa: F401
from tests.test_topology_jit import make_state


def _run_both(state, logits_pad, ge, y_grain, threshold, num_grains):
    s1, sw1, ex1 = tj.update_jit(
        state, logits_pad, ge, y_grain, threshold, num_grains
    )
    s2, sw2, ex2 = epal.update_fused(
        state, logits_pad, ge, y_grain, threshold, num_grains,
        use_pallas=False,
    )
    return (s1, sw1, ex1), (s2, sw2, ex2)


def _assert_equal(a, b):
    (s1, sw1, ex1), (s2, sw2, ex2) = a, b
    np.testing.assert_array_equal(np.asarray(s1.E_pp), np.asarray(s2.E_pp))
    np.testing.assert_array_equal(np.asarray(s1.E_pq), np.asarray(s2.E_pq))
    np.testing.assert_array_equal(np.asarray(s1.mask_g), np.asarray(s2.mask_g))
    np.testing.assert_array_equal(np.asarray(s1.mask_j), np.asarray(s2.mask_j))
    assert int(s1.append_ptr) == int(s2.append_ptr)
    np.testing.assert_allclose(
        np.asarray(s1.xj), np.asarray(s2.xj), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(s1.y_joint), np.asarray(s2.y_joint), atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(sw1), np.asarray(sw2))
    np.testing.assert_array_equal(np.asarray(ex1), np.asarray(ex2))


def _scenario(seed, n_switch=6, n_elim=2):
    x, edges, mask = load_graph()
    jj = edges["connect"]
    jg = edges["pull"]
    rng = np.random.default_rng(seed)

    logits = np.full(jj.shape[1], -50.0)
    cand = np.nonzero(jj[0] < jj[1])[0]
    picks = rng.choice(len(cand), size=n_switch, replace=False)
    logits[cand[picks]] = rng.uniform(5.0, 15.0, size=n_switch)

    grains, counts = np.unique(jg[1], return_counts=True)
    small = grains[np.argsort(counts)][:4]
    ge_list = rng.choice(
        small, size=min(n_elim, len(small)), replace=False
    ).astype(np.int64)
    y_grain = np.stack(
        [rng.uniform(-0.5, 0.5, len(x["grain"])), np.zeros(len(x["grain"]))],
        axis=1,
    )

    state = make_state(x, edges, mask)
    EP = state.E_pp.shape[1]
    lp = np.full(EP, -1e30)
    lp[: jj.shape[1]] = logits
    ge = np.full(tj.MAX_ELIM, -1, np.int32)
    ge[: len(ge_list)] = ge_list
    return (
        state,
        jnp.asarray(lp, jnp.float32),
        jnp.asarray(ge),
        jnp.asarray(y_grain, jnp.float32),
        len(x["grain"]),
    )


@pytest.mark.parametrize("seed", [0, 1, 7])
def test_fused_matches_update_jit(seed):
    state, lp, ge, yg, ng = _scenario(seed)
    a, b = _run_both(state, lp, ge, yg, 0.6, ng)
    _assert_equal(a, b)


def test_fused_switch_only():
    state, lp, _ge, yg, ng = _scenario(3, n_switch=8)
    ge = jnp.full((tj.MAX_ELIM,), -1, jnp.int32)
    a, b = _run_both(state, lp, ge, yg, 0.6, ng)
    _assert_equal(a, b)


def test_fused_elim_only():
    state, _lp, ge, yg, ng = _scenario(5, n_switch=0, n_elim=2)
    lp = jnp.full((state.E_pp.shape[1],), -1e30, jnp.float32)
    a, b = _run_both(state, lp, ge, yg, 0.6, ng)
    _assert_equal(a, b)


def test_fused_vmap_lanes_int_exact():
    """vmap of update_fused (the batched-rollout configuration: one grid
    instance per lane) must match per-lane calls exactly — lanes share no
    state, so batching cannot change any edit decision."""
    import jax

    lanes = [_scenario(s) for s in (11, 12, 13)]
    state0 = lanes[0][0]
    states = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[ln[0] for ln in lanes])
    lp = jnp.stack([ln[1] for ln in lanes])
    ge = jnp.stack([ln[2] for ln in lanes])
    yg = jnp.stack([ln[3] for ln in lanes])
    ng = lanes[0][4]

    def ed(st, l, g, y):
        return epal.update_fused(st, l, g, y, 0.6, ng, use_pallas=False)

    sB, swB, exB = jax.vmap(ed)(states, lp, ge, yg)
    for k, ln in enumerate(lanes):
        s1, sw1, ex1 = ed(ln[0], ln[1], ln[2], ln[3])
        np.testing.assert_array_equal(
            np.asarray(s1.E_pp), np.asarray(sB.E_pp)[k])
        np.testing.assert_array_equal(
            np.asarray(s1.mask_g), np.asarray(sB.mask_g)[k])
        np.testing.assert_array_equal(np.asarray(sw1), np.asarray(swB)[k])
        np.testing.assert_array_equal(np.asarray(ex1), np.asarray(exB)[k])


def test_fused_noop_step():
    state, _lp, _ge, yg, ng = _scenario(2, n_switch=0)
    lp = jnp.full((state.E_pp.shape[1],), -1e30, jnp.float32)
    ge = jnp.full((tj.MAX_ELIM,), -1, jnp.int32)
    a, b = _run_both(state, lp, ge, yg, 0.6, ng)
    _assert_equal(a, b)
