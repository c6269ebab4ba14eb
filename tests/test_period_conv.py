"""The ELL + shift-decomposition conv must match the naive per-edge COO
formulation (which mirrors the reference periodGATconv.message,
periodGATconv.py:204-236) to float tolerance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graingraphnn_tpu.graph import schema
from graingraphnn_tpu.ops import period_conv, segment
from tests.util import synthetic_coo, synthetic_sample


@pytest.mark.parametrize("num_gates", [1, 4])
def test_ell_matches_coo_reference(num_gates):
    ng, nj, C = 16, 32, 8
    f, e, w, m = synthetic_coo(ng, nj, seed=1)
    sample = synthetic_sample(ng, nj, seed=1)

    params = period_conv.init_period_conv(
        jax.random.PRNGKey(0), schema.JOINT_DIM, schema.GRAIN_DIM, C, num_gates
    )
    # ('joint','pull','grain'): src joint, dst grain — the variable-degree case
    et = schema.EDGE_TYPES[1]
    src, dst = e[et][0], e[et][1]
    elen = w[et][:, 0]

    out_coo = period_conv.apply_period_conv_coo_reference(
        params,
        jnp.asarray(f["joint"]),
        jnp.asarray(f["grain"]),
        jnp.asarray(src),
        jnp.asarray(dst),
        jnp.asarray(elen),
        jnp.ones(len(src), jnp.float32),
        num_gates=num_gates,
        out_channels=C,
    )
    out_ell = period_conv.apply_period_conv(
        params,
        sample.joint_x,
        sample.grain_x,
        sample.pull_nbr,
        sample.pull_len,
        sample.pull_mask,
        num_gates=num_gates,
        out_channels=C,
    )
    np.testing.assert_allclose(
        np.asarray(out_ell), np.asarray(out_coo), rtol=2e-5, atol=2e-5
    )


def test_periodic_wrap_changes_result():
    """The minimum-image relocation must actually kick in for cross-boundary
    edges (x near 0 vs x near 1)."""
    C = 4
    params = period_conv.init_period_conv(jax.random.PRNGKey(1), 6, 6, C, 1)
    x_src = jnp.array([[0.98, 0.5, 0.1, 0.3, 0.2, 0.1]], jnp.float32)
    x_dst = jnp.array([[0.02, 0.5, 0.1, 0.1, 0.9, 0.4]], jnp.float32)
    nbr = jnp.zeros((1, 1), jnp.int32)
    elen = jnp.full((1, 1), 0.05, jnp.float32)
    mask = jnp.ones((1, 1), jnp.float32)

    out = period_conv.apply_period_conv(
        params, x_src, x_dst, nbr, elen, mask, num_gates=1, out_channels=C
    )
    # unwrapped displacement would be +0.96; wrapped it is -0.04. A source at
    # x=-0.02 gives the same displacement with no wrap -> identical output.
    x_src_far = x_src.at[0, 0].set(-0.02)
    out_far = period_conv.apply_period_conv(
        params, x_src_far, x_dst, nbr, elen, mask, num_gates=1, out_channels=C
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_far), atol=1e-5)


def test_masked_softmax_safe():
    logits = jnp.array([[1.0, 2.0, 3.0], [5.0, 5.0, 5.0]])
    mask = jnp.array([[1.0, 1.0, 0.0], [0.0, 0.0, 0.0]])
    a = segment.masked_softmax(logits, mask, axis=1)
    assert np.isfinite(np.asarray(a)).all()
    np.testing.assert_allclose(np.asarray(a[0]).sum(), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(a[1]), 0.0)
    # gradient through fully-masked row must be finite
    g = jax.grad(lambda l: segment.masked_softmax(l, mask, 1).sum())(logits)
    assert np.isfinite(np.asarray(g)).all()


def test_segment_softmax_coo():
    logits = jnp.array([0.5, 1.0, -0.5, 2.0])
    seg = jnp.array([0, 0, 1, 1])
    a = segment.segment_softmax(logits, seg, 2)
    np.testing.assert_allclose(
        np.asarray(jax.ops.segment_sum(a, seg, num_segments=2)), 1.0, atol=1e-6
    )


def test_build_ell_device_matches_host():
    from graingraphnn_tpu.graph import state as state_mod

    f, e, w, m = synthetic_coo(16, 32, seed=5)
    et = schema.EDGE_TYPES[1]  # joint -> grain (ring)
    src, dst = e[et][0], e[et][1]
    attr = w[et][:, 0]
    nbr_h, len_h, mask_h = state_mod.build_ell(src, dst, attr, 16, 16)

    import jax.numpy as jnp

    nbr_d, len_d, mask_d = jax.jit(
        lambda s, d, a: state_mod.build_ell_device(s, d, a, 16, 16)
    )(jnp.asarray(src, jnp.int32), jnp.asarray(dst, jnp.int32),
      jnp.asarray(attr, jnp.float32))
    np.testing.assert_array_equal(np.asarray(nbr_d), nbr_h)
    np.testing.assert_allclose(np.asarray(len_d), len_h, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(mask_d), mask_h)
