"""The Pallas fused conv kernel (interpret mode on CPU in CI; compiled
numerics + perf are checked on hardware by scripts/kernel_bench.py) must
match the XLA fp32 reference formulation to bf16 accuracy."""

import jax
import numpy as np
import pytest

from graingraphnn_tpu.graph import schema
from graingraphnn_tpu.kernels.edge_stage import apply_period_conv_pallas
from graingraphnn_tpu.ops import period_conv
from tests.util import synthetic_sample


@pytest.mark.parametrize("num_gates,C", [(1, 8), (4, 8)])
def test_pallas_matches_xla(num_gates, C):
    s = synthetic_sample(ng=16, nj=32, seed=3)
    params = period_conv.init_period_conv(
        jax.random.PRNGKey(2), schema.JOINT_DIM, schema.GRAIN_DIM, C, num_gates
    )
    out_xla = period_conv.apply_period_conv(
        params, s.joint_x, s.grain_x, s.pull_nbr, s.pull_len, s.pull_mask,
        num_gates=num_gates, out_channels=C,
    )
    out_pl = apply_period_conv_pallas(
        params, s.joint_x, s.grain_x, s.pull_nbr, s.pull_len, s.pull_mask,
        num_gates=num_gates, out_channels=C, interpret=True,
    )
    # bf16 operands with fp32 accumulation: expect ~1% relative agreement
    scale = float(np.abs(np.asarray(out_xla)).max())
    err = np.abs(np.asarray(out_pl) - np.asarray(out_xla))
    assert err.max() / scale < 5e-2, err.max() / scale
    assert err.mean() / scale < 5e-3, err.mean() / scale


def test_pallas_ragged_rows_padded():
    """Row counts that are not tile multiples (real graphs: 119, 1043, 2086)
    are padded internally and sliced back."""
    s = synthetic_sample(ng=19, nj=38, seed=4)
    params = period_conv.init_period_conv(
        jax.random.PRNGKey(5), schema.JOINT_DIM, schema.GRAIN_DIM, 8, 4
    )
    out_xla = period_conv.apply_period_conv(
        params, s.joint_x, s.grain_x, s.pull_nbr, s.pull_len, s.pull_mask,
        num_gates=4, out_channels=8,
    )
    out_pl = apply_period_conv_pallas(
        params, s.joint_x, s.grain_x, s.pull_nbr, s.pull_len, s.pull_mask,
        num_gates=4, out_channels=8, interpret=True, tile=16,
    )
    assert out_pl.shape == out_xla.shape
    scale = float(np.abs(np.asarray(out_xla)).max())
    assert np.abs(np.asarray(out_pl) - np.asarray(out_xla)).max() / scale < 5e-2


def test_flat_kernel_matches_unrolled():
    """The K-flattened body (auto-selected for K >= 8 after the round-5
    roofline control) must match the K-unrolled body to fp-noise level —
    identical math, different matmul batching — on both the high-degree
    pull shape and a forced-flat K=3 shape, including masked slots."""
    from graingraphnn_tpu.kernels import edge_stage

    s = synthetic_sample(ng=32, nj=64, seed=7)
    params = period_conv.init_period_conv(
        jax.random.PRNGKey(4), schema.JOINT_DIM, schema.GRAIN_DIM, 8, 4
    )
    kw = dict(num_gates=4, out_channels=8, interpret=True, tile=16)
    # pull K=16: flat is the auto default; compare against forced-unrolled
    out_flat = apply_period_conv_pallas(
        params, s.joint_x, s.grain_x, s.pull_nbr, s.pull_len, s.pull_mask,
        **kw)
    out_unrolled = apply_period_conv_pallas(
        params, s.joint_x, s.grain_x, s.pull_nbr, s.pull_len, s.pull_mask,
        **kw, flat=False)
    np.testing.assert_allclose(
        np.asarray(out_flat), np.asarray(out_unrolled), atol=1e-5)

    # K=3 connect: unrolled is the auto default; force flat and compare
    p2 = period_conv.init_period_conv(
        jax.random.PRNGKey(5), schema.JOINT_DIM, schema.JOINT_DIM, 8, 4
    )
    out_k3_auto = apply_period_conv_pallas(
        p2, s.joint_x, s.joint_x, s.connect_nbr, s.connect_len,
        s.connect_mask, **kw)
    out_k3_flat = apply_period_conv_pallas(
        p2, s.joint_x, s.joint_x, s.connect_nbr, s.connect_len,
        s.connect_mask, **kw, flat=True)
    np.testing.assert_allclose(
        np.asarray(out_k3_auto), np.asarray(out_k3_flat), atol=1e-5)
