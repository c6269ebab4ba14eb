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
