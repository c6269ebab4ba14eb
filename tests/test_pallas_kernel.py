"""The Pallas fused edge-stage kernel (interpret mode on CPU) must match the
XLA reference formulation."""

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
    np.testing.assert_allclose(
        np.asarray(out_pl), np.asarray(out_xla), rtol=2e-5, atol=2e-5
    )
