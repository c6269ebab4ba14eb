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


def test_halo_rejects_too_many_stripes(graph):
    a = graph
    with pytest.raises(ValueError, match="non-adjacent"):
        halo.build_striped(
            a["features"], a["edge_index"], a["edge_weight"], a["mask"], 16
        )
