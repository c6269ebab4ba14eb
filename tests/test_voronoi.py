"""Golden parity: the seeded Voronoi initializer + tensorization must
reproduce the shipped reference fixture bit-for-bit in structure
(graphs/40_40/seed10020_*.pkl = the t=0 graph of the 40um case)."""

import numpy as np
import pytest

from graingraphnn_tpu.data import heterograph, reference_io
from graingraphnn_tpu.graph import schema
from graingraphnn_tpu.graph.voronoi import Microstructure

FIXTURE = "/root/reference/graphs/40_40/seed10020_G1.904_R0.558_span6.pkl"


@pytest.fixture(scope="module")
def ref_state():
    return reference_io.heterograph_to_arrays(
        reference_io.load_sample_list(FIXTURE)[0]
    )


@pytest.fixture(scope="module")
def mine():
    m = Microstructure(lxd=40, seed=10020, bc="periodic")
    m.frames = 121
    m.physical_params = {"G": 1.904, "R": 0.558}
    hg = heterograph.tensorize(m, frame=0)
    hg.span = 6
    heterograph.form_gradient(hg, prev=None, nxt=None, event_list=None, elim_list=None)
    heterograph.append_history(hg, [])
    return hg


def test_counts(ref_state, mine):
    assert mine.feature_dicts["grain"].shape == ref_state["features"]["grain"].shape
    assert mine.feature_dicts["joint"].shape == ref_state["features"]["joint"].shape
    for et in schema.EDGE_TYPES:
        assert (
            mine.edge_index_dicts[et].shape == ref_state["edge_index"][et].shape
        )


def test_grain_features_match(ref_state, mine):
    """The fixture's frame-0 coordinates/areas are PF-measured (extraction
    path), so positions match only to PF-detection tolerance; orientations,
    z, extraV, span, and gradients are exact — confirming identical RNG
    sequence and grain ordering."""
    g_ref = ref_state["features"]["grain"]
    g_my = mine.feature_dicts["grain"]
    np.testing.assert_allclose(g_my[:, 5:11], g_ref[:, 5:11], atol=1e-12)
    np.testing.assert_allclose(g_my[:, 2], g_ref[:, 2], atol=1e-12)
    np.testing.assert_allclose(g_my[:, :2], g_ref[:, :2], atol=0.03)
    np.testing.assert_allclose(g_my[:, 3], g_ref[:, 3], atol=2e-3)


def test_joint_features_match(ref_state, mine):
    j_ref = ref_state["features"]["joint"]
    j_my = mine.feature_dicts["joint"]
    np.testing.assert_allclose(j_my[:, 2:], j_ref[:, 2:], atol=1e-12)
    np.testing.assert_allclose(j_my[:, :2], j_ref[:, :2], atol=0.05)


def test_edges_match(ref_state, mine):
    for et in schema.EDGE_TYPES:
        np.testing.assert_array_equal(
            mine.edge_index_dicts[et], ref_state["edge_index"][et]
        )
        # lengths recomputed from PF-measured positions in the fixture
        np.testing.assert_allclose(
            mine.edge_weight_dicts[et], ref_state["edge_weight"][et], atol=0.06
        )
