"""Golden extraction parity against the shipped artifacts: test-mode frame-0
tensors must match the reference fixture bit-for-bit; train-mode must find
the published event counts and calibrate the published span."""

import numpy as np
import pytest

from graingraphnn_tpu.data import extraction, reference_io
from graingraphnn_tpu.graph import schema

RAWDAT = "/root/reference/rawdat_PF/40_40"
FIXTURE = "/root/reference/graphs/40_40/seed10020_G1.904_R0.558_span6.pkl"


@pytest.fixture(scope="module")
def test_mode_traj(tmp_path_factory):
    cache = str(tmp_path_factory.mktemp("h5cache"))
    traj = extraction.TrajectoryExtractor(lxd=40, seed=10020, frames=121)
    traj.match_graph = False
    traj.extract(RAWDAT, cache_dir=cache)
    return traj


def test_frame0_bit_exact_vs_fixture(test_mode_traj):
    hg0 = extraction.make_test_sample(test_mode_traj, span=6)
    ref = reference_io.heterograph_to_arrays(
        reference_io.load_sample_list(FIXTURE)[0]
    )
    for nt in ("grain", "joint"):
        np.testing.assert_allclose(
            hg0.feature_dicts[nt], ref["features"][nt], atol=1e-12
        )
    for et in schema.EDGE_TYPES:
        np.testing.assert_array_equal(
            hg0.edge_index_dicts[et], ref["edge_index"][et]
        )
        np.testing.assert_allclose(
            hg0.edge_weight_dicts[et], ref["edge_weight"][et], atol=1e-12
        )


def test_truth_event_counts(test_mode_traj):
    # README.md:68 reports grain-event accuracy out of 75 truth events
    assert len(set.union(*test_mode_traj.grain_events)) == 75


def test_truth_trajectory_matches_shipped_pickle(test_mode_traj):
    shipped = reference_io.load_pickle(
        "/root/reference/graphs/40_40/traj10020.pkl.gz"
    )
    mine = test_mode_traj
    assert mine.num_regions == shipped.num_regions
    assert mine.num_vertices == shipped.num_vertices
    np.testing.assert_allclose(mine.theta_z, shipped.theta_z, atol=1e-12)
    # truth grain-event sets per frame
    assert [set(s) for s in mine.grain_events] == [
        set(s) for s in shipped.grain_events
    ]
    np.testing.assert_array_equal(mine.extraV_frames, shipped.extraV_frames)
    np.testing.assert_array_equal(mine.totalV_frames, shipped.totalV_frames)
