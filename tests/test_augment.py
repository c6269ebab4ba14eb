"""Symmetry-augmentation consistency: transformed samples must preserve all
periodic pairwise distances (so the recomputed edge lengths are unchanged)
and transform vector targets consistently with positions."""

import pickle

import numpy as np
import pytest

from graingraphnn_tpu.data import augment, reference_io
from graingraphnn_tpu.graph import schema


@pytest.fixture(scope="module")
def raw():
    a = reference_io.heterograph_to_arrays(
        reference_io.load_sample_list(
            "/root/reference/graphs/40_40/seed10020_G1.904_R0.558_span6.pkl"
        )[0]
    )
    # fabricate vector targets = minimum-image displacement to a fixed point
    j = a["features"]["joint"]
    rng = np.random.default_rng(0)
    disp = rng.uniform(-0.05, 0.05, (len(j), 2))
    return {
        "feature_dicts": {k: v.copy() for k, v in a["features"].items()},
        "target_dicts": {"joint": disp},
        "edge_index_dicts": a["edge_index"],
        "edge_weight_dicts": a["edge_weight"],
        "mask": a["mask"],
    }


def _pairwise_periodic(xy, pairs):
    rel = xy[pairs[0]] - xy[pairs[1]]
    rel = rel - 1.0 * (rel > 0.5) + 1.0 * (rel < -0.5)
    return np.sqrt(np.sum(rel**2, axis=1))


@pytest.mark.parametrize("k,refl", [(1, False), (2, False), (0, True), (3, True)])
def test_distances_preserved(raw, k, refl):
    et = schema.EDGE_TYPES[2]
    pairs = raw["edge_index_dicts"][et]
    d0 = _pairwise_periodic(raw["feature_dicts"]["joint"][:, :2], pairs)
    out = augment.transform_sample(raw, k=k, refl=refl, tx=0.37, ty=0.81)
    d1 = _pairwise_periodic(out["feature_dicts"]["joint"][:, :2], pairs)
    np.testing.assert_allclose(d1, d0, atol=1e-9)


@pytest.mark.parametrize("k,refl", [(1, False), (0, True), (2, True)])
def test_vector_targets_follow_positions(raw, k, refl):
    """If y = periodic displacement from joint p to its destination, then the
    transformed y must equal the periodic displacement between transformed
    endpoints."""
    j = raw["feature_dicts"]["joint"][:, :2]
    y = raw["target_dicts"]["joint"]
    dest = j + y  # un-wrapped destination
    out = augment.transform_sample(raw, k=k, refl=refl, tx=0.11, ty=0.52)
    j2 = out["feature_dicts"]["joint"][:, :2]
    y2 = out["target_dicts"]["joint"]
    dest2_expected = augment._map_positions(dest, k, refl, 0.11, 0.52)
    rel = dest2_expected - (j2 + y2)
    # same point on the torus
    rel -= np.round(rel)
    np.testing.assert_allclose(rel, 0.0, atol=1e-9)


def test_identity_roundtrip(raw):
    out = augment.transform_sample(raw, k=0, refl=False, tx=0.0, ty=0.0)
    np.testing.assert_allclose(
        out["feature_dicts"]["grain"], raw["feature_dicts"]["grain"]
    )


def test_group_size(raw):
    imgs = augment.augment_group(raw, np.random.default_rng(0))
    assert len(imgs) == 8
