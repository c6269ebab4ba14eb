"""Topology-editor invariants on the real 40um seed10020 frame-0 graph.

On the periodic (torus) domain the junction graph satisfies:
  * every live junction has exactly 3 jj and 3 jg edges
    (reference assertion graph_trajectory.py:985-988)
  * Euler characteristic V - E + F = 0 (V junctions, E undirected jj edges,
    F grains)
These must be preserved by neighbor switching and grain elimination.
"""

import numpy as np
import pytest

from graingraphnn_tpu.data import reference_io
from graingraphnn_tpu.graph import schema
from graingraphnn_tpu.rollout.topology import TopologyEditor

FIXTURE = "/root/reference/graphs/40_40/seed10020_G1.904_R0.558_span6.pkl"


def load_graph():
    a = reference_io.heterograph_to_arrays(
        reference_io.load_sample_list(FIXTURE)[0]
    )
    x = {
        "grain": np.array(a["features"]["grain"], dtype=np.float64),
        "joint": np.array(a["features"]["joint"], dtype=np.float64),
    }
    edges = {
        "push": np.array(a["edge_index"][schema.EDGE_TYPES[0]], dtype=np.int64),
        "pull": np.array(a["edge_index"][schema.EDGE_TYPES[1]], dtype=np.int64),
        "connect": np.array(a["edge_index"][schema.EDGE_TYPES[2]], dtype=np.int64),
    }
    mask = {
        "grain": np.array(a["mask"]["grain"], dtype=np.int64),
        "joint": np.array(a["mask"]["joint"], dtype=np.int64),
    }
    return x, edges, mask


def check_invariants(edges, mask):
    live_j = np.nonzero(mask["joint"][:, 0])[0]
    live_g = np.nonzero(mask["grain"][:, 0])[0]
    jj, jg = edges["connect"], edges["pull"]
    # degree-3 invariants
    src_counts = np.bincount(jj[0], minlength=len(mask["joint"]))
    dst_counts = np.bincount(jj[1], minlength=len(mask["joint"]))
    jg_counts = np.bincount(jg[0], minlength=len(mask["joint"]))
    for j in live_j:
        assert src_counts[j] == 3, (j, src_counts[j])
        assert dst_counts[j] == 3
        assert jg_counts[j] == 3
    # dead joints have no edges
    dead = np.setdiff1d(np.arange(len(mask["joint"])), live_j)
    assert np.all(src_counts[dead] == 0)
    # symmetry: (i,j) live <-> (j,i) live
    pairs = set(map(tuple, jj.T.tolist()))
    assert all((b, a) in pairs for a, b in pairs)
    # Euler characteristic on the torus
    V, E, F = len(live_j), jj.shape[1] // 2, len(live_g)
    assert V - E + F == 0, (V, E, F)
    # push is the flip of pull
    assert np.array_equal(edges["push"], edges["pull"][::-1])


def neutral_pred(x, edges):
    return {
        "joint": np.zeros((len(x["joint"]), 2)),
        "grain": np.stack(
            [np.full(len(x["grain"]), -0.5), np.zeros(len(x["grain"]))], axis=1
        ),
        "grain_area": x["grain"][:, 3].copy(),
        "edge_event": np.full(edges["connect"].shape[1], -50.0),
        "grain_event": np.array([], dtype=np.int64),
    }


def test_initial_graph_satisfies_invariants():
    x, edges, mask = load_graph()
    check_invariants(edges, mask)


def test_noop_update_preserves_graph():
    x, edges, mask = load_graph()
    y = neutral_pred(x, edges)
    ed = TopologyEditor(threshold=0.6)
    x2, edges2, switching, extra = ed.update(x, edges, y, mask)
    assert len(switching) == 0 and len(extra) == 0
    check_invariants(edges2, mask)
    assert edges2["connect"].shape == (2, 708)


def test_neighbor_switching_preserves_invariants():
    x, edges, mask = load_graph()
    y = neutral_pred(x, edges)
    # force one switching event on the first src<dst edge
    jj = edges["connect"]
    cand = np.nonzero(jj[0] < jj[1])[0][0]
    p1, p2 = int(jj[0, cand]), int(jj[1, cand])
    y["edge_event"][cand] = 50.0
    ed = TopologyEditor(threshold=0.6)
    x2, edges2, switching, extra = ed.update(x, edges, y, mask)
    assert len(switching) == 1
    check_invariants(edges2, mask)
    # the switched pair moved to their periodic midpoint and gradients were
    # ZEROED: the reference's rewrite (models.py:1048-1050) computes
    # x - save_prev through an aliased torch view, which is identically 0
    assert np.allclose(x2["joint"][p1, 6:8], 0.0)
    assert np.allclose(x2["joint"][p2, 6:8], 0.0)


def test_grain_elimination_preserves_invariants():
    x, edges, mask = load_graph()
    # pick a 3-sided grain if one exists, else the smallest ring
    jg = edges["pull"]
    grains, counts = np.unique(jg[1], return_counts=True)
    g = int(grains[np.argmin(counts)])
    ring = int(counts.min())
    y = neutral_pred(x, edges)
    y["grain_event"] = np.array([g])
    n_joints_before = int(mask["joint"].sum())
    ed = TopologyEditor(threshold=0.6)
    x2, edges2, switching, extra = ed.update(x, edges, y, mask)
    assert mask["grain"][g, 0] == 0
    # neighbor switching rewires (never deletes) junctions; the final
    # delete_grain removes exactly the grain's last 2 junctions — more only
    # if forced/two-sided eliminations cascaded (reported in `extra`)
    assert int(mask["joint"].sum()) == n_joints_before - 2 * (1 + len(extra))
    check_invariants(edges2, mask)


def test_nucleation_adds_grain_and_junctions():
    x, edges, mask = load_graph()
    y = neutral_pred(x, edges)
    ng, nj = len(x["grain"]), len(x["joint"])
    ed = TopologyEditor(threshold=0.6, rng=np.random.default_rng(0))
    # rng seed 0 with p=0.005 over 236 junctions yields exactly one site
    x2, edges2, switching, extra = ed.update(
        x, edges, y, mask, nucleation_prob=0.005
    )
    added = len(x2["grain"]) - ng
    assert added >= 1
    assert len(x2["joint"]) == nj + 2 * added
    assert int(mask["grain"].sum()) == 118 + added
    check_invariants(edges2, mask)
