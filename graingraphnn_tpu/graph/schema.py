"""Feature / target schema of the heterogeneous grain graph.

Mirrors the data model of the reference (graph_datastruct.py:825-849,
graph_trajectory.py:901-1005): two node types and three edge types on a
periodic unit square.

Node features (after gradient augmentation, the model input):
  grain: [x, y, z, area, extraV, cosx, sinx, cosz, sinz, span, darea]  (11)
  joint: [x, y, z, G, R, span, dx, dy]                                 (8)

Targets:
  grain: [darea, extraV] scaled by 20; joint: [dx, dy] scaled by 5
  (graph_datastruct.py:834,841)

Edge types (graph_datastruct.py:837-839):
  ('grain','push','joint'), ('joint','pull','grain'), ('joint','connect','joint')
Every junction has exactly three junction neighbors and three grain neighbors
(asserted in the reference at graph_trajectory.py:985-988).
"""

from __future__ import annotations

GRAIN_FEATURES = (
    "x", "y", "z", "area", "extraV", "cosx", "sinx", "cosz", "sinz", "span",
)
JOINT_FEATURES = ("x", "y", "z", "G", "R", "span")
GRAIN_GRAD_FEATURES = ("darea",)
JOINT_GRAD_FEATURES = ("dx", "dy")

GRAIN_DIM = len(GRAIN_FEATURES) + len(GRAIN_GRAD_FEATURES)  # 11
JOINT_DIM = len(JOINT_FEATURES) + len(JOINT_GRAD_FEATURES)  # 8

GRAIN_TARGETS = ("darea", "extraV")
JOINT_TARGETS = ("dx", "dy")

# Column indices used by the rollout feature-integration step
# (reference models.py:510-516).
GRAIN_AREA_COL = 3
GRAIN_EXTRAV_COL = 4
GRAIN_SPAN_COL = 9
GRAIN_DAREA_COL = 10
JOINT_SPAN_COL = 5
JOINT_DX_COL = 6  # columns 6:8 hold the previous-step joint displacement

TARGET_SCALING = {"grain": 20.0, "joint": 5.0}  # graph_datastruct.py:841

EDGE_TYPES = (
    ("grain", "push", "joint"),
    ("joint", "pull", "grain"),
    ("joint", "connect", "joint"),
)

# Exact junction degrees (reference invariant).
JJ_DEGREE = 3   # junction -> junction neighbors ('connect')
JG_DEGREE = 3   # grain neighbors of each junction ('push' into the junction)

# Capacity for the ring of junctions around one grain ('pull' into the grain).
# Voronoi grains in the shipped data have <= ~12 sides; 16 gives headroom and
# aligns reduction windows.
DEFAULT_GRAIN_RING = 16

# Sentinel for deleted / padded edges (reference uses -2.0 edge length for
# deleted edges, graph_trajectory.py:972, and -1 node indices).
EDGE_LEN_SENTINEL = -2.0
INDEX_SENTINEL = -1

# Event-label conventions (graph_datastruct.py:898-944).
EDGE_EVENT_INVALID = -100
SPAN_NORMALIZER = 120.0  # span feature = span / 120 (graph_datastruct.py:997)
