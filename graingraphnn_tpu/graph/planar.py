"""Planar polygonal cross-section graph (host-side bookkeeping).

The 2D microstructure at one height is a planar graph: triple-junction
vertices, grain regions, and junction-junction edges on a periodic (or
no-flux) unit domain. This module provides the region/edge bookkeeping the
reference keeps in its `graph` class (graph_datastruct.py:206-823):
rebuilding grain polygons from the junction->grains incidence, rasterizing
them to a grain-id image, and the pixel-mismatch layer error.

This is evaluation/bookkeeping machinery (never in the jit hot path); the
model-facing tensor form lives in graph.state.
"""

from __future__ import annotations

import math
from collections import defaultdict
from typing import Dict, List, Optional, Tuple

import numpy as np
import PIL.Image
import PIL.ImageDraw

EPS = 1e-12


def periodic_move_pt(p, pc):
    """Return p shifted by whole periods into pc's image
    (graph_datastruct.py:55-72)."""
    x, y = p
    xc, yc = pc
    x += -1 * ((x - xc) > 0.5) + 1 * ((x - xc) < -0.5)
    y += -1 * ((y - yc) > 0.5) + 1 * ((y - yc) < -0.5)
    return [x, y]


def periodic_dist_pt(p, pc) -> float:
    x, y = p
    xc, yc = pc
    if x < xc - 0.5 - EPS: x += 1
    if x > xc + 0.5 + EPS: x -= 1
    if y < yc - 0.5 - EPS: y += 1
    if y > yc + 0.5 + EPS: y -= 1
    return math.sqrt((x - xc) ** 2 + (y - yc) ** 2)


def ccw_key(point, center):
    """Sort key (angle, radius) for counterclockwise polygon ordering
    (graph_datastruct.py:100-116)."""
    vx, vy = point[0] - center[0], point[1] - center[1]
    r = math.hypot(vx, vy)
    if r == 0:
        return -math.pi, 0.0
    ang = math.atan2(vy, vx)
    if ang < 0:
        ang += 2 * math.pi
    return ang, r


def shares_two_grains(j1, j2) -> bool:
    """Two junctions are linked by a grain-boundary edge iff they share
    exactly two grain labels (graph_datastruct.py:91-97)."""
    return len(set(j1) & set(j2)) == 2


class PlanarGraph:
    """Junction/region bookkeeping for one cross-section.

    Attributes mirror the reference's semantics:
      vertices: {vertex_id: (x, y)}
      joint2vertex: {sorted grain-triple: vertex_id}
      vertex2joint: inverse
      edges: list of [src, dst] vertex pairs (directed, both ways; [-1,-1]
             marks deleted slots)
      regions / region_coors / region_center: per-grain sorted vertex rings
    """

    def __init__(self, bc: str = "periodic", imagesize: Tuple[int, int] = (501, 501)):
        self.BC = bc
        self.imagesize = imagesize
        self.vertices: Dict[int, list] = {}
        self.joint2vertex: Dict[tuple, int] = {}
        self.vertex2joint: Dict[int, tuple] = {}
        self.edges: List[List[int]] = []
        self.quadruples: Dict[int, tuple] = {}
        self.corner_grains = [0, 0, 0, 0]
        self.regions: Dict[int, List[int]] = {}
        self.region_coors: Dict[int, List[list]] = {}
        self.region_center: Dict[int, list] = {}
        self.vertex_neighbor: Dict[int, set] = {}
        self.alpha_field = np.zeros((imagesize[1], imagesize[0]), dtype=int)
        self.error_layer = 0.0
        self.raise_err = True
        self.max_y = 1.0

    # ------------------------------------------------------------------
    # region rebuild (graph_datastruct.update, :654-799)
    # ------------------------------------------------------------------
    def rebuild_regions(self, init_edges: bool = False, verbose: bool = False):
        self.vertex_neighbor = {}
        self.regions = {}
        self.region_coors = {}
        self.region_center = {}
        region_bound = {}

        grouping: Dict[int, List[int]] = defaultdict(list)
        for joint, v in self.joint2vertex.items():
            for g in set(joint):
                grouping[g].append(v)

        for region, vert_ids in grouping.items():
            coors = [list(self.vertices[v]) for v in vert_ids]
            if len(coors) <= 1:
                continue
            if self.BC == "periodic":
                for i in range(1, len(coors)):
                    coors[i] = periodic_move_pt(coors[i], coors[i - 1])
            if self.BC == "noflux" and region > 1:
                arr = np.array(coors)
                region_bound[region] = [arr[:, 0].min(), arr[:, 0].max(),
                                        arr[:, 1].min(), arr[:, 1].max()]

            # shift the whole ring into the positive quadrant if any
            # coordinate went negative during unwrapping
            inbound = [all(c[0] > -EPS for c in coors), all(c[1] > -EPS for c in coors)]
            moved = [[c[0] + (0 if inbound[0] else 1), c[1] + (0 if inbound[1] else 1)]
                     for c in coors]

            cx = float(np.mean([c[0] for c in moved]))
            cy = float(np.mean([c[1] for c in moved]))
            self.region_center[region] = [cx, cy]

            order = sorted(range(len(moved)), key=lambda i: ccw_key(moved[i], (cx, cy)))
            if self.BC == "noflux" and region == 1:
                order.reverse()
            self.region_coors[region] = [moved[i] for i in order]
            self.regions[region] = [vert_ids[i] for i in order]

            if init_edges:
                ring = self.regions[region]
                grain_edge = [[ring[i], ring[(i + 1) % len(ring)]] for i in range(len(ring))]
                keep = True
                if region in self.quadruples:
                    qa, qb = self.quadruples[region]
                    for a, b in grain_edge:
                        if a in (qa, qb) or b in (qa, qb):
                            if not shares_two_grains(self.vertex2joint[a], self.vertex2joint[b]):
                                keep = False
                if not keep:
                    # the split quadruple pair got the wrong assignment for
                    # this region's ring — swap the twin vertices
                    # (graph_datastruct.py:743-754)
                    qa, qb = self.quadruples[region]
                    swap = {qa: qb, qb: qa}
                    grain_edge = [[swap.get(a, a), swap.get(b, b)] for a, b in grain_edge]
                self.edges.extend(grain_edge)

        for src, dst in self.edges:
            if src > -1:
                self.vertex_neighbor.setdefault(src, set()).add(dst)
        if verbose:
            bad = {v: n for v, n in self.vertex_neighbor.items() if len(n) != 3}
            if bad:
                print("junctions with degree != 3:", bad)

        if self.BC == "noflux" and region_bound:
            keys = np.array(list(region_bound.keys()))
            gb = np.array(list(region_bound.values()))
            my = self.max_y
            self.corner_grains[0] = int(keys[(np.abs(gb[:, 0]) < 1e-6) & (np.abs(gb[:, 2]) < 1e-6)][0])
            self.corner_grains[1] = int(keys[(np.abs(1 - gb[:, 1]) < 1e-6) & (np.abs(gb[:, 2]) < 1e-6)][0])
            self.corner_grains[2] = int(keys[(np.abs(gb[:, 0]) < 1e-6) & (np.abs(my - gb[:, 3]) < 1e-6)][0])
            self.corner_grains[3] = int(keys[(np.abs(1 - gb[:, 1]) < 1e-6) & (np.abs(my - gb[:, 3]) < 1e-6)][0])

    # ------------------------------------------------------------------
    # rasterization (graph_datastruct.plot_polygons, :553-610)
    # ------------------------------------------------------------------
    def rasterize(self, imagesize: Optional[Tuple[int, int]] = None) -> np.ndarray:
        """Paint each grain polygon with its 24-bit id and decode to an
        integer grain-id field. Periodic domains draw on a doubled canvas and
        take the max over the four unit-cell images."""
        if not imagesize or imagesize == (0, 0):
            imagesize = self.imagesize
        s = imagesize[0]
        if self.BC == "periodic":
            image = PIL.Image.new("RGB", (2 * s, 2 * s))
        else:
            image = PIL.Image.new("RGB", (imagesize[0], imagesize[1]))
        draw = PIL.ImageDraw.Draw(image)

        for region_id, poly in self.region_coors.items():
            if self.BC == "noflux" and region_id == 1:
                continue
            rid = region_id // (255 * 255)
            gid = (region_id - rid * 255 * 255) // 255
            bid = region_id - rid * 255 * 255 - gid * 255
            if self.BC == "noflux":
                pts = [tuple(np.asarray(np.round(np.array(p) * s), dtype=int)) for p in poly]
            else:
                pts = [tuple(np.asarray(np.array(p) * s, dtype=int)) for p in poly]
            if len(pts) > 1:
                draw.polygon(pts, fill=(rid, gid, bid))

        img = np.array(image, dtype=int)
        img = img[:, :, 0] * 255 * 255 + img[:, :, 1] * 255 + img[:, :, 2]

        if self.BC == "periodic":
            tiles = np.stack([img[:s, :s], img[s:, :s], img[:s, s:], img[s:, s:]])
            self.alpha_field = np.max(tiles, axis=0)
        else:
            # quadrant index per pixel: x-half + 2*y-half — unpainted pixels
            # (the boundary grain) inherit the nearest corner grain id
            xv, yv = np.meshgrid(np.arange(imagesize[0]), np.arange(imagesize[1]))
            patch = 2 * xv // imagesize[0] + 2 * (2 * yv // imagesize[1])
            self.alpha_field = img + np.array(self.corner_grains)[patch] * (img == 0)

        if self.raise_err:
            assert np.all(self.alpha_field > 0), "unassigned pixels in raster"
        return self.alpha_field

    def layer_error(self, alpha_pde: np.ndarray) -> float:
        """Pixel misclassification fraction vs the phase-field truth
        (graph_datastruct.py:346-348)."""
        self.error_layer = float(
            np.sum(alpha_pde != self.alpha_field) / alpha_pde.size
        )
        return self.error_layer

    def sync_maps(self):
        self.vertex2joint = {v: k for k, v in self.joint2vertex.items()}
