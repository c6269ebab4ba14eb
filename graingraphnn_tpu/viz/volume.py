"""3D visualization: stack cross-section grain-id fields into a volume and
write legacy VTK files viewable in ParaView.

Counterpart of the reference's visualization3D/pv_3Dview.py (grain_visual:
load :33, reconstruct :85, graph_recon :150), with a dependency-free legacy
VTK STRUCTURED_POINTS writer instead of tvtk.
"""

from __future__ import annotations

import glob
import math
import re
from typing import List, Optional, Sequence

import h5py
import numpy as np


def write_vtk_structured_points(
    path: str,
    scalars: np.ndarray,     # [nx, ny, nz]
    spacing=(1.0, 1.0, 1.0),
    origin=(0.0, 0.0, 0.0),
    name: str = "theta_z",
):
    """Legacy-format ASCII VTK file, point data in Fortran order (the layout
    tvtk.ImageData + write_data produced in the reference)."""
    nx, ny, nz = scalars.shape
    with open(path, "w") as f:
        f.write("# vtk DataFile Version 3.0\n")
        f.write("graingraphnn_tpu volume\n")
        f.write("ASCII\n")
        f.write("DATASET STRUCTURED_POINTS\n")
        f.write(f"DIMENSIONS {nx} {ny} {nz}\n")
        f.write(f"ORIGIN {origin[0]} {origin[1]} {origin[2]}\n")
        f.write(f"SPACING {spacing[0]} {spacing[1]} {spacing[2]}\n")
        f.write(f"POINT_DATA {nx * ny * nz}\n")
        f.write(f"SCALARS {name} float 1\n")
        f.write("LOOKUP_TABLE default\n")
        flat = scalars.ravel(order="F")
        np.savetxt(f, flat.reshape(-1, 1), fmt="%.4f")
    return path


class GrainVisual:
    """3D grain-structure exports (reference grain_visual, pv_3Dview.py:17)."""

    def __init__(self, lxd: float = 40, seed: int = 1, height: float = 50,
                 base_width: float = 2):
        self.lxd = lxd
        self.seed = seed
        self.height = height
        self.base_width = base_width

    def _load_h5(self, rawdat_dir, cache_dir="./data_cache"):
        path = sorted(glob.glob(rawdat_dir + "/*seed" + str(self.seed) + "_*"))[0]
        if path.endswith(".gz"):
            from ..data.extraction import maybe_gunzip

            path = maybe_gunzip(path, cache_dir)
        f = h5py.File(path, "r")
        x = np.asarray(f["x_coordinates"])
        angles = np.asarray(f["angles"])
        theta_z = np.zeros(1 + len(angles) // 2)
        theta_z[1:] = angles[len(angles) // 2 + 1:]
        return f, path, x, theta_z

    def load(self, rawdat_dir: str = "./", out: Optional[str] = None):
        """Full PF alpha volume -> .vtk (pv_3Dview.py:33-82)."""
        f, path, x, theta_z = self._load_h5(rawdat_dir)
        dx = x[1] - x[0]
        fnx, fny = len(x), len(np.asarray(f["y_coordinates"]))
        fnz = len(np.asarray(f["z_coordinates"]))
        alpha = np.asarray(f["alpha"]).reshape((fnx, fny, fnz), order="F")
        top_z = int(np.round(self.height / dx))
        alpha = alpha[1:-1, 1:-1, 1:top_z]
        vol = theta_z[alpha] / math.pi * 180
        out = out or f"{rawdat_dir}/seed{self.seed}.vtk"
        return write_vtk_structured_points(out, vol, spacing=(dx, dx, dx))

    def reconstruct(
        self,
        rawdat_dir: str = "./",
        span: int = 6,
        alpha_field_list: Optional[Sequence[np.ndarray]] = None,
        out: Optional[str] = None,
    ):
        """Stack the PF TRUTH cross-sections (h5 `cross_sec`, one plane per
        frame) into a volume with the between-plane spacing set by the growth
        per frame — the reference's `reconstruct` mode (pv_3Dview.py:85-148).
        If `alpha_field_list` is given, stacks those fields instead (the
        reference supports both from the same entry point)."""
        f, path, x, theta_z = self._load_h5(rawdat_dir)
        dx = x[1] - x[0]
        fnx, fny = len(x), len(np.asarray(f["y_coordinates"]))
        m = re.search(r"frames(\d+)", path)
        data_frames = (int(m.group(1)) + 1) if m else 121

        if alpha_field_list:
            vol = np.stack(alpha_field_list, axis=2)
        else:
            vol = np.asarray(f["cross_sec"]).reshape(
                (fnx, fny, data_frames), order="F"
            )[1:-1, 1:-1, ::span]

        dx_frame = (50 - self.base_width) / (data_frames - 1) * span
        top_z = int(np.round((self.height - self.base_width) / dx_frame)) + 1
        vol = vol[:, :, :top_z]
        vol = theta_z[vol] / math.pi * 180
        out = out or f"{rawdat_dir}/seed{self.seed}leapz.vtk"
        return write_vtk_structured_points(
            out, vol, spacing=(dx, dx, dx_frame)
        )

    def graph_recon(
        self,
        theta_z: np.ndarray,
        alpha_field_list: Sequence[np.ndarray],
        span: int,
        frames: int,
        mesh_size: float,
        ini_height: float,
        final_height: float,
        out: str,
    ):
        """Stack GNN-predicted cross-section id fields into a volume colored
        by theta_z (pv_3Dview.py:150-192)."""
        vol = np.stack(alpha_field_list, axis=2)
        dx_frame = (self.height - self.base_width) / (frames - 1) * span
        top_z = int(np.round((final_height - ini_height) / dx_frame)) + 1
        vol = vol[:, :, :top_z]
        vol = theta_z[vol] / math.pi * 180
        return write_vtk_structured_points(
            out, vol, spacing=(mesh_size, mesh_size, dx_frame)
        )
