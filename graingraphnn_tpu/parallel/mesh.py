"""Device-mesh helpers (replaces the reference's NCCL/DDP setup,
dist_train.py:76-95, with jax.sharding meshes + XLA collectives)."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axes: Sequence[tuple[str, int]] | None = None,
    n_devices: Optional[int] = None,
) -> Mesh:
    """Build a mesh over the first n devices. axes like [('dp', 2), ('gp', 4)];
    default: 1-axis 'dp' over all devices."""
    devices = jax.devices()[: (n_devices or len(jax.devices()))]
    if axes is None:
        axes = [("dp", len(devices))]
    names = [a for a, _ in axes]
    shape = [s for _, s in axes]
    assert int(np.prod(shape)) == len(devices), (shape, len(devices))
    dev_array = np.array(devices).reshape(shape)
    return Mesh(dev_array, axis_names=names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    return NamedSharding(mesh, P(axis))
