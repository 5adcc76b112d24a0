"""Device-mesh helpers."""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, fov: int | None = None,
              tile: int = 1) -> Mesh:
    """Mesh with ('fov', 'tile') axes over the first n devices.

    fov axis = data parallelism over fields of view; tile axis = spatial
    sharding within a FOV/volume (halo-exchange parallelism).
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if fov is None:
        fov = n_devices // tile
    assert fov * tile <= len(devices), (fov, tile, len(devices))
    grid = np.asarray(devices[: fov * tile]).reshape(fov, tile)
    return Mesh(grid, ("fov", "tile"))
