"""Device-mesh construction for multi-chip / multi-host runs.

The reference has no distribution at all (SURVEY §2.4: single GPU, no
NCCL/MPI). Scaling here is pure XLA: a 2D `jax.sharding.Mesh` with
  * `data` — views (cameras) sharded across devices; gradient psum. On a
    multi-host pod this is the DCN-friendly axis.
  * `tile` — horizontal strips of the pixel-tile grid within one view; the
    ICI-friendly axis (each device bins + rasterizes only its strip, grads
    psum back per gaussian).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MeshConfig

DATA_AXIS = "data"
TILE_AXIS = "tile"


def make_mesh(
    data: int = 1,
    tile: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    need = data * tile
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(data, tile)
    return Mesh(arr, (DATA_AXIS, TILE_AXIS))


def mesh_from_config(cfg: MeshConfig, devices=None) -> Mesh:
    return make_mesh(cfg.data, cfg.tile, devices)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))
