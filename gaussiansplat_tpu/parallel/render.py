"""Tile-sharded rendering: one view split into horizontal tile strips across
the `tile` mesh axis.

This is the domain analogue of sequence parallelism identified in SURVEY §5:
pixels (tiles) are the stationary sharded axis. Each device projects all
gaussians (cheap, O(N) elementwise), bins only the tiles of its strip
(per-strip pair capacity), rasterizes its strip, and the strips concatenate
into the full image via the shard_map output spec. Per-gaussian parameter
gradients from each strip are partial sums -> `psum` over the tile axis in
the caller's backward (handled automatically by shard_map's reverse-mode
transpose of the replicated-in / sharded-out pattern).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..config import RasterConfig
from ..models.gaussians import GaussianModel
from ..ops.binning import bin_gaussians, tile_grid
from ..ops.camera import Camera
from ..ops.projection import make_payload, project_gaussians
from ..ops.raster_dispatch import rasterize_payload
from .mesh import TILE_AXIS


def resolve_shard_impl(impl: Optional[str]) -> str:
    """Resolve the raster backend for sharded renderers ('auto' -> fused
    Pallas kernels on TPU, the XLA twin elsewhere)."""
    if impl is None or impl == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "xla"
    return impl


def render_strip(
    model: GaussianModel,
    camera: Camera,
    cfg: RasterConfig,
    sh_degree: int,
    background: jax.Array,
    tile_row0: jax.Array,
    tile_rows: int,
    pair_capacity: int,
    mean2d_offset: Optional[jax.Array] = None,
    xla_max_chunks: int = 64,
    impl: str = "xla",
):
    """Render `tile_rows` tile rows starting at dynamic row `tile_row0`.
    Returns (strip_image (rows*ts, W, 3), strip_trans, aux dict). Runs inside
    or outside shard_map; differentiable."""
    proj = project_gaussians(
        model.means, model.quats, model.log_scales, model.logit_opacities,
        model.sh, camera, cfg, sh_degree=sh_degree, alive=model.alive,
    )
    if mean2d_offset is not None:
        proj = proj.replace(mean2d=proj.mean2d + mean2d_offset)
    binning = bin_gaussians(
        proj, camera.width, camera.height, cfg,
        tile_row0=tile_row0, tile_rows=tile_rows, capacity=pair_capacity,
        impl=impl,
    )
    payload = make_payload(proj)
    out = rasterize_payload(
        payload, binning, background, camera.width, camera.height, cfg,
        impl, xla_max_chunks=xla_max_chunks,
        tile_row0=tile_row0, tile_rows=tile_rows,
    )
    aux = dict(
        radii=proj.radius,
        num_pairs=binning.num_pairs,
        overflow=binning.overflow,
        max_chunks_needed=out.max_chunks_needed,
    )
    return out.image, out.transmittance, aux


def make_tile_sharded_render(
    mesh: Mesh,
    cfg: RasterConfig,
    width: int,
    height: int,
    sh_degree: int,
    xla_max_chunks: int = 64,
    impl: Optional[str] = None,
):
    """Build a jit-able `f(model, camera, background) -> (image, trans)` that
    shards the tile grid over the mesh's tile axis. The returned image is the
    tile-padded (Hp, W) frame; callers crop to `height`. Each strip runs the
    fused Pallas kernels on TPU ('auto'); pass impl='xla' for the oracle."""
    impl = resolve_shard_impl(impl if impl is not None else cfg.impl)
    ntile = mesh.shape[TILE_AXIS]
    ts = cfg.tile_size
    tiles_x, tiles_y = tile_grid(width, height, ts)
    if tiles_y % ntile != 0:
        raise ValueError(
            f"tile rows ({tiles_y}) must divide evenly across the tile axis "
            f"({ntile}); pad the image height to a multiple of "
            f"{ts * ntile} pixels"
        )
    rows = tiles_y // ntile

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=(P(None, TILE_AXIS, None, None), P(None, TILE_AXIS, None)),
        check_vma=False,
    )
    def _sharded(model, camera, background):
        row0 = jax.lax.axis_index(TILE_AXIS) * rows
        n = model.capacity
        pair_cap = max(cfg.pair_capacity(n) // ntile, 4 * cfg.chunk_size)
        img, trans, _ = render_strip(
            model, camera, cfg, sh_degree, background, row0, rows, pair_cap,
            xla_max_chunks=xla_max_chunks, impl=impl,
        )
        return img[None, None], trans[None, None]

    def f(model, camera, background):
        img, trans = _sharded(model, camera, background)
        # (1, ntile, rows*ts, W, ...) -> (Hp, W, ...)
        img = img.reshape(ntile * rows * ts, width, 3)
        trans = trans.reshape(ntile * rows * ts, width)
        return img[:height], trans[:height]

    return f
