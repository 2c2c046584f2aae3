"""Backend dispatch for the tile rasterizer (XLA twin vs fused Pallas).

One function used by the single-device `render()` and by every sharded
renderer in `parallel/` (tile strips, gaussian-axis strips, depth ring), so
the multi-chip paths run the SAME fused Pallas kernels as the single-chip
path — strips included — instead of falling back to the slow XLA twin.
The XLA twin remains the CPU path and the differentiable cross-check oracle
(reference analogue: the whole backend switch the reference intended but
left empty, `backend.jl:1`).
"""

from __future__ import annotations

from .binning import TileBinning
from .tile_raster import RasterOut, rasterize_tiles_xla


def rasterize_payload(
    payload,                 # (M, PAYLOAD_DIM) per-gaussian (or per-arrival) rows
    binning: TileBinning,    # built over the same M rows
    background,              # (3,)
    width: int,
    height: int,
    cfg,
    impl: str,
    xla_max_chunks: int = 64,
    tile_row0=None,          # dynamic first tile row (tile-sharded strips)
    tile_rows=None,          # static number of tile rows to render
) -> RasterOut:
    """Rasterize binned gaussians with the selected backend.

    Differentiable w.r.t. `payload` and `background`. With `tile_rows` set,
    renders an uncropped (tile_rows * tile_size, W) strip whose first tile
    row is the dynamic `tile_row0` (strips concatenate to the tile-padded
    image; callers crop).
    """
    if impl == "xla":
        sorted_payload = binning.gather_payload(payload, impl=impl)
        return rasterize_tiles_xla(
            sorted_payload, binning.tile_starts, background,
            width, height, cfg, max_chunks=xla_max_chunks,
            tile_row0=tile_row0, tile_rows=tile_rows,
        )
    if impl in ("pallas", "pallas_interpret"):
        interpret = impl == "pallas_interpret"
        if cfg.packed:
            from .pallas.rasterize import rasterize_payload_pallas

            return rasterize_payload_pallas(
                payload, binning, background, width, height, cfg,
                interpret=interpret, tile_row0=tile_row0, tile_rows=tile_rows,
            )
        from .pallas.rasterize import rasterize_tiles_pallas

        sorted_payload = binning.gather_payload(payload, impl=impl)
        return rasterize_tiles_pallas(
            sorted_payload, binning.tile_starts, background,
            width, height, cfg, interpret=interpret,
            tile_row0=tile_row0, tile_rows=tile_rows,
        )
    raise ValueError(f"unknown rasterizer impl: {impl!r}")
