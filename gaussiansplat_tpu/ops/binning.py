"""Static-shape tile binning: duplicate -> lexicographic sort -> segments.

The reference bins by materializing a dense (tiles_x, tiles_y, N) uint8 hit
bitmap (`forward.jl:120`, `binning.jl:3-35`), prefix-scanning it
(`forward.jl:138`), reading the max count back to the host to size the
per-tile lists (`forward.jl:139-142` — a data-dependent shape), and
compacting with ranks computed in *original index order* so the depth sort
never actually orders the per-tile lists (`compact.jl:3-21`; see SURVEY
§2.2). None of that maps to XLA's static-shape model, and the ordering is
wrong besides.

Here we use the standard 3DGS duplication scheme, shaped for XLA:

  1. per-gaussian tile ranges from the 3-sigma radius (static math),
  2. duplication into a *fixed-capacity* pair list via
     `jnp.repeat(..., total_repeat_length=P)` (overflow counted, not
     reallocated),
  3. one lexicographic `lax.sort` on (tile_id, depth) — giving correct
     per-tile front-to-back order,
  4. per-tile segment offsets via `searchsorted` over the sorted tile ids.

Everything is integer/order data: gradients never flow through this module
(callers gather the differentiable payload with the sorted ids).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..config import RasterConfig
from .projection import Projected


def tile_grid(width: int, height: int, tile_size: int) -> Tuple[int, int]:
    """Number of tiles along x and y (static)."""
    return (-(-width // tile_size), -(-height // tile_size))


def tile_ranges(
    mean2d: jax.Array,   # (N, 2)
    radius: jax.Array,   # (N,) int32, 0 = culled
    tile_size: int,
    tiles_x: int,
    tiles_y: int,
):
    """Inclusive-min / exclusive-max tile rectangle per gaussian.

    Mirrors the classic getRect: covered tiles are those overlapping the
    axis-aligned square of half-width `radius` around the center (reference
    analogue: `boundingbox.jl:24-35` + `binning.jl:14-31`).
    Returns (xmin, ymin, xmax, ymax) int32 arrays; empty if radius == 0.
    """
    r = radius.astype(jnp.float32)
    u, v = mean2d[:, 0], mean2d[:, 1]
    xmin = jnp.clip(jnp.floor((u - r) / tile_size), 0, tiles_x).astype(jnp.int32)
    ymin = jnp.clip(jnp.floor((v - r) / tile_size), 0, tiles_y).astype(jnp.int32)
    xmax = jnp.clip(jnp.floor((u + r) / tile_size) + 1, 0, tiles_x).astype(jnp.int32)
    ymax = jnp.clip(jnp.floor((v + r) / tile_size) + 1, 0, tiles_y).astype(jnp.int32)
    empty = radius <= 0
    xmax = jnp.where(empty, xmin, jnp.maximum(xmax, xmin))
    ymax = jnp.where(empty, ymin, jnp.maximum(ymax, ymin))
    return xmin, ymin, xmax, ymax


@struct.dataclass
class TileBinning:
    """Sorted (tile, depth)-keyed pair list with per-tile segment offsets."""

    sorted_ids: jax.Array    # (P,) int32 gaussian index per pair (garbage past num_pairs)
    sorted_tiles: jax.Array  # (P,) int32 tile id per pair (== num_tiles sentinel past end)
    tile_starts: jax.Array   # (num_tiles + 1,) int32 segment offsets into the sorted list
    num_pairs: jax.Array     # () int32 valid pairs actually binned (<= capacity)
    overflow: jax.Array      # () int32 pairs dropped because capacity was exceeded

    @property
    def capacity(self) -> int:
        return self.sorted_ids.shape[0]


def bin_gaussians(
    proj: Projected,
    width: int,
    height: int,
    cfg: RasterConfig,
    tile_row0=None,
    tile_rows: Optional[int] = None,
    capacity: Optional[int] = None,
) -> TileBinning:
    """Bin into the full tile grid, or — for tile-sharded multi-chip
    rendering (SURVEY §5 long-context analogue) — into a horizontal strip of
    `tile_rows` tile rows starting at dynamic row `tile_row0`; each device
    then bins only its strip with a per-strip pair capacity."""
    n = proj.mean2d.shape[0]
    tiles_x, tiles_y = tile_grid(width, height, cfg.tile_size)
    if tile_rows is None:
        tile_rows = tiles_y
    if tile_row0 is None:
        tile_row0 = jnp.int32(0)
    tile_row0 = jnp.asarray(tile_row0, jnp.int32)
    num_tiles = tiles_x * tile_rows
    if capacity is None:
        capacity = cfg.pair_capacity(n)

    mean2d = jax.lax.stop_gradient(proj.mean2d)
    depth = jax.lax.stop_gradient(proj.depth)

    xmin, ymin, xmax, ymax = tile_ranges(
        mean2d, proj.radius, cfg.tile_size, tiles_x, tiles_y
    )
    # Clip to the strip and re-index rows relative to it.
    ymin = jnp.clip(ymin - tile_row0, 0, tile_rows)
    ymax = jnp.clip(ymax - tile_row0, 0, tile_rows)
    tw = xmax - xmin
    th = ymax - ymin
    counts = jnp.minimum(tw * th, cfg.max_tiles_per_gaussian)
    counts = jnp.where(proj.valid, counts, 0)

    offsets = jnp.cumsum(counts) - counts          # exclusive prefix sum
    total = offsets[-1] + counts[-1]
    overflow = jnp.maximum(total - capacity, 0)

    # Expand: pair p belongs to gaussian ids[p]; its rank within that
    # gaussian's run is k = p - offsets[ids[p]], which enumerates the covered
    # tile rectangle row-major. `jnp.repeat` pads past `total` by repeating
    # the final element; those pairs are masked off below.
    ids = jnp.repeat(
        jnp.arange(n, dtype=jnp.int32), counts, total_repeat_length=capacity
    )
    pos = jnp.arange(capacity, dtype=jnp.int32)
    k = pos - offsets[ids]
    tw_safe = jnp.maximum(tw[ids], 1)
    tile_x = xmin[ids] + k % tw_safe
    tile_y = ymin[ids] + k // tw_safe
    in_range = (pos < jnp.minimum(total, capacity)) & (k >= 0) & (k < counts[ids])

    tile_id = jnp.where(
        in_range, tile_y * tiles_x + tile_x, num_tiles
    ).astype(jnp.int32)
    depth_key = jnp.where(in_range, depth[ids], jnp.inf).astype(jnp.float32)

    # One lexicographic sort on (tile, depth): per-tile lists come out in
    # correct front-to-back order — unlike the reference, whose compaction
    # ranks ignore its depth sort (SURVEY §2.2, compact.jl note).
    sorted_tiles, _, sorted_ids = jax.lax.sort(
        (tile_id, depth_key, ids), num_keys=2
    )

    tile_starts = jnp.searchsorted(
        sorted_tiles,
        jnp.arange(num_tiles + 1, dtype=jnp.int32),
        side="left",
    ).astype(jnp.int32)

    return TileBinning(
        sorted_ids=sorted_ids,
        sorted_tiles=sorted_tiles,
        tile_starts=tile_starts,
        num_pairs=jnp.minimum(total, capacity).astype(jnp.int32),
        overflow=overflow.astype(jnp.int32),
    )
