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
    """Sorted (tile, depth)-keyed pair list with per-tile segment offsets.

    Pair indices are kept in DEPTH-RANK space (`sorted_ranks` indexes
    gaussians after the depth presort; `depth_order` maps rank -> original
    index). Use `gather_payload` / `sorted_ids` rather than indexing
    manually: the two-stage gather (reorder N rows once, then gather P pairs
    from the small reordered table) is ~2x cheaper than a fused P-sized
    gather through the composed index map.
    """

    sorted_ranks: jax.Array  # (P,) int32 depth-rank per pair (garbage past num_pairs)
    depth_order: jax.Array   # (N,) int32 depth rank -> original gaussian index
    sorted_tiles: jax.Array  # (P,) int32 tile id per pair (== num_tiles sentinel past end)
    tile_starts: jax.Array   # (num_tiles + 1,) int32 segment offsets into the sorted list
    num_pairs: jax.Array     # () int32 valid pairs actually binned (<= capacity)
    overflow: jax.Array      # () int32 pairs dropped because capacity was exceeded

    @property
    def capacity(self) -> int:
        return self.sorted_ranks.shape[0]

    @property
    def sorted_ids(self) -> jax.Array:
        """(P,) original gaussian index per pair (materializes a P-gather;
        prefer gather_payload on hot paths)."""
        return self.depth_order[self.sorted_ranks]

    def gather_payload(self, payload: jax.Array) -> jax.Array:
        """Gather per-gaussian payload rows into sorted pair order."""
        return payload[self.depth_order][self.sorted_ranks]


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

    # Depth-presort the N gaussians once (N << P pairs), then expand pairs in
    # that order: a single sort on tile id alone leaves every tile segment in
    # exact front-to-back order. Packing the depth rank into the key keeps
    # the sort single-key AND stable-equivalent (keys unique per pair) —
    # still exact, unlike the reference, whose compaction ranks ignore its
    # depth sort (SURVEY §2.2, compact.jl note).
    order = jnp.argsort(depth, stable=True).astype(jnp.int32)

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

    # Reindex per-gaussian data into depth order.
    xmin, ymin, tw = xmin[order], ymin[order], tw[order]
    counts = counts[order]

    offsets = jnp.cumsum(counts) - counts          # exclusive prefix sum
    total = offsets[-1] + counts[-1]
    overflow = jnp.maximum(total - capacity, 0)

    # Expand WITHOUT per-pair gathers (a P-sized gather from an N-sized
    # table costs ~8x a streaming pass at this scale, and the naive form
    # needs five of them plus jnp.repeat's searchsorted): scatter per-segment
    # DELTAS of the per-gaussian descriptors at each segment start, then one
    # cumsum telescopes them into "this segment's descriptor" at every pair
    # position. (xmin:14 | ymin:14) pack into one i32 — exact under the
    # telescoping sum since intermediate values are always a real descriptor,
    # never a partial field. (x64 is disabled, so no i64 mega-pack.)
    off_c = jnp.minimum(offsets, capacity).astype(jnp.int32)
    xy = (xmin.astype(jnp.int32) << 14) | ymin.astype(jnp.int32)
    d_off = jnp.diff(off_c, prepend=0)
    d_xy = jnp.diff(xy, prepend=0)
    d_tw = jnp.diff(tw, prepend=0)
    # Scatter at segment starts; empty segments share a start with their
    # successor and their deltas accumulate — telescoping keeps the sum
    # equal to the OWNING (last) gaussian's descriptor. Out-of-capacity
    # segment starts drop (their pairs are beyond the buffer anyway).
    pos32 = offsets.astype(jnp.int32)
    z32 = jnp.zeros((capacity,), jnp.int32)
    seg_off = z32.at[pos32].add(d_off, mode="drop")
    seg_xy = z32.at[pos32].add(d_xy, mode="drop")
    seg_tw = z32.at[pos32].add(d_tw, mode="drop")
    seg_one = z32.at[pos32].add(jnp.ones((n,), jnp.int32), mode="drop")
    off_p = jnp.cumsum(seg_off)
    xy_p = jnp.cumsum(seg_xy)
    tw_p = jnp.cumsum(seg_tw)
    ids_o = jnp.cumsum(seg_one) - 1                 # depth rank per pair

    pos = jnp.arange(capacity, dtype=jnp.int32)
    xm = (xy_p >> 14) & 0x3FFF
    ym = xy_p & 0x3FFF
    k = pos - off_p
    tw_safe = jnp.maximum(tw_p, 1)
    tile_x = xm + k % tw_safe
    tile_y = ym + k // tw_safe
    # Segments tile [0, total) exactly, so k ∈ [0, counts) holds wherever
    # pos < total; only the tail needs masking.
    in_range = pos < jnp.minimum(total, capacity)

    tile_id = jnp.where(
        in_range, tile_y * tiles_x + tile_x, num_tiles
    ).astype(jnp.int32)

    tile_bits = max(int(num_tiles + 1).bit_length(), 1)
    rank_bits = max(int(n - 1).bit_length(), 1) if n > 1 else 1
    if tile_bits + rank_bits <= 31:
        key = (tile_id << rank_bits) | ids_o
        sorted_key, sorted_ids_o = jax.lax.sort((key, ids_o), num_keys=1)
        sorted_tiles = (sorted_key >> rank_bits).astype(jnp.int32)
    else:
        sorted_tiles, sorted_ids_o = jax.lax.sort(
            (tile_id, ids_o), num_keys=1, is_stable=True
        )

    tile_starts = jnp.searchsorted(
        sorted_tiles,
        jnp.arange(num_tiles + 1, dtype=jnp.int32),
        side="left",
    ).astype(jnp.int32)

    return TileBinning(
        sorted_ranks=sorted_ids_o,
        depth_order=order,
        sorted_tiles=sorted_tiles,
        tile_starts=tile_starts,
        num_pairs=jnp.minimum(total, capacity).astype(jnp.int32),
        overflow=overflow.astype(jnp.int32),
    )
