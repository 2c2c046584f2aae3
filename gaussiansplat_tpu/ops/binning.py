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

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..config import RasterConfig
from .projection import Projected


def tile_grid(width: int, height: int, tile_size: int) -> Tuple[int, int]:
    """Number of tiles along x and y (static)."""
    return (-(-width // tile_size), -(-height // tile_size))


def tile_ranges(
    mean2d: jax.Array,     # (N, 2)
    radius_xy: jax.Array,  # (N, 2) int32 per-axis half-extents, 0 = culled
    tile_size: int,
    tiles_x: int,
    tiles_y: int,
):
    """Inclusive-min / exclusive-max tile rectangle per gaussian.

    Covered tiles are those overlapping the EXACT axis-aligned bounding box
    of the sigma_radius ellipse (per-axis half-extents from the covariance
    diagonal, `projection.radius_xy`) — strictly tighter than the classic
    getRect square of half-width sqrt(lambda_max) (reference analogue:
    `boundingbox.jl:24-35` + `binning.jl:14-31`), up to ~2x fewer pairs for
    anisotropic splats. Returns (xmin, ymin, xmax, ymax) int32 arrays; empty
    if either extent is 0.
    """
    rx = radius_xy[:, 0].astype(jnp.float32)
    ry = radius_xy[:, 1].astype(jnp.float32)
    u, v = mean2d[:, 0], mean2d[:, 1]
    xmin = jnp.clip(jnp.floor((u - rx) / tile_size), 0, tiles_x).astype(jnp.int32)
    ymin = jnp.clip(jnp.floor((v - ry) / tile_size), 0, tiles_y).astype(jnp.int32)
    xmax = jnp.clip(jnp.floor((u + rx) / tile_size) + 1, 0, tiles_x).astype(jnp.int32)
    ymax = jnp.clip(jnp.floor((v + ry) / tile_size) + 1, 0, tiles_y).astype(jnp.int32)
    empty = (radius_xy[:, 0] <= 0) | (radius_xy[:, 1] <= 0)
    xmax = jnp.where(empty, xmin, jnp.maximum(xmax, xmin))
    ymax = jnp.where(empty, ymin, jnp.maximum(ymax, ymin))
    return xmin, ymin, xmax, ymax


# Rects of at most this many tiles get an exact per-tile visible-support
# intersection test (a 32-bit survivor bitmask, row-major over the rect);
# larger rects (rare, huge splats) keep every tile. 32 covers e.g. 4x8 —
# far beyond the ~2-3 tile rects that dominate real scenes.
MASK_TILES = 32


def _rect_qmin(ca, cb, cc, x0, x1, y0, y1):
    """Exact minimum of the PD quadratic form q(d) = ca*dx^2 + 2cb*dx*dy +
    cc*dy^2 over the axis-aligned rectangle [x0,x1]x[y0,y1] (coordinates
    relative to the splat center).

    For a positive-definite q with its minimum (the origin) outside the
    rect, the rect minimum lies on a face NEAR the origin: a far-face
    minimizer with an inward descent direction blocked would need
    det(conic) <= 0. So it suffices to 1D-minimize over the two near faces
    (x = clamp(0) and y = clamp(0)), clamping each face's unconstrained
    stationary point into the face's range; corners are covered by both.
    When the origin is inside, both clamps hit 0 and qmin = 0.

    Degenerate rows must stay finite: zero-padded arrival slots in the
    gauss-shard exchange decode to conic = 0, and 0/0 here would propagate
    NaN into the keep test (NaN compares False -> tile silently culled —
    harmless today because valid=False masks those rows, but one refactor
    away from eating real pairs). Clamping the denominators keeps qmin
    finite (= 0 for conic = 0, i.e. "infinite support, keep the tile") and
    is a no-op for any PD conic (ca, cc > 0)."""
    ca_s = jnp.maximum(ca, 1e-12)
    cc_s = jnp.maximum(cc, 1e-12)
    xe = jnp.clip(0.0, x0, x1)
    ye = jnp.clip(0.0, y0, y1)
    ys = jnp.clip(-cb * xe / cc_s, y0, y1)
    q1 = ca * xe * xe + 2.0 * cb * xe * ys + cc * ys * ys
    xs = jnp.clip(-cb * ye / ca_s, x0, x1)
    q2 = ca * xs * xs + 2.0 * cb * xs * ye + cc * ye * ye
    return jnp.minimum(q1, q2)


def _tile_survivor_mask(
    mean2d, conic, opacity,      # (N, 2), (N, 3), (N,) stop-gradient values
    xmin, ymin, tw, th,          # (N,) int32 strip-clipped rect (tiles)
    tile_row0,                   # () int32 strip offset (rows)
    tile_size: int,
    sigma_radius: float,
    alpha_min: float,
) -> jax.Array:
    """(N,) int32 bitmask of rect-local tiles (bit b = ky*tw + kx, row-major)
    whose pixel square intersects the splat's visible support
    {q <= min(sigma_radius^2, 2 ln(op/alpha_min))}.

    The rasterizers zero every contribution outside that support
    (ops/pallas/common.chunk_alpha's q/alpha gates), so dropping the other
    tiles is output-exact. The test lower-bounds q over each tile's
    CONTINUOUS [ts]x[ts] square (pixel samples lie inside it, and the square
    extends one pixel past the last sample — slack for the kernels' own
    rounding of q), with a further 1e-3 relative margin. Computed once
    host-side in plain f32 and shared verbatim by the Pallas expand kernel
    and the XLA expansion, so both impls make bit-identical decisions."""
    f32 = jnp.float32
    u = mean2d[:, 0:1]
    v = mean2d[:, 1:2]
    ca, cb, cc = conic[:, 0:1], conic[:, 1:2], conic[:, 2:3]
    tau = 2.0 * (jnp.log(jnp.maximum(opacity, 1e-12))[:, None]
                 - float(np.log(alpha_min)))
    tau = jnp.minimum(tau, sigma_radius * sigma_radius)
    bb = jnp.arange(MASK_TILES, dtype=jnp.int32)[None, :]
    tw_s = jnp.maximum(tw, 1)[:, None]
    ky = bb // tw_s
    kx = bb - ky * tw_s
    x0 = ((xmin[:, None] + kx) * tile_size).astype(f32) - u
    y0 = ((ymin[:, None] + ky + tile_row0) * tile_size).astype(f32) - v
    qmin = _rect_qmin(ca, cb, cc, x0, x0 + tile_size, y0, y0 + tile_size)
    keep = (bb < (tw * th)[:, None]) & (qmin * 0.999 - 1e-2 <= tau)
    bits = jnp.where(keep, jnp.left_shift(jnp.int32(1), bb), 0)
    return jnp.sum(bits, axis=1).astype(jnp.int32)


def _kth_set_bit(mask: jax.Array, k: jax.Array) -> jax.Array:
    """Index of the k-th (0-based) set bit of each int32 lane; 0 if there is
    no such bit (callers only consume lanes where k < popcount(mask))."""
    cnt = jnp.zeros_like(k)
    sel = jnp.zeros_like(k)
    for bit in range(MASK_TILES):
        isset = jnp.right_shift(mask, bit) & 1
        sel = jnp.where((cnt == k) & (isset == 1), bit, sel)
        cnt = cnt + isset
    return sel


@struct.dataclass
class TileBinning:
    """Sorted (tile, depth)-keyed pair list with per-tile segment offsets.

    Pair indices are kept in DEPTH-RANK space (`sorted_ranks` indexes
    gaussians after the depth presort; `depth_order` maps rank -> original
    index). Use `gather_payload` / `sorted_ids` rather than indexing
    manually: the two-stage gather (reorder N rows once, then gather P pairs
    from the small reordered table) is ~2x cheaper than a fused P-sized
    gather through the composed index map, and `gather_payload` carries a
    custom VJP that reduces pair gradients per gaussian WITHOUT an XLA
    scatter (~110ns/index on TPU; see ops/pallas/segreduce.py).
    """

    sorted_ranks: jax.Array  # (P,) int32 depth-rank per pair (garbage past num_pairs)
    depth_order: jax.Array   # (N,) int32 depth rank -> original gaussian index
    sorted_tiles: jax.Array  # (P,) int32 tile id per pair (== num_tiles sentinel past end)
    tile_starts: jax.Array   # (num_tiles + 1,) int32 segment offsets into the sorted list
    num_pairs: jax.Array     # () int32 valid pairs actually binned (<= capacity)
    overflow: jax.Array      # () int32 pairs dropped because capacity was exceeded
    sorted_pos: jax.Array    # (P,) int32 pre-sort pair position per sorted slot
    seg_offsets: jax.Array   # (N + 1,) int32 pre-sort segment start per depth rank

    @property
    def capacity(self) -> int:
        return self.sorted_ranks.shape[0]

    @property
    def sorted_ids(self) -> jax.Array:
        """(P,) original gaussian index per pair (materializes a P-gather;
        prefer gather_payload on hot paths)."""
        return self.depth_order[self.sorted_ranks]

    def gather_payload(self, payload: jax.Array, impl: str = "auto") -> jax.Array:
        """Gather per-gaussian payload rows into sorted pair order.

        Differentiable: the VJP sums each gaussian's per-pair gradient rows
        deterministically via sort + contiguous-segment reduction instead of
        XLA scatter-add (which costs more than the whole rasterizer at
        4M pairs — benchmarks/micro_sortgather.py).
        """
        return _gather_sorted(
            _resolve_reduce_impl(impl),
            payload,
            dict(
                sorted_ranks=self.sorted_ranks,
                depth_order=self.depth_order,
                sorted_pos=self.sorted_pos,
                seg_offsets=self.seg_offsets,
                num_pairs=self.num_pairs,
            ),
        )


def _resolve_reduce_impl(impl: str) -> str:
    if impl != "auto":
        return impl
    return "pallas" if jax.default_backend() == "tpu" else "xla"


def reduce_pair_grads(
    dsorted: jax.Array,      # (P, NCH) per-pair cotangents, sorted pair order
    sorted_ranks: jax.Array,  # (P,) int32
    depth_order: jax.Array,  # (N,) int32
    sorted_pos: jax.Array,   # (P,) int32
    seg_offsets: jax.Array,  # (N + 1,) int32
    num_pairs: jax.Array,    # () int32
    impl: str,
) -> jax.Array:
    """Deterministic per-gaussian reduction of per-pair gradient rows.

    The pallas path un-permutes the rows to pre-sort order (one key sort for
    the inverse permutation + one gather), where each gaussian's pairs are
    contiguous, then runs the MXU segment-reduce kernel. The xla path is an
    independent formulation (unsorted segment_sum) used on CPU and as the
    cross-check oracle in tests. Both avoid `.at[].add` entirely.
    """
    p, nch = dsorted.shape
    n = depth_order.shape[0]
    iota = jnp.arange(p, dtype=jnp.int32)

    if impl in ("pallas", "pallas_interpret") and nch == 16:
        from .pallas.segreduce import segment_reduce_pairs

        inv = jax.lax.sort((sorted_pos, iota), num_keys=1)[1]
        dpre = dsorted[inv]  # pre-sort order: contiguous per depth rank
        dpre = jnp.where((iota < num_pairs)[:, None], dpre, 0.0)
        dpay_rank = segment_reduce_pairs(
            dpre.T, seg_offsets, n, interpret=(impl == "pallas_interpret")
        )
    else:
        valid = (iota < num_pairs)[:, None]
        dpay_rank = jax.ops.segment_sum(
            jnp.where(valid, dsorted, 0.0), sorted_ranks, num_segments=n
        )

    # depth-rank space -> original gaussian order via the inverse permutation
    # of the depth sort (computed as a sort, never a scatter).
    rank_of = jax.lax.sort(
        (depth_order, jnp.arange(n, dtype=jnp.int32)), num_keys=1
    )[1]
    # NB: no 9-channel shortcut here — gather_payload is a public VJP whose
    # callers may carry real cotangents on ANY channel (tests do); only the
    # packed rasterizer path (below) has structurally-zero tails.
    return dpay_rank[rank_of]


def _gather_grad_rows(dpay_rank: jax.Array, rank_of: jax.Array) -> jax.Array:
    """Apply the rank->original permutation to reduced gradients through an
    8-channel row table. TPU row gathers have a hard fast path at width
    <= 8 f32 (measured 16.7 ms vs 38.3 ms for ANY width >= 9, N=3M), so
    the 9 live channels (mean2d, conic, opacity, rgb) ride as 6 exact f32
    lanes + one bf16 bit-pair for (r, g) + b exact. Quantizing the REDUCED
    color-gradient values to bf16 is sound where per-pair packing is not:
    the error is ~0.4% OF THE FINAL summed gradient (no cancellation
    amplification), the same class as the packed path's existing bf16
    color quantization. The wsum/depth channels (9, 10) have no cotangent
    in this VJP — the rasterizer returns only image and transmittance —
    and 11..15 are stop-gradient scratch: all exactly zero, reproduced by
    the zero-pad. The barrier keeps XLA from fusing the repack into the
    gather (which would re-widen the gathered rows past the fast path)."""
    from .pallas.common import pack_bf16_pair, unpack_bf16_pair

    n = dpay_rank.shape[0]
    rows8 = jnp.concatenate(
        [
            dpay_rank[:, :6],
            pack_bf16_pair(dpay_rank[:, 6:7], dpay_rank[:, 7:8]),
            dpay_rank[:, 8:9],
        ],
        axis=1,
    )
    rows8 = jax.lax.optimization_barrier(rows8)[rank_of]
    r, g = unpack_bf16_pair(rows8[:, 6:7])
    return jnp.concatenate(
        [
            rows8[:, :6], r, g, rows8[:, 7:8],
            jnp.zeros((n, dpay_rank.shape[1] - 9), dpay_rank.dtype),
        ],
        axis=1,
    )


def reduce_pair_grads_packed_t(
    dsorted_t: jax.Array,    # (NCH_PACKED, P) packed per-pair cotangents,
                             # channel-major, sorted pair order
    sorted_ranks: jax.Array,
    depth_order: jax.Array,
    sorted_pos: jax.Array,
    seg_offsets: jax.Array,
    num_pairs: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """Packed, channel-major twin of reduce_pair_grads (used by the fused
    packed rasterizer): the un-permute gather moves 8 packed lanes instead of
    16 f32 rows and no (P, NCH) transpose ever materializes. Returns (N, NCH)
    unpacked gradients in original gaussian order."""
    del sorted_ranks  # order comes from sorted_pos; kept for signature parity
    from .pallas.segreduce import segment_reduce_pairs

    nch_p, p = dsorted_t.shape
    n = depth_order.shape[0]
    iota = jnp.arange(p, dtype=jnp.int32)

    # Un-permute by carrying the 8 grad lanes through ONE variadic sort keyed
    # on sorted_pos: measured cheaper than inverse-permutation sort + lane
    # gather (the gather pays ~7ns/index; extra sort operands ~1ms/M each).
    # NB: quantizing the carried lanes to bf16 (to halve the operand count)
    # is UNSOUND here — a gaussian's per-pair grads can nearly cancel, so
    # per-pair rounding error scales with the largest pair grad, not the
    # sum, and blows up the reduced gradient (measured 100x outliers).
    # Garbage tail rows (pre-sort position >= num_pairs) sort to the end and
    # are zeroed so uninitialized NaN bits can't poison the MXU reduction.
    # LOAD-BEARING INVARIANT (established by the expansion step in
    # expand_pairs / pallas/expand.py): valid pairs occupy pre-sort positions
    # [0, num_pairs) contiguously — invalid slots all carry positions
    # >= num_pairs. If expansion ever interleaved invalid slots among valid
    # ones, the mask below would zero real gradients and sum garbage.
    ops = jax.lax.sort(
        (sorted_pos,) + tuple(dsorted_t[i] for i in range(nch_p)),
        num_keys=1,
    )
    dpre_t = jnp.stack(ops[1:], axis=0)          # pre-sort order, packed
    dpre_t = jnp.where((iota < num_pairs)[None, :], dpre_t, 0.0)
    dpay_rank = segment_reduce_pairs(
        dpre_t, seg_offsets, n, interpret=interpret, packed=True
    )
    rank_of = jax.lax.sort(
        (depth_order, jnp.arange(n, dtype=jnp.int32)), num_keys=1
    )[1]
    return _gather_grad_rows(dpay_rank, rank_of)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _gather_sorted(impl: str, payload: jax.Array, b: dict):
    del impl
    return payload[b["depth_order"]][b["sorted_ranks"]]


def _gather_sorted_fwd(impl, payload, b):
    return _gather_sorted(impl, payload, b), b


def _gather_sorted_bwd(impl, b, dsorted):
    dpayload = reduce_pair_grads(
        dsorted,
        b["sorted_ranks"],
        b["depth_order"],
        b["sorted_pos"],
        b["seg_offsets"],
        b["num_pairs"],
        impl,
    )
    zeros = jax.tree_util.tree_map(
        lambda x: np.zeros(x.shape, jax.dtypes.float0), b
    )
    return dpayload, zeros


_gather_sorted.defvjp(_gather_sorted_fwd, _gather_sorted_bwd)


def bin_gaussians(
    proj: Projected,
    width: int,
    height: int,
    cfg: RasterConfig,
    tile_row0=None,
    tile_rows: Optional[int] = None,
    capacity: Optional[int] = None,
    impl: str = "auto",
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
    impl = _resolve_reduce_impl(impl)

    mean2d = jax.lax.stop_gradient(proj.mean2d)
    depth = jax.lax.stop_gradient(proj.depth)

    xmin, ymin, xmax, ymax = tile_ranges(
        mean2d, proj.radius_xy, cfg.tile_size, tiles_x, tiles_y
    )
    # Clip to the strip and re-index rows relative to it.
    ymin = jnp.clip(ymin - tile_row0, 0, tile_rows)
    ymax = jnp.clip(ymax - tile_row0, 0, tile_rows)
    tw = xmax - xmin
    th = ymax - ymin
    counts = jnp.minimum(tw * th, cfg.max_tiles_per_gaussian)
    counts = jnp.where(proj.valid, counts, 0)

    by = max(int(tile_rows).bit_length(), 1)
    bw = max(int(tiles_x).bit_length(), 1)
    bx, bh = bw, by
    rect_packable = bx + by + bw + bh <= 31

    # Exact per-tile support cull (see _tile_survivor_mask): rects of up to
    # MASK_TILES tiles keep only the tiles the visible-support ellipse
    # actually touches. mask == 0 means "dense rect" downstream; maskable
    # splats whose every tile is culled get counts = 0 and compact to the
    # tail like empties, so the sentinel never collides with them.
    do_cull = cfg.tile_cull and rect_packable
    if do_cull:
        mask = _tile_survivor_mask(
            mean2d,
            jax.lax.stop_gradient(proj.conic),
            jax.lax.stop_gradient(proj.opacity),
            xmin, ymin, tw, th, tile_row0,
            cfg.tile_size, cfg.sigma_radius, cfg.alpha_min,
        )
        maskable = (counts > 0) & (tw * th <= MASK_TILES)
        surv = jax.lax.population_count(mask)
        counts = jnp.where(
            maskable, jnp.minimum(surv, cfg.max_tiles_per_gaussian), counts
        )
        mask = jnp.where(maskable, mask, 0)
    else:
        mask = jnp.zeros_like(counts)

    # One combined compaction + depth sort: nonempty gaussians first, by
    # depth, ties broken by original index (keys unique -> deterministic).
    # Among nonempty gaussians — the only ones that emit pairs — this order
    # IS depth order, so "rank in this order" serves as the depth rank
    # everywhere below (pair keys, seg_offsets, payload gathers). Empties
    # compact to the tail so the expansion streams only owning descriptors
    # (the Pallas expand kernel's window bound relies on every in-range
    # descriptor owning >= 1 pair). The reference never achieves a per-tile
    # depth order at all: its compaction ranks are computed in original index
    # order (`compact.jl:3-21`, SURVEY §2.2).
    # The empty flag is FOLDED INTO the depth key (+inf sorts empties to the
    # tail; depth is a positive view-space z for every valid gaussian), so
    # the sort runs one lane lighter — measured 6.8 -> 5.4 ms at 1M and
    # 17.8 -> 13.9 ms at 3M on chip (benchmarks/profile_binning_*_r4.json).
    # The tail's internal order changes (iota vs (depth, iota)) but nothing
    # downstream reads tail rows: their counts are 0, they emit no pairs,
    # and their gradient rows are zero.
    iota_n = jnp.arange(n, dtype=jnp.int32)
    depth_key = jnp.where(counts > 0, depth, jnp.inf)
    if rect_packable:
        # Ride the packed rect (and the survivor mask) through the compaction
        # sort as extra operands: one extra sort lane costs ~1ms/M on TPU
        # where a post-hoc rect[comp_order] gather costs ~7ns per index
        # (~7ms/M).
        rect = ((((xmin << by) | ymin) << bw) | tw) << bh | th
        rect = jnp.where(counts > 0, rect, 0)
        _, comp_order, rect_c, mask_c = jax.lax.sort(
            (depth_key, iota_n, rect, mask),
            num_keys=2,
        )
        th_c = rect_c & ((1 << bh) - 1)
        tw_c = (rect_c >> bh) & ((1 << bw) - 1)
        ymin_c = (rect_c >> (bh + bw)) & ((1 << by) - 1)
        xmin_c = rect_c >> (bh + bw + by)
        # Recover counts from the carried lanes (rect = 0 rows — empties and
        # fully-culled maskable splats — give 0 either way).
        counts_dense = jnp.minimum(tw_c * th_c, cfg.max_tiles_per_gaussian)
        counts_c = jnp.where(
            mask_c != 0,
            jnp.minimum(jax.lax.population_count(mask_c),
                        cfg.max_tiles_per_gaussian),
            counts_dense,
        )
    else:  # enormous tile grids: gather fields separately
        rect_c = None
        mask_c = None
        _, comp_order = jax.lax.sort((depth_key, iota_n), num_keys=2)
        xmin_c, ymin_c, tw_c = (
            xmin[comp_order], ymin[comp_order], tw[comp_order]
        )
        counts_c = counts[comp_order]
    order = comp_order
    xmin, ymin, tw, counts = xmin_c, ymin_c, tw_c, counts_c

    offsets = jnp.cumsum(counts) - counts          # exclusive prefix sum
    total = offsets[-1] + counts[-1]
    overflow = jnp.maximum(total - capacity, 0)

    off_c = jnp.minimum(offsets, capacity).astype(jnp.int32)
    num_pairs = jnp.minimum(total, capacity).astype(jnp.int32)
    pos = jnp.arange(capacity, dtype=jnp.int32)

    tile_bits = max(int(num_tiles + 1).bit_length(), 1)
    rank_bits = max(int(n - 1).bit_length(), 1) if n > 1 else 1
    packed_keys = tile_bits + rank_bits <= 31
    # The expand kernel covers both key regimes: packed single-key when the
    # (tile, rank) pair fits 31 bits, else separate tile/rank streams for a
    # stable tile-keyed sort (1080p at >= 2M gaussians — the BASELINE
    # config-3..5 scales — lands here; round 2 silently fell back to the
    # XLA delta-scatter expansion, 3.6x worse per ray).
    use_pallas_expand = (
        impl in ("pallas", "pallas_interpret") and rect_packable
    )

    if use_pallas_expand:
        from .pallas.expand import expand_pairs_pallas

        out = expand_pairs_pallas(
            off_c, rect_c, mask_c, num_pairs, capacity,
            tiles_x, num_tiles, rank_bits, (by, bw, bh),
            interpret=(impl == "pallas_interpret"),
            packed=packed_keys,
        )
        if packed_keys:
            sorted_key, sorted_pos = jax.lax.sort((out, pos), num_keys=1)
            sorted_tiles = (sorted_key >> rank_bits).astype(jnp.int32)
            sorted_ids_o = sorted_key & ((1 << rank_bits) - 1)
        else:
            # (tile, rank) keys are unique (a gaussian emits at most one
            # pair per tile), so the non-stable 2-key sort reproduces the
            # lexicographic order a stable tile-only sort would give, a
            # shade cheaper (measured 20.3 -> 20.1 ms @3M, 48.0 -> 47.4 ms
            # @8M on chip).
            sorted_tiles, sorted_ids_o, sorted_pos = jax.lax.sort(
                (out[0], out[1], pos), num_keys=2
            )
        return _finish_binning(
            sorted_ids_o, order, sorted_tiles, sorted_pos, off_c,
            num_pairs, overflow, num_tiles,
        )

    # XLA expansion: expand WITHOUT per-pair gathers (a P-sized gather from
    # an N-sized table costs ~8x a streaming pass at this scale, and the
    # naive form needs five of them plus jnp.repeat's searchsorted): scatter
    # per-segment DELTAS of the per-gaussian descriptors at each segment
    # start, then one cumsum telescopes them into "this segment's
    # descriptor" at every pair position — exact under the telescoping sum
    # since intermediate values are always a real descriptor, never a
    # partial field. (x64 is disabled, so no i64 mega-pack.)
    # Scatter at segment starts; empty segments share a start with their
    # successor and their deltas accumulate — telescoping keeps the sum
    # equal to the OWNING (last) gaussian's descriptor. Out-of-capacity
    # segment starts drop (their pairs are beyond the buffer anyway).
    pos32 = offsets.astype(jnp.int32)
    z32 = jnp.zeros((capacity,), jnp.int32)
    if bx + by + bw <= 31:
        xyw = (
            ((xmin.astype(jnp.int32) << by) | ymin.astype(jnp.int32)) << bw
        ) | tw.astype(jnp.int32)
        d_xyw = jnp.diff(xyw, prepend=0)
        seg_xyw = z32.at[pos32].add(d_xyw, mode="drop")
        xyw_p = jnp.cumsum(seg_xyw)
        xm = xyw_p >> (by + bw)
        ym = (xyw_p >> bw) & ((1 << by) - 1)
        tw_p = xyw_p & ((1 << bw) - 1)
    else:  # enormous tile grids: fall back to two packed streams
        xy = (xmin.astype(jnp.int32) << 14) | ymin.astype(jnp.int32)
        seg_xy = z32.at[pos32].add(jnp.diff(xy, prepend=0), mode="drop")
        seg_tw = z32.at[pos32].add(jnp.diff(tw, prepend=0), mode="drop")
        xy_p = jnp.cumsum(seg_xy)
        tw_p = jnp.cumsum(seg_tw)
        xm = (xy_p >> 14) & 0x3FFF
        ym = xy_p & 0x3FFF
    d_off = jnp.diff(off_c, prepend=0)
    seg_off = z32.at[pos32].add(d_off, mode="drop")
    seg_one = z32.at[pos32].add(jnp.ones((n,), jnp.int32), mode="drop")
    off_p = jnp.cumsum(seg_off)
    ids_o = jnp.cumsum(seg_one) - 1                 # depth rank per pair

    k = pos - off_p
    if do_cull:
        # Survivor-mask stream (same telescoping-delta trick; int32 cumsum
        # wraparound is two's-complement exact). Pair k of a masked gaussian
        # occupies its k-th SET BIT's rect-local slot; mask 0 = dense rect.
        d_mask = jnp.diff(mask_c, prepend=0)
        seg_mask = z32.at[pos32].add(d_mask, mode="drop")
        mask_p = jnp.cumsum(seg_mask)
        sel = _kth_set_bit(mask_p, k)
        k = jnp.where(mask_p == 0, k, sel)
    tw_safe = jnp.maximum(tw_p, 1)
    tile_x = xm + k % tw_safe
    tile_y = ym + k // tw_safe
    # Segments tile [0, total) exactly, so k ∈ [0, counts) holds wherever
    # pos < total; only the tail needs masking.
    in_range = pos < num_pairs

    tile_id = jnp.where(
        in_range, tile_y * tiles_x + tile_x, num_tiles
    ).astype(jnp.int32)

    if packed_keys:
        key = (tile_id << rank_bits) | ids_o
        sorted_key, sorted_pos = jax.lax.sort((key, pos), num_keys=1)
        sorted_tiles = (sorted_key >> rank_bits).astype(jnp.int32)
        sorted_ids_o = sorted_key & ((1 << rank_bits) - 1)
    else:
        # Same 2-key form as the pallas-expand branch; (tile, rank) is
        # unique among in-range pairs, and tail duplicates (sentinel tile)
        # land past num_pairs where every consumer masks.
        sorted_tiles, sorted_ids_o, sorted_pos = jax.lax.sort(
            (tile_id, ids_o, pos), num_keys=2
        )

    return _finish_binning(
        sorted_ids_o, order, sorted_tiles, sorted_pos, off_c,
        num_pairs, overflow, num_tiles,
    )


def _finish_binning(
    sorted_ids_o, order, sorted_tiles, sorted_pos, off_c,
    num_pairs, overflow, num_tiles,
) -> TileBinning:
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
        num_pairs=num_pairs,
        overflow=overflow.astype(jnp.int32),
        sorted_pos=sorted_pos,
        seg_offsets=jnp.concatenate([off_c, num_pairs[None]]),
    )
