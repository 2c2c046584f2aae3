"""Coverage for the enormous-tile-grid binning fallbacks (VERDICT r1 item 7):
the non-packable-rect compaction path, the two-stream delta-scatter
expansion, and the non-packable-key 3-operand stable sort — each checked
against a brute-force numpy oracle of the same binning semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussiansplat_tpu.config import RasterConfig
from gaussiansplat_tpu.ops.binning import bin_gaussians, tile_grid
from gaussiansplat_tpu.ops.projection import Projected


def _fake_proj(n, width, height, seed=0, max_r=None, n_valid=None):
    rng = np.random.default_rng(seed)
    mean2d = rng.random((n, 2), dtype=np.float32) * [width, height]
    max_r = max_r or max(width, height) / 16
    radius = rng.integers(1, int(max_r), size=n).astype(np.int32)
    # Distinct depths (a float32 uniform draw collides at these n).
    depth = rng.permutation(n).astype(np.float32) + 0.5
    valid = np.ones((n,), bool)
    if n_valid is not None:
        valid[n_valid:] = False
        radius[n_valid:] = 0
    # conic = 0 (guarded to qmin = 0, i.e. infinite support) + opacity = 1
    # make the tile-survivor cull keep every rect tile, so the dense-rect
    # numpy oracle below models the binning exactly while the cull machinery
    # (mask streams, kth-set-bit decode) still runs with all-ones masks.
    # Output-exactness of the cull itself is covered by
    # test_render.py::TestBinning::test_tile_cull_output_exact.
    z3 = np.zeros((n, 3), np.float32)
    return Projected(
        mean2d=jnp.asarray(mean2d), depth=jnp.asarray(depth),
        conic=jnp.asarray(z3), rgb=jnp.asarray(z3),
        opacity=jnp.ones((n,), jnp.float32),
        radius=jnp.asarray(radius),
        radius_xy=jnp.stack(
            [jnp.asarray(radius), jnp.asarray(radius)], axis=-1),
        valid=jnp.asarray(valid),
    ), mean2d, radius, depth, valid


def _oracle(mean2d, radius, depth, valid, ts, tiles_x, tiles_y,
            tile_rows, capacity, max_tiles):
    """Reimplementation of bin_gaussians' semantics in plain numpy."""
    n = len(depth)
    r = radius.astype(np.float64)
    u, v = mean2d[:, 0].astype(np.float64), mean2d[:, 1].astype(np.float64)
    xmin = np.clip(np.floor((u - r) / ts), 0, tiles_x).astype(np.int64)
    ymin = np.clip(np.floor((v - r) / ts), 0, tiles_y).astype(np.int64)
    xmax = np.clip(np.floor((u + r) / ts) + 1, 0, tiles_x).astype(np.int64)
    ymax = np.clip(np.floor((v + r) / ts) + 1, 0, tiles_y).astype(np.int64)
    empty = radius <= 0
    xmax = np.where(empty, xmin, np.maximum(xmax, xmin))
    ymax = np.where(empty, ymin, np.maximum(ymax, ymin))
    ymin = np.clip(ymin, 0, tile_rows)
    ymax = np.clip(ymax, 0, tile_rows)
    tw, th = xmax - xmin, ymax - ymin
    counts = np.minimum(tw * th, max_tiles)
    counts = np.where(valid, counts, 0)

    # compaction: nonempty first by depth, ties by index; empties sort to
    # the tail via a +inf depth key (in index order among themselves),
    # matching bin_gaussians' folded single-key compaction sort
    depth_key = np.where(counts == 0, np.inf, depth)
    order = np.lexsort((np.arange(n), depth_key))
    pairs = []  # (tile, rank, gaussian)
    pos = 0
    for rank, g in enumerate(order):
        c = int(counts[g])
        for k in range(c):
            if pos < capacity:
                tx = xmin[g] + k % max(tw[g], 1)
                ty = ymin[g] + k // max(tw[g], 1)
                pairs.append((int(ty * tiles_x + tx), rank, int(g)))
            pos += 1
    total = pos
    per_tile = {}
    for tile, rank, g in sorted(pairs, key=lambda p: (p[0], p[1])):
        per_tile.setdefault(tile, []).append(g)
    return per_tile, min(total, capacity), max(total - capacity, 0), order


def _check(binning, per_tile, num_pairs, overflow, order, num_tiles):
    assert int(binning.num_pairs) == num_pairs
    assert int(binning.overflow) == overflow
    np.testing.assert_array_equal(np.asarray(binning.depth_order), order)
    starts = np.asarray(binning.tile_starts)
    ranks = np.asarray(binning.sorted_ranks)
    dorder = np.asarray(binning.depth_order)
    nonempty = sorted(per_tile)
    # every oracle-nonempty tile has exactly the oracle's id list, in order
    for t in nonempty:
        ids = dorder[ranks[starts[t]:starts[t + 1]]]
        np.testing.assert_array_equal(ids, per_tile[t], err_msg=f"tile {t}")
    # total pairs across all segments == num_pairs
    assert starts[num_tiles] == num_pairs


def _run_case(n, width, height, ts, capacity, seed=0, n_valid=None,
              max_r=None):
    cfg = RasterConfig(tile_size=ts, impl="xla")
    tiles_x, tiles_y = tile_grid(width, height, ts)
    proj, mean2d, radius, depth, valid = _fake_proj(
        n, width, height, seed=seed, max_r=max_r, n_valid=n_valid)
    binning = jax.jit(
        lambda p: bin_gaussians(p, width, height, cfg, capacity=capacity,
                                impl="xla")
    )(proj)
    per_tile, num_pairs, overflow, order = _oracle(
        mean2d, radius, depth, valid, ts, tiles_x, tiles_y, tiles_y,
        capacity, cfg.max_tiles_per_gaussian)
    _check(binning, per_tile, num_pairs, overflow, order,
           tiles_x * tiles_y)


class TestBinningFallbacks:
    def test_packable_baseline(self):
        # sanity: the oracle agrees with the normal packed path too
        _run_case(n=96, width=1024, height=512, ts=32, capacity=4096)

    def test_rect_not_packable(self):
        # 512x512 tile grid: bx+by+bw+bh = 40 > 31 -> separate-gather
        # compaction (binning.py rect_packable=False branch); the xyw
        # delta-scatter (30 bits) still packs.
        _run_case(n=64, width=8192, height=8192, ts=16, capacity=8192,
                  max_r=400)

    def test_two_stream_delta_scatter(self):
        # 4096x2048 tile grid: bx+by+bw = 38 > 31 -> the two packed-stream
        # expansion fallback (and rect_packable=False).
        _run_case(n=48, width=65536, height=32768, ts=16, capacity=8192,
                  max_r=2000, seed=1)

    def test_keys_not_packable(self):
        # 65536 gaussians (rank_bits 16) x 32768 tiles (tile_bits 16):
        # tile_bits + rank_bits = 32 > 31 -> 3-operand stable sort.
        _run_case(n=65536, width=4096, height=2048, ts=16, capacity=4096,
                  n_valid=64, max_r=100, seed=2)

    def test_overflow_counted(self):
        # capacity deliberately too small: overflow must match the oracle
        # and segments must stay consistent.
        _run_case(n=96, width=1024, height=512, ts=32, capacity=512, seed=3)
