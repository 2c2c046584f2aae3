"""Tile-based forward rasterizer, XLA (pure JAX) implementation.

This is the algorithmic twin of the Pallas TPU kernel (ops/pallas/): the same
chunked, log-transmittance compositing math expressed with jnp ops, vmapped
over tiles. It replaces the reference's `splatDraw` CUDA kernel
(`splat.jl:195-269`: one thread per pixel, shared-memory RGBT accumulator,
serial walk of the per-tile list with no early termination) with a
vectorized-over-pixels, chunked-over-gaussians schedule:

  for each tile (vmap), for each depth-ordered chunk of `chunk_size`
  gaussians (scan):
    alpha[px, g]   = clamp(opacity_g * exp(-1/2 d^T conic d))
    L              = log1p(-alpha)                 # log-space transmittance
    S_incl         = cumsum_g(L);  S_excl = S_incl - L
    T_in[px, g]    = exp(S_excl + logT_carry[px])
    rgb[px]       += sum_g alpha * T_in * color_g  (a (PX,CS)x(CS,3) matmul)
    logT_carry    += S_incl[:, -1]

Pixel coordinates are *tile-local* so the quadratic form stays
well-conditioned in float32 even at 4K (see ops/pallas/forward.py, which
additionally turns the cumsum and accumulation into MXU matmuls).

The whole function is built from differentiable primitives (a masked scan
over a static chunk count, rematerialized per chunk), so `jax.grad` through
it is exact — it is both the CPU/fallback path and the ground truth for the
hand-derived Pallas backward. The cost of that choice: a static
`max_chunks` bound per tile (truncation is surfaced via `max_chunks_needed`)
and no early exit; the Pallas path has neither limitation.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import RasterConfig
from .binning import tile_grid
from .projection import PAYLOAD_DIM


class RasterOut(NamedTuple):
    image: jax.Array          # (H, W, 3)
    transmittance: jax.Array  # (H, W) final T per pixel
    max_chunks_needed: jax.Array  # () int32 — > max_chunks means truncation


def tiles_to_image(tiles: jax.Array, width: int, height: int, tile_size: int) -> jax.Array:
    """(num_tiles, tile_px, C) or (num_tiles, tile_px) -> (H, W[, C])."""
    squeeze = tiles.ndim == 2
    if squeeze:
        tiles = tiles[..., None]
    tx, ty = tile_grid(width, height, tile_size)
    c = tiles.shape[-1]
    img = tiles.reshape(ty, tx, tile_size, tile_size, c)
    img = img.transpose(0, 2, 1, 3, 4).reshape(ty * tile_size, tx * tile_size, c)
    img = img[:height, :width]
    return img[..., 0] if squeeze else img


def image_to_tiles(img: jax.Array, tile_size: int) -> jax.Array:
    """(H, W[, C]) -> (num_tiles, tile_px[, C]), zero-padded to tile multiples."""
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    h, w, c = img.shape
    tx, ty = tile_grid(w, h, tile_size)
    img = jnp.pad(img, ((0, ty * tile_size - h), (0, tx * tile_size - w), (0, 0)))
    t = img.reshape(ty, tile_size, tx, tile_size, c).transpose(0, 2, 1, 3, 4)
    t = t.reshape(ty * tx, tile_size * tile_size, c)
    return t[..., 0] if squeeze else t


def _chunk_alpha(
    chunk: jax.Array,      # (CS, PAYLOAD_DIM) payload rows
    xl: jax.Array,         # (PX, 1) tile-local pixel x
    yl: jax.Array,         # (PX, 1) tile-local pixel y
    ox: jax.Array,         # () tile origin x (global px)
    oy: jax.Array,
    n_valid: jax.Array,    # () rows of this chunk inside the segment
    cfg: RasterConfig,
) -> Tuple[jax.Array, jax.Array]:
    """Alpha matrix (PX, CS) and the chunk colors (CS, 3)."""
    cs = chunk.shape[0]
    mx = (chunk[:, 0] - ox)[None, :]
    my = (chunk[:, 1] - oy)[None, :]
    ca = chunk[:, 2][None, :]
    cb = chunk[:, 3][None, :]
    cc = chunk[:, 4][None, :]
    op = chunk[:, 5][None, :]
    dx = xl - mx
    dy = yl - my
    q = ca * dx * dx + 2.0 * cb * dx * dy + cc * dy * dy
    alpha = op * jnp.exp(-0.5 * q)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, cs), 1)
    # Same explicit sigma_radius-ellipse support gate as the Pallas kernel
    # (ops/pallas/common.chunk_alpha): footprint independent of binning rects.
    valid = (
        (lane < n_valid)
        & (alpha >= cfg.alpha_min)
        & (q <= cfg.sigma_radius * cfg.sigma_radius)
    )
    alpha = jnp.where(valid, jnp.minimum(alpha, cfg.alpha_max), 0.0)
    colors = chunk[:, 6:9]
    return alpha, colors


def rasterize_tiles_xla(
    sorted_payload: jax.Array,   # (P, PAYLOAD_DIM) gathered in (tile, depth) order
    tile_starts: jax.Array,      # (num_tiles + 1,) int32
    background: jax.Array,       # (3,)
    width: int,
    height: int,
    cfg: RasterConfig,
    max_chunks: int = 64,
    tile_row0=None,              # dynamic first tile row (tile-sharded strips)
    tile_rows: Optional[int] = None,  # static number of tile rows to render
) -> RasterOut:
    cs = cfg.chunk_size
    ts = cfg.tile_size
    px = ts * ts
    tiles_x, tiles_y = tile_grid(width, height, ts)
    strip = tile_rows is not None
    if tile_rows is None:
        tile_rows = tiles_y
    if tile_row0 is None:
        tile_row0 = jnp.int32(0)
    tile_row0 = jnp.asarray(tile_row0, jnp.int32)
    num_tiles = tiles_x * tile_rows

    # Pad so dynamic_slice never clamps (chunk windows can poke past the last
    # valid entry; padded rows are masked out via the segment length).
    payload = jnp.concatenate(
        [sorted_payload, jnp.zeros((cs, PAYLOAD_DIM), sorted_payload.dtype)], axis=0
    )

    idx = jnp.arange(px, dtype=jnp.int32)
    xl = (idx % ts).astype(jnp.float32)[:, None]
    yl = (idx // ts).astype(jnp.float32)[:, None]

    def chunk_step(carry, args):
        acc, log_t = carry
        chunk, n_valid, ox, oy = args
        alpha, colors = _chunk_alpha(chunk, xl, yl, ox, oy, n_valid, cfg)
        ell = jnp.log1p(-alpha)
        s_incl = jnp.cumsum(ell, axis=1)
        s_excl = s_incl - ell
        t_in = jnp.exp(s_excl + log_t[:, None])
        w = alpha * t_in
        acc = acc + jnp.dot(w, colors, precision=jax.lax.Precision.HIGHEST)
        log_t = log_t + s_incl[:, -1]
        return (acc, log_t), None

    chunk_step = jax.checkpoint(chunk_step)

    def render_tile(t):
        start = tile_starts[t]
        end = tile_starts[t + 1]
        ox = ((t % tiles_x) * ts).astype(jnp.float32)
        oy = ((t // tiles_x + tile_row0) * ts).astype(jnp.float32)

        def get_chunk(i):
            cstart = start + i * cs
            chunk = jax.lax.dynamic_slice(payload, (cstart, 0), (cs, PAYLOAD_DIM))
            return chunk, end - cstart

        def body(carry, i):
            chunk, n_valid = get_chunk(i)
            return chunk_step(carry, (chunk, n_valid, ox, oy))

        init = (
            jnp.zeros((px, 3), jnp.float32),
            jnp.zeros((px,), jnp.float32),
        )
        (acc, log_t), _ = jax.lax.scan(body, init, jnp.arange(max_chunks))
        return acc, log_t

    acc, log_t = jax.vmap(render_tile)(jnp.arange(num_tiles))

    trans_tiles = jnp.exp(log_t)
    img_tiles = acc + trans_tiles[..., None] * background[None, None, :]

    # A strip renders tile_rows * ts pixel rows (uncropped; strips compose to
    # the padded image, which the caller crops); full grids crop to (H, W).
    strip_h = tile_rows * ts
    image = tiles_to_image(img_tiles, width, strip_h if strip else height, ts)
    trans = tiles_to_image(trans_tiles, width, strip_h if strip else height, ts)

    seg_len = tile_starts[1:] - tile_starts[:-1]
    needed = (jnp.max(seg_len) + cs - 1) // cs
    return RasterOut(image=image, transmittance=trans, max_chunks_needed=needed)
