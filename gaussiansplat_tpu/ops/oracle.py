"""Oracle renderer: per-pixel alpha compositing over *all* gaussians.

A deliberately simple O(pixels x N) renderer used as the correctness and
gradient oracle for the tiled/Pallas paths (SURVEY §4 test strategy). It is
a `lax.scan` over depth-sorted gaussians with an (H, W) image carry, so JAX
reverse-mode autodiff differentiates it for free — this is the ground truth
that the hand-derived `custom_vjp` backward is checked against.

Semantics intentionally match the tiled rasterizer:
  * front-to-back order by camera depth,
  * alpha = opacity * exp(-0.5 * d^T conic d), skipped below `alpha_min`,
    clamped at `alpha_max`  (reference forward: `splat.jl:246-259`, minus its
    missing clamp; the 0.5 factor the reference's backward drops at
    `splat.jl:348` is kept consistently here),
  * `respect_tiles=True` restricts each gaussian to pixels of the tiles its
    bounding square covers — the exact pixel set the tiled path composites —
    so oracle and tiled images agree to float tolerance.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import RasterConfig
from .binning import tile_grid, tile_ranges
from .projection import Projected


def render_oracle(
    proj: Projected,
    width: int,
    height: int,
    cfg: RasterConfig,
    background: Optional[jax.Array] = None,
    respect_tiles: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Render (H, W, 3) image and (H, W) final transmittance."""
    if background is None:
        background = jnp.zeros((3,), jnp.float32)

    n = proj.mean2d.shape[0]
    tiles_x, tiles_y = tile_grid(width, height, cfg.tile_size)

    # Depth sort (front to back). Invalid gaussians to the back with alpha 0.
    depth_key = jnp.where(proj.valid, proj.depth, jnp.inf)
    order = jnp.argsort(depth_key)

    mean2d = proj.mean2d[order]
    conic = proj.conic[order]
    rgb = proj.rgb[order]
    opacity = jnp.where(proj.valid[order], proj.opacity[order], 0.0)

    xmin, ymin, xmax, ymax = tile_ranges(
        jax.lax.stop_gradient(proj.mean2d),
        proj.radius_xy,
        cfg.tile_size,
        tiles_x,
        tiles_y,
    )
    trect = jnp.stack([xmin, ymin, xmax, ymax], axis=-1)[order]

    ys = jnp.arange(height, dtype=jnp.float32)[:, None]
    xs = jnp.arange(width, dtype=jnp.float32)[None, :]
    tile_of_y = (jnp.arange(height) // cfg.tile_size)[:, None]
    tile_of_x = (jnp.arange(width) // cfg.tile_size)[None, :]

    def step(carry, g):
        img, trans = carry
        m, co, col, op, rect = g
        dx = xs - m[0]
        dy = ys - m[1]
        q = co[0] * dx * dx + 2.0 * co[1] * dx * dy + co[2] * dy * dy
        alpha = op * jnp.exp(-0.5 * q)
        alpha = jnp.where(alpha < cfg.alpha_min, 0.0, alpha)
        alpha = jnp.where(q > cfg.sigma_radius * cfg.sigma_radius, 0.0, alpha)
        alpha = jnp.minimum(alpha, cfg.alpha_max)
        if respect_tiles:
            inside = (
                (tile_of_x >= rect[0])
                & (tile_of_x < rect[2])
                & (tile_of_y >= rect[1])
                & (tile_of_y < rect[3])
            )
            alpha = jnp.where(inside, alpha, 0.0)
        img = img + (alpha * trans)[:, :, None] * col[None, None, :]
        trans = trans * (1.0 - alpha)
        return (img, trans), None

    init = (
        jnp.zeros((height, width, 3), jnp.float32),
        jnp.ones((height, width), jnp.float32),
    )
    (img, trans), _ = jax.lax.scan(
        step, init, (mean2d, conic, rgb, opacity, trect)
    )
    img = img + trans[:, :, None] * background[None, None, :]
    return img, trans
