"""2D gaussian splats: screen-space gaussians with angle rotations.

The reference ships a second model family alongside the 3D one —
`SplatData2D` (`splat.jl:20-26`: means 2xN, scales 2xN, a single rotation
angle per splat, opacities, direct RGB colors), its covariance kernel
`computeCov2d_kernel` (`cov2d.jl:3-28`: W = R(theta)·diag(exp(s)),
Sigma = W·W^T + 0.3I), and the only backward rasterizer it ever wrote
(`splat.jl:271-396`, which differentiates the 2D parameterization).

Here the 2D family is ~60 lines because it drops into the shared pipeline:
`project_splats2d` produces the same `Projected` struct the 3D projector
emits, so binning, the XLA rasterizer, the fused Pallas kernels, and the
whole autodiff training loop are reused unchanged — and unlike the
reference, the backward comes from the same custom_vjp as 3D instead of a
separate hand-derived atomics kernel with mismatched forward/backward math
(SURVEY §2.2 splatGrads inconsistencies).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..config import RasterConfig
from ..ops.binning import bin_gaussians
from ..ops.projection import Projected, make_payload


@struct.dataclass
class Splat2DModel:
    """Padded fixed-capacity 2D splat pytree (screen-space units: pixels)."""

    means2d: jax.Array          # (C, 2) pixel positions
    log_scales: jax.Array       # (C, 2) log std-dev in pixels
    thetas: jax.Array           # (C,)   rotation angle (radians)
    logit_opacities: jax.Array  # (C,)
    colors: jax.Array           # (C, 3) direct RGB (no SH for 2D splats)
    alive: jax.Array            # (C,) bool

    @property
    def capacity(self) -> int:
        return self.means2d.shape[0]

    @property
    def num_alive(self) -> jax.Array:
        return jnp.sum(self.alive.astype(jnp.int32))

    def trainable(self) -> dict:
        return dict(
            means2d=self.means2d,
            log_scales=self.log_scales,
            thetas=self.thetas,
            logit_opacities=self.logit_opacities,
            colors=self.colors,
        )

    def with_params(self, params: dict) -> "Splat2DModel":
        return self.replace(**params)


def random_splats2d(
    key: jax.Array,
    n: int,
    width: int,
    height: int,
    capacity: Optional[int] = None,
    scale_range: Tuple[float, float] = (2.0, 10.0),
    opacity: float = 0.7,
) -> Splat2DModel:
    """Random screen-space splats (reference analogue: `initData(Val{SPLAT2D})`
    at `splat.jl:74-87`, which references an undefined `n` and cannot run)."""
    capacity = capacity or n
    assert capacity >= n
    km, ks, kt, kc = jax.random.split(key, 4)
    means = jax.random.uniform(
        km, (n, 2), minval=0.0, maxval=1.0
    ) * jnp.array([width, height], jnp.float32)
    lo, hi = np.log(scale_range[0]), np.log(scale_range[1])
    log_scales = jax.random.uniform(ks, (n, 2), minval=lo, maxval=hi)
    thetas = jax.random.uniform(kt, (n,), minval=0.0, maxval=np.pi)
    colors = jax.random.uniform(kc, (n, 3), minval=0.05, maxval=0.95)
    logit_op = jnp.full((n,), float(np.log(opacity / (1 - opacity))))

    c = capacity
    pad = lambda a, fill=0.0: jnp.concatenate(
        [a, jnp.full((c - n,) + a.shape[1:], fill, a.dtype)]
    )
    return Splat2DModel(
        means2d=pad(means),
        log_scales=pad(log_scales, -10.0),
        thetas=pad(thetas),
        logit_opacities=pad(logit_op, -10.0),
        colors=pad(colors),
        alive=jnp.arange(c) < n,
    )


def project_splats2d(
    model: Splat2DModel, cfg: RasterConfig, width: int, height: int
) -> Projected:
    """Screen-space covariance -> conic/radius, matching `computeCov2d_kernel`
    (`cov2d.jl:3-28`) + `computeInvCov2d` (`cov2d.jl:30-45`) + `computeBB`
    (`boundingbox.jl:4-36`), as one fused vectorized pass."""
    f32 = jnp.float32
    theta = model.thetas.astype(f32)
    sx, sy = jnp.exp(model.log_scales[:, 0]), jnp.exp(model.log_scales[:, 1])
    ct, st = jnp.cos(theta), jnp.sin(theta)
    # W = R(theta) @ diag(s); Sigma = W W^T + dilation*I  (cov2d.jl:13-26)
    a = (ct * sx) ** 2 + (st * sy) ** 2 + cfg.cov2d_dilation
    b = ct * st * (sx * sx - sy * sy)
    c = (st * sx) ** 2 + (ct * sy) ** 2 + cfg.cov2d_dilation

    det = a * c - b * b
    det_ok = det > 0.0
    inv_det = 1.0 / jnp.where(det_ok, det, 1.0)
    conic = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], axis=-1)

    mid = 0.5 * (a + c)
    disc = jnp.sqrt(jnp.maximum(mid * mid - det, 0.01))
    radius_f = jnp.ceil(cfg.sigma_radius * jnp.sqrt(mid + disc))

    # Exact per-axis, opacity-aware ellipse extents (see projection.radius_xy:
    # the rasterizers gate alpha < alpha_min and q > sigma_radius^2, so
    # support beyond min(sigma, sqrt(2 ln(op/alpha_min))) sigmas is dead).
    opacity = jax.nn.sigmoid(model.logit_opacities.astype(f32))
    tau_op = 2.0 * (jnp.log(jnp.maximum(opacity, 1e-12))
                    - float(np.log(cfg.alpha_min)))
    s_eff = jnp.minimum(
        cfg.sigma_radius,
        jnp.sqrt(jnp.maximum(tau_op, 0.0)) * 1.001 + 1e-2,
    )
    rx_f = jnp.ceil(s_eff * jnp.sqrt(jnp.maximum(a, 0.0)))
    ry_f = jnp.ceil(s_eff * jnp.sqrt(jnp.maximum(c, 0.0)))

    u, v = model.means2d[:, 0], model.means2d[:, 1]
    on_screen = (
        (u + rx_f > 0.0) & (u - rx_f < width)
        & (v + ry_f > 0.0) & (v - ry_f < height)
    )
    valid = det_ok & on_screen & model.alive & (opacity > cfg.alpha_min)
    radius = jnp.where(valid, radius_f, 0.0).astype(jnp.int32)
    radius_xy = jnp.stack(
        [jnp.where(valid, rx_f, 0.0), jnp.where(valid, ry_f, 0.0)], axis=-1
    ).astype(jnp.int32)

    return Projected(
        mean2d=model.means2d.astype(f32),
        depth=jnp.zeros_like(u),  # screen splats have no depth; stable order
        conic=conic,
        rgb=model.colors.astype(f32),
        opacity=opacity,
        radius=jax.lax.stop_gradient(radius),
        radius_xy=jax.lax.stop_gradient(radius_xy),
        valid=jax.lax.stop_gradient(valid),
    )


def render_splats2d(
    model: Splat2DModel,
    width: int,
    height: int,
    cfg: Optional[RasterConfig] = None,
    background: Optional[jax.Array] = None,
    impl: Optional[str] = None,
):
    """Differentiable screen-space render (the 2D `splatDraw` pipeline,
    `forward.jl:9-33` + `splat.jl:195-269`, minus its atomics backward).
    Returns a RasterOut-alike via the shared tile rasterizer."""
    from ..render import RenderOutput, _resolve_impl
    from ..ops.tile_raster import rasterize_tiles_xla

    cfg = cfg or RasterConfig()
    if background is None:
        background = jnp.zeros((3,), jnp.float32)
    impl = _resolve_impl(impl if impl is not None else cfg.impl)

    proj = project_splats2d(model, cfg, width, height)
    binning = bin_gaussians(proj, width, height, cfg)
    payload = make_payload(proj)
    sorted_payload = binning.gather_payload(payload)

    if impl == "xla":
        out = rasterize_tiles_xla(
            sorted_payload, binning.tile_starts, background, width, height, cfg
        )
    else:
        from ..ops.pallas.rasterize import rasterize_tiles_pallas

        out = rasterize_tiles_pallas(
            sorted_payload, binning.tile_starts, background, width, height,
            cfg, interpret=(impl == "pallas_interpret"),
        )
    return RenderOutput(
        image=out.image,
        transmittance=out.transmittance,
        radii=proj.radius,
        num_pairs=binning.num_pairs,
        overflow=binning.overflow,
        max_chunks_needed=out.max_chunks_needed,
    )
