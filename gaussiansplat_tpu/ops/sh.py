"""Real spherical harmonics color evaluation, degrees 0..3.

The reference stops at degree 1 and evaluates SH *per pixel* with a
nonstandard view direction `normalize(pos - (lookAt - eye))` on clip-space
positions (`splat.jl:180-193`) — both deviations from 3DGS. Here we follow
the standard formulation: per-*gaussian* evaluation with the direction from
the camera center to the gaussian mean in world space, degrees 0..3 with the
usual hard-coded basis constants, and the +0.5 offset w/ clamp at zero.

Coefficient layout: (..., K, 3) with K = (degree+1)^2, DC first, matching the
INRIA PLY layout (`f_dc_*` then `f_rest_*`, see reference `splat.jl:57-63`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
SH_C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)


def num_sh_coeffs(degree: int) -> int:
    return (degree + 1) ** 2


def sh_basis(dirs: jax.Array, degree: int) -> jax.Array:
    """Evaluate the real SH basis for unit directions.

    dirs: (..., 3) unit vectors. Returns (..., K) with K=(degree+1)^2.
    `degree` must be a static Python int in [0, 3].
    """
    if not 0 <= degree <= 3:
        raise ValueError(f"SH degree must be in [0, 3], got {degree}")
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    one = jnp.ones_like(x)
    comps = [SH_C0 * one]
    if degree >= 1:
        comps += [-SH_C1 * y, SH_C1 * z, -SH_C1 * x]
    if degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        comps += [
            SH_C2[0] * xy,
            SH_C2[1] * yz,
            SH_C2[2] * (2.0 * zz - xx - yy),
            SH_C2[3] * xz,
            SH_C2[4] * (xx - yy),
        ]
    if degree >= 3:
        comps += [
            SH_C3[0] * y * (3.0 * xx - yy),
            SH_C3[1] * xy * z,
            SH_C3[2] * y * (4.0 * zz - xx - yy),
            SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            SH_C3[4] * x * (4.0 * zz - xx - yy),
            SH_C3[5] * z * (xx - yy),
            SH_C3[6] * x * (xx - 3.0 * yy),
        ]
    return jnp.stack(comps, axis=-1)


def eval_sh(sh: jax.Array, dirs: jax.Array, degree: int) -> jax.Array:
    """SH coefficients -> RGB for given view directions.

    sh: (..., K_total, 3) with K_total >= (degree+1)^2 (extra coefficients are
    ignored, enabling progressive SH-degree training with a fixed buffer).
    dirs: (..., 3), need not be normalized. Returns (..., 3) clamped >= 0.
    """
    k = num_sh_coeffs(degree)
    d = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
    basis = sh_basis(d, degree)  # (..., k)
    # Elementwise broadcast-multiply + reduce instead of a batched (1,k)@(k,3)
    # dot_general: k is tiny, so this stays on the VPU with no MXU dispatch
    # per gaussian.
    rgb = jnp.sum(basis[..., :, None] * sh[..., :k, :], axis=-2) + 0.5
    return jnp.maximum(rgb, 0.0)


def eval_sh_flat(sh_flat: jax.Array, dirs: jax.Array, degree: int) -> jax.Array:
    """SH coefficients in FLAT (N, 3*K_total) layout -> RGB.

    Same math as eval_sh, but every array stays 2D: a persistent or
    materialized (N, K, 3) f32 buffer tiles to (N, K_pad8, 128) on TPU (the
    trailing dim pads 3 -> 128, a 42x HBM blow-up measured to OOM at 4M
    gaussians), while 2D slices stay compact. Coefficient order matches
    (K, 3).reshape(-1): [band0 rgb, band1 rgb, ...].
    """
    k = num_sh_coeffs(degree)
    d = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
    basis = sh_basis(d, degree)  # (N, k)
    rgb = jnp.zeros(sh_flat.shape[:-1] + (3,), sh_flat.dtype)
    for i in range(k):
        rgb = rgb + basis[..., i : i + 1] * sh_flat[..., 3 * i : 3 * i + 3]
    return jnp.maximum(rgb + 0.5, 0.0)


def rgb_to_sh_dc(rgb: jax.Array) -> jax.Array:
    """Invert the DC band: rgb in [0,1] -> DC coefficient."""
    return (rgb - 0.5) / SH_C0


def sh_dc_to_rgb(dc: jax.Array) -> jax.Array:
    return dc * SH_C0 + 0.5
