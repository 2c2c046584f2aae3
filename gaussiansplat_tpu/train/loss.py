"""Training losses: L1 + lambda * DSSIM (standard 3DGS objective).

The reference's loss module (`loss.jl`) cannot run as written — it calls
NNlib conv symbols that are not among its dependencies (SURVEY §2.3) and its
"gaussian" window is exp(-dist)/sqrt(2 sigma^2) (`loss.jl:5-12`), not a
gaussian. Here: a true separable 11x11 gaussian window (sigma 1.5), SSIM
with the usual C1=0.01^2 / C2=0.03^2 stabilizers via depthwise convolutions,
and the standard lambda=0.2 mix (the reference used 0.1, `loss.jl:67`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _gaussian_window(size: int = 11, sigma: float = 1.5):
    xs = np.arange(size) - (size - 1) / 2.0
    w = np.exp(-(xs ** 2) / (2.0 * sigma ** 2))
    w /= w.sum()
    return tuple(w.astype(np.float32))


def _depthwise_blur(img: jax.Array, size: int = 11, sigma: float = 1.5) -> jax.Array:
    """Separable gaussian blur of (H, W, C) via two depthwise convs."""
    w = jnp.asarray(_gaussian_window(size, sigma))
    c = img.shape[-1]
    x = img[None]  # NHWC
    kh = jnp.tile(w.reshape(size, 1, 1, 1), (1, 1, 1, c))  # HWIO, I=1 per group
    kw = jnp.tile(w.reshape(1, size, 1, 1), (1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape, ("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), [((size - 1) // 2, (size - 1) // 2), (0, 0)],
        dimension_numbers=dn, feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST)
    x = jax.lax.conv_general_dilated(
        x, kw, (1, 1), [(0, 0), ((size - 1) // 2, (size - 1) // 2)],
        dimension_numbers=dn, feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST)
    return x[0]


def ssim(
    img_a: jax.Array,
    img_b: jax.Array,
    c1: float = 0.01 ** 2,
    c2: float = 0.03 ** 2,
) -> jax.Array:
    """Mean SSIM over (H, W, C) images in [0, 1] (reference: `loss.jl:38-58`,
    with a correct window)."""
    mu_a = _depthwise_blur(img_a)
    mu_b = _depthwise_blur(img_b)
    mu_aa = mu_a * mu_a
    mu_bb = mu_b * mu_b
    mu_ab = mu_a * mu_b
    sigma_aa = _depthwise_blur(img_a * img_a) - mu_aa
    sigma_bb = _depthwise_blur(img_b * img_b) - mu_bb
    sigma_ab = _depthwise_blur(img_a * img_b) - mu_ab
    s = ((2.0 * mu_ab + c1) * (2.0 * sigma_ab + c2)) / (
        (mu_aa + mu_bb + c1) * (sigma_aa + sigma_bb + c2)
    )
    return jnp.mean(s)


def l1(img_a: jax.Array, img_b: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(img_a - img_b))


def photometric_loss(
    pred: jax.Array,
    gt: jax.Array,
    ssim_lambda: float = 0.2,
) -> jax.Array:
    """(1 - lambda) L1 + lambda (1 - SSIM) — the 3DGS training objective
    (reference sketch: `loss.jl:62-73`)."""
    return (1.0 - ssim_lambda) * l1(pred, gt) + ssim_lambda * (1.0 - ssim(pred, gt))


def psnr(pred: jax.Array, gt: jax.Array, max_val: float = 1.0) -> jax.Array:
    mse = jnp.mean((pred - gt) ** 2)
    return 10.0 * jnp.log10(max_val ** 2 / jnp.maximum(mse, 1e-12))
