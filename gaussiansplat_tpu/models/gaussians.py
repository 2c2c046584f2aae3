"""The gaussian scene model: a padded, fixed-capacity parameter pytree.

Replaces the reference's `SplatData3D` mutable struct-of-host-arrays
(`splat.jl:36-43`, which re-uploads every field to the GPU each frame at
`forward.jl:63-69` — see SURVEY §3.1) with a flax struct of device arrays.
Capacity is static and over-allocated; densification (models/densify.py)
fills dead slots in place via the `alive` mask so shapes never change under
jit — the "padded capacity + alive mask" design from SURVEY §7 hard part (d).

Parameterization (standard 3DGS, applied at projection time):
  means           (C, 3)  world positions
  quats           (C, 4)  wxyz rotations, unnormalized
  log_scales      (C, 3)  log standard deviations  (exp'd like projection.jl:133)
  logit_opacities (C,)    pre-sigmoid opacity      (sigmoid'd like splat.jl:247)
  sh_dc           (C, 3)        DC spherical-harmonics band  (PLY f_dc_*)
  sh_rest         (C, 3*(K-1))  higher SH bands, FLAT        (PLY f_rest_*)

SH coefficients are stored FLAT (2D) on purpose: XLA's TPU tiling pads the
trailing two dims of an f32 array to (8, 128), so a persistent
(C, 15, 3) buffer materializes as (C, 16, 128) — a 42x HBM blow-up that
OOMs at 4M gaussians (measured: a 720 MB sh_rest became a 32.7 GB
allocation). 2D (C, 45) stays compact. The coefficient order within a row
is [band0 rgb, band1 rgb, ...] (k-major, rgb-minor), matching the
(K, 3).reshape(-1) of the INRIA layout.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..ops.quaternion import random_quats
from ..ops.sh import num_sh_coeffs, rgb_to_sh_dc


def _next_pow2(x: int) -> int:
    p = 1
    while p < max(x, 1):
        p *= 2
    return p


@struct.dataclass
class GaussianModel:
    means: jax.Array
    quats: jax.Array
    log_scales: jax.Array
    logit_opacities: jax.Array
    sh_dc: jax.Array
    sh_rest: jax.Array
    alive: jax.Array           # (C,) bool

    @property
    def capacity(self) -> int:
        return self.means.shape[0]

    @property
    def sh_degree(self) -> int:
        return int(round((self.sh_rest.shape[1] // 3 + 1) ** 0.5)) - 1

    @property
    def num_alive(self) -> jax.Array:
        return jnp.sum(self.alive.astype(jnp.int32))

    @property
    def sh(self) -> jax.Array:
        """Concatenated FLAT (C, 3K) SH coefficients (see module docstring
        for why flat; ops/sh.eval_sh_flat consumes this layout)."""
        return jnp.concatenate([self.sh_dc, self.sh_rest], axis=1)

    def trainable(self) -> dict:
        """The optimizer-visible parameter groups (alive mask excluded)."""
        return dict(
            means=self.means,
            quats=self.quats,
            log_scales=self.log_scales,
            logit_opacities=self.logit_opacities,
            sh_dc=self.sh_dc,
            sh_rest=self.sh_rest,
        )

    def with_params(self, params: dict) -> "GaussianModel":
        return self.replace(**params)


def empty_model(capacity: int, sh_degree: int = 3) -> GaussianModel:
    k = num_sh_coeffs(sh_degree)
    z = jnp.zeros
    return GaussianModel(
        means=z((capacity, 3), jnp.float32),
        quats=jnp.tile(jnp.array([1.0, 0, 0, 0], jnp.float32), (capacity, 1)),
        log_scales=jnp.full((capacity, 3), -10.0, jnp.float32),
        logit_opacities=jnp.full((capacity,), -10.0, jnp.float32),
        sh_dc=z((capacity, 3), jnp.float32),
        sh_rest=z((capacity, 3 * (k - 1)), jnp.float32),
        alive=jnp.zeros((capacity,), bool),
    )


def random_model(
    key: jax.Array,
    n: int,
    sh_degree: int = 3,
    capacity: Optional[int] = None,
    extent: float = 1.0,
    opacity: float = 0.8,
    scale_range: Tuple[float, float] = (0.02, 0.08),
) -> GaussianModel:
    """Random scene for tests/benchmarks (reference analogue: the random
    `initData` at `splat.jl:90-104`, minus its undefined-variable bug)."""
    capacity = capacity or n
    assert capacity >= n
    k = num_sh_coeffs(sh_degree)
    k_means, k_quat, k_scale, k_col = jax.random.split(key, 4)
    means = jax.random.uniform(k_means, (n, 3), minval=-extent, maxval=extent)
    quats = random_quats(k_quat, (n,))
    lo, hi = np.log(scale_range[0] * extent), np.log(scale_range[1] * extent)
    log_scales = jax.random.uniform(k_scale, (n, 3), minval=lo, maxval=hi)
    colors = jax.random.uniform(k_col, (n, 3), minval=0.05, maxval=0.95)
    logit_op = jnp.full((n,), float(np.log(opacity / (1 - opacity))))

    m = empty_model(capacity, sh_degree)
    return m.replace(
        means=m.means.at[:n].set(means),
        quats=m.quats.at[:n].set(quats),
        log_scales=m.log_scales.at[:n].set(log_scales),
        logit_opacities=m.logit_opacities.at[:n].set(logit_op),
        sh_dc=m.sh_dc.at[:n].set(rgb_to_sh_dc(colors)),
        alive=m.alive.at[:n].set(True),
    )


def from_arrays(
    means: np.ndarray,
    quats: np.ndarray,
    log_scales: np.ndarray,
    logit_opacities: np.ndarray,
    sh_dc: np.ndarray,
    sh_rest: np.ndarray,
    capacity: Optional[int] = None,
) -> GaussianModel:
    """Build a model from host arrays (e.g. a parsed INRIA PLY).

    SH arrays are accepted in either the INRIA (N, K, 3) band-major form or
    already flat (N, 3K); both are stored flat (see module docstring)."""
    n = means.shape[0]
    sh_dc = np.asarray(sh_dc, np.float32).reshape(n, -1)
    sh_rest = np.asarray(sh_rest, np.float32).reshape(n, -1)
    k = 1 + sh_rest.shape[1] // 3
    deg = int(round(k ** 0.5)) - 1
    capacity = capacity or n
    assert capacity >= n
    m = empty_model(capacity, deg)
    put = lambda buf, arr: buf.at[:n].set(jnp.asarray(arr, jnp.float32))
    return m.replace(
        means=put(m.means, means),
        quats=put(m.quats, quats),
        log_scales=put(m.log_scales, log_scales),
        logit_opacities=put(m.logit_opacities, logit_opacities),
        sh_dc=put(m.sh_dc, sh_dc),
        sh_rest=put(m.sh_rest, sh_rest),
        alive=m.alive.at[:n].set(True),
    )


def from_points(
    points: np.ndarray,
    colors: np.ndarray,
    capacity: Optional[int] = None,
    sh_degree: int = 3,
    init_opacity: float = 0.1,
) -> GaussianModel:
    """Initialize from an SfM point cloud (COLMAP), 3DGS-style: isotropic
    scale from the mean distance to the 3 nearest neighbors."""
    n = points.shape[0]
    pts = np.asarray(points, np.float32)
    # kNN on host; chunked O(n^2) is fine for init-time point clouds.
    d2mean = np.empty((n,), np.float32)
    chunk = 2048
    for s in range(0, n, chunk):
        block = pts[s : s + chunk]
        d2 = ((block[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
        d2.partition(3, axis=1)
        d2mean[s : s + chunk] = np.maximum(d2[:, 1:4].mean(1), 1e-7)
    scales = np.log(np.sqrt(d2mean))[:, None].repeat(3, axis=1)

    k = num_sh_coeffs(sh_degree)
    quats = np.zeros((n, 4), np.float32)
    quats[:, 0] = 1.0
    logit_op = np.full((n,), float(np.log(init_opacity / (1 - init_opacity))), np.float32)
    sh_dc = np.asarray(rgb_to_sh_dc(jnp.asarray(colors, jnp.float32)))[:, None, :]
    sh_rest = np.zeros((n, k - 1, 3), np.float32)
    capacity = capacity or _next_pow2(4 * n)
    return from_arrays(pts, quats, scales, logit_op, sh_dc, sh_rest, capacity)


def scene_extent(model: GaussianModel) -> jax.Array:
    """Radius of the bounding sphere of alive gaussian centers (used to scale
    position learning rate and densification thresholds, as in 3DGS)."""
    w = model.alive.astype(jnp.float32)
    denom = jnp.maximum(w.sum(), 1.0)
    center = (model.means * w[:, None]).sum(0) / denom
    d = jnp.linalg.norm(model.means - center, axis=-1) * w
    return jnp.max(d)
