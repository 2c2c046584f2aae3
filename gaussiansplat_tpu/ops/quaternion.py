"""Quaternion and covariance math, vectorized over the gaussian axis.

Replaces the reference's per-thread device functions (`quatToRot` at
`projection.jl:1-14`; note `cov3d.jl:9` carries a sign typo in its copy, which
this module does NOT reproduce) with batched einsum formulations that XLA maps
onto the VPU/MXU. Quaternions are (w, x, y, z), matching `projection.jl:3`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize(q: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Normalize quaternions, shape (..., 4)."""
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """(..., 4) wxyz unit quaternions -> (..., 3, 3) rotation matrices.

    Standard right-handed convention (reference: `projection.jl:1-14`, columns
    there because Julia is column-major; the matrix itself is identical).
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1.0 - 2.0 * (y * y + z * z)
    r01 = 2.0 * (x * y - w * z)
    r02 = 2.0 * (x * z + w * y)
    r10 = 2.0 * (x * y + w * z)
    r11 = 1.0 - 2.0 * (x * x + z * z)
    r12 = 2.0 * (y * z - w * x)
    r20 = 2.0 * (x * z - w * y)
    r21 = 2.0 * (y * z + w * x)
    r22 = 1.0 - 2.0 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def build_covariance_3d(quats: jax.Array, scales: jax.Array) -> jax.Array:
    """3D covariance Sigma = R S S^T R^T.

    quats: (..., 4) (need not be pre-normalized), scales: (..., 3) *linear*
    standard deviations (callers exponentiate log-scales first; the reference
    exponentiates inside the kernel, `projection.jl:133-135`).
    Returns (..., 3, 3).
    """
    R = quat_to_rotmat(normalize(quats))
    M = R * scales[..., None, :]  # columns scaled: M = R @ diag(s)
    return jnp.einsum("...ij,...kj->...ik", M, M,
                      precision=jax.lax.Precision.HIGHEST)


def rotmat_to_quat(R: jax.Array) -> jax.Array:
    """(..., 3, 3) rotation matrices -> (..., 4) wxyz quaternions.

    Branch-free Shepperd-style extraction (select over the four candidate
    pivots), safe under vmap/jit.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def cand(a, b, c, d):
        return jnp.stack([a, b, c, d], axis=-1)

    # Four candidates, each valid when its pivot is largest.
    s0 = jnp.sqrt(jnp.maximum(1.0 + tr, 1e-12)) * 0.5
    q0 = cand(s0, (m21 - m12) / (4.0 * s0), (m02 - m20) / (4.0 * s0), (m10 - m01) / (4.0 * s0))
    s1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) * 0.5
    q1 = cand((m21 - m12) / (4.0 * s1), s1, (m01 + m10) / (4.0 * s1), (m02 + m20) / (4.0 * s1))
    s2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 1e-12)) * 0.5
    q2 = cand((m02 - m20) / (4.0 * s2), (m01 + m10) / (4.0 * s2), s2, (m12 + m21) / (4.0 * s2))
    s3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 1e-12)) * 0.5
    q3 = cand((m10 - m01) / (4.0 * s3), (m02 + m20) / (4.0 * s3), (m12 + m21) / (4.0 * s3), s3)

    use0 = tr > 0.0
    use1 = (m00 >= m11) & (m00 >= m22) & ~use0
    use2 = (m11 > m00) & (m11 >= m22) & ~use0
    q = jnp.where(
        use0[..., None], q0,
        jnp.where(use1[..., None], q1, jnp.where(use2[..., None], q2, q3)),
    )
    return normalize(q)


def random_quats(key: jax.Array, shape) -> jax.Array:
    """Uniform random unit quaternions, shape (*shape, 4)."""
    q = jax.random.normal(key, tuple(shape) + (4,))
    return normalize(q)
