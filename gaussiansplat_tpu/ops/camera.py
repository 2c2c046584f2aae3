"""Camera model: pinhole intrinsics + world-to-camera extrinsics.

Replaces the reference's `camera.jl` (look-at view matrix at
`camera.jl:88-100`, +z-forward perspective matrix at `camera.jl:102-111`,
INRIA `cameras.json` loader at `camera.jl:113-151`). We work directly with
the world-to-camera rigid transform and pixel-space intrinsics — the EWA
projection only ever needs (R, t, fx, fy, cx, cy), so no 4x4 clip-space
matrix round trip is required on the hot path.

Convention (COLMAP / INRIA): x_cam = R @ x_world + t, camera looks down +z,
pixel u = fx * x/z + cx, v = fy * y/z + cy.
"""

from __future__ import annotations

import math
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Camera:
    """A single pinhole camera. Array fields are jit-traceable leaves;
    width/height are static (they determine output shapes)."""

    R: jax.Array            # (3, 3) world-to-camera rotation
    t: jax.Array            # (3,)   world-to-camera translation
    fx: jax.Array           # () focal length in pixels
    fy: jax.Array
    cx: jax.Array           # () principal point in pixels
    cy: jax.Array
    width: int = struct.field(pytree_node=False, default=0)
    height: int = struct.field(pytree_node=False, default=0)

    @property
    def position(self) -> jax.Array:
        """Camera center in world space: -R^T t."""
        return -self.R.T @ self.t

    @property
    def world_view_transform(self) -> jax.Array:
        """4x4 world-to-camera matrix."""
        m = jnp.eye(4, dtype=jnp.float32)
        m = m.at[:3, :3].set(self.R)
        m = m.at[:3, 3].set(self.t)
        return m

    def tan_half_fov(self) -> Tuple[jax.Array, jax.Array]:
        return (
            0.5 * self.width / self.fx,
            0.5 * self.height / self.fy,
        )

    def resized(self, width: int, height: int) -> "Camera":
        """Return a camera for a rescaled image of the same field of view."""
        sx = width / self.width
        sy = height / self.height
        return self.replace(
            fx=self.fx * sx, fy=self.fy * sy,
            cx=self.cx * sx, cy=self.cy * sy,
            width=width, height=height,
        )


def make_camera(
    R,
    t,
    fx: float,
    fy: float,
    width: int,
    height: int,
    cx: float | None = None,
    cy: float | None = None,
) -> Camera:
    if cx is None:
        cx = (width - 1) / 2.0
    if cy is None:
        cy = (height - 1) / 2.0
    f32 = lambda v: jnp.asarray(v, jnp.float32)
    return Camera(
        R=f32(R), t=f32(t), fx=f32(fx), fy=f32(fy), cx=f32(cx), cy=f32(cy),
        width=int(width), height=int(height),
    )


def look_at(
    eye,
    target,
    up=(0.0, 1.0, 0.0),
    fx: float = 3200.0,
    fy: float = 3200.0,
    width: int = 512,
    height: int = 512,
) -> Camera:
    """Build a camera from eye/target/up (reference: `camera.jl:88-100`,
    whose default camera is fx=fy=3200, eye=(1,3,30) at `camera.jl:24-47`).

    Basis: forward w = normalize(target - eye), right u = normalize(up x w),
    true-up v = w x u; rows of R are (u, v, w) so +z is forward.
    """
    eye = jnp.asarray(eye, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    w = target - eye
    w = w / jnp.linalg.norm(w)
    u = jnp.cross(up, w)
    u = u / jnp.linalg.norm(u)
    v = jnp.cross(w, u)
    R = jnp.stack([u, v, w], axis=0)
    t = -R @ eye
    return make_camera(R, t, fx, fy, width, height)


def orbit_camera(
    angle: float,
    radius: float,
    height_offset: float = 0.0,
    target=(0.0, 0.0, 0.0),
    **kwargs: Any,
) -> Camera:
    """Camera on a circular orbit around `target` (for tests/visualization)."""
    target = jnp.asarray(target, jnp.float32)
    eye = target + jnp.asarray(
        [radius * math.sin(angle), height_offset, radius * math.cos(angle)],
        jnp.float32,
    )
    return look_at(eye, target, **kwargs)


def fov_to_focal(fov: float, pixels: int) -> float:
    """Field of view (radians) -> focal length in pixels."""
    return pixels / (2.0 * math.tan(fov / 2.0))


def focal_to_fov(focal: float, pixels: int) -> float:
    return 2.0 * math.atan(pixels / (2.0 * focal))
