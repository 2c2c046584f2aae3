"""Unit tests for the core math layer (SURVEY §7 step 1): quaternions,
covariances, SH, cameras, projection — checked against closed forms and
scipy, not against the reference's buggy kernels."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as ScipyRotation

from gaussiansplat_tpu.config import RasterConfig
from gaussiansplat_tpu.models import random_model
from gaussiansplat_tpu.ops import look_at, make_camera, project_gaussians
from gaussiansplat_tpu.ops.quaternion import (
    build_covariance_3d,
    normalize,
    quat_to_rotmat,
    random_quats,
    rotmat_to_quat,
)
from gaussiansplat_tpu.ops.sh import SH_C0, eval_sh, num_sh_coeffs, sh_basis


class TestQuaternion:
    def test_identity(self):
        q = jnp.array([1.0, 0.0, 0.0, 0.0])
        np.testing.assert_allclose(quat_to_rotmat(q), np.eye(3), atol=1e-6)

    def test_matches_scipy(self):
        rng = np.random.default_rng(0)
        q_wxyz = rng.normal(size=(64, 4)).astype(np.float32)
        q_wxyz /= np.linalg.norm(q_wxyz, axis=-1, keepdims=True)
        ours = np.asarray(quat_to_rotmat(jnp.asarray(q_wxyz)))
        # scipy uses xyzw ordering
        theirs = ScipyRotation.from_quat(q_wxyz[:, [1, 2, 3, 0]]).as_matrix()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

    def test_rotmat_roundtrip(self):
        key = jax.random.PRNGKey(1)
        q = random_quats(key, (128,))
        q2 = rotmat_to_quat(quat_to_rotmat(q))
        # q and -q are the same rotation
        dot = jnp.abs(jnp.sum(q * q2, axis=-1))
        np.testing.assert_allclose(dot, 1.0, atol=1e-4)

    def test_covariance_psd_and_eigs(self):
        key = jax.random.PRNGKey(2)
        q = random_quats(key, (32,))
        scales = jnp.exp(jax.random.normal(jax.random.PRNGKey(3), (32, 3)))
        cov = build_covariance_3d(q, scales)
        # symmetric
        np.testing.assert_allclose(cov, np.swapaxes(np.asarray(cov), 1, 2), atol=1e-4)
        # eigenvalues are the squared scales
        eigs = np.sort(np.linalg.eigvalsh(np.asarray(cov)), axis=-1)
        expect = np.sort(np.asarray(scales) ** 2, axis=-1)
        np.testing.assert_allclose(eigs, expect, rtol=2e-2, atol=1e-5)

    def test_unnormalized_quats_ok(self):
        q = jnp.array([[2.0, 0.0, 0.0, 0.0]])
        cov = build_covariance_3d(q, jnp.ones((1, 3)))
        np.testing.assert_allclose(cov[0], np.eye(3), atol=1e-6)


class TestSH:
    def test_dc_only(self):
        sh = jnp.zeros((5, 16, 3)).at[:, 0, :].set(1.0)
        dirs = jnp.tile(jnp.array([0.0, 0.0, 1.0]), (5, 1))
        rgb = eval_sh(sh, dirs, degree=0)
        np.testing.assert_allclose(rgb, SH_C0 * 1.0 + 0.5, atol=1e-6)

    def test_degree_count(self):
        assert [num_sh_coeffs(d) for d in range(4)] == [1, 4, 9, 16]

    def test_basis_orthonormal(self):
        # Monte-Carlo check: E[basis_i * basis_j] over the sphere = delta_ij / (4 pi)
        rng = np.random.default_rng(0)
        v = rng.normal(size=(200_000, 3))
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        b = np.asarray(sh_basis(jnp.asarray(v, jnp.float32), 3))
        gram = (b.T @ b) / v.shape[0] * (4.0 * np.pi)
        np.testing.assert_allclose(gram, np.eye(16), atol=0.15)

    def test_clamped_nonnegative(self):
        sh = -5.0 * jnp.ones((1, 1, 3))
        rgb = eval_sh(sh, jnp.array([[0.0, 0.0, 1.0]]), degree=0)
        assert (np.asarray(rgb) >= 0).all()

    def test_higher_degree_ignores_extra(self):
        key = jax.random.PRNGKey(0)
        sh = jax.random.normal(key, (4, 16, 3))
        dirs = jax.random.normal(jax.random.PRNGKey(1), (4, 3))
        a = eval_sh(sh, dirs, 1)
        b = eval_sh(sh[:, :4], dirs, 1)
        np.testing.assert_allclose(a, b, atol=1e-6)


class TestCamera:
    def test_lookat_maps_target_forward(self):
        cam = look_at(eye=(0, 0, -5), target=(0, 0, 0), width=64, height=64)
        p_cam = cam.R @ jnp.zeros(3) + cam.t
        np.testing.assert_allclose(p_cam, [0, 0, 5], atol=1e-5)
        np.testing.assert_allclose(cam.position, [0, 0, -5], atol=1e-5)

    def test_rotation_orthonormal(self):
        cam = look_at(eye=(3, 2, 1), target=(0, 1, 0), width=64, height=64)
        RtR = np.asarray(cam.R) @ np.asarray(cam.R).T
        np.testing.assert_allclose(RtR, np.eye(3), atol=1e-5)

    def test_center_projects_to_principal_point(self):
        cam = look_at(eye=(0, 0, -5), target=(0, 0, 0), fx=100, fy=100,
                      width=65, height=65)
        cfg = RasterConfig()
        proj = project_gaussians(
            means=jnp.zeros((1, 3)),
            quats=jnp.array([[1.0, 0, 0, 0]]),
            log_scales=jnp.full((1, 3), -2.0),
            logit_opacities=jnp.zeros((1,)),
            sh=jnp.zeros((1, 1, 3)),
            camera=cam, cfg=cfg, sh_degree=0,
        )
        np.testing.assert_allclose(proj.mean2d[0], [32.0, 32.0], atol=1e-4)
        np.testing.assert_allclose(proj.depth[0], 5.0, atol=1e-5)

    def test_resized_preserves_fov(self):
        cam = look_at(eye=(0, 0, -5), target=(0, 0, 0), fx=100, fy=100,
                      width=64, height=64)
        cam2 = cam.resized(128, 128)
        np.testing.assert_allclose(cam2.tan_half_fov()[0], cam.tan_half_fov()[0], atol=1e-6)


class TestProjection:
    def _setup(self, n=64):
        key = jax.random.PRNGKey(0)
        model = random_model(key, n, sh_degree=1, extent=1.0)
        cam = look_at(eye=(0, 0, -6), target=(0, 0, 0), fx=256, fy=256,
                      width=128, height=128)
        return model, cam

    def test_shapes_and_validity(self):
        model, cam = self._setup()
        cfg = RasterConfig()
        p = project_gaussians(model.means, model.quats, model.log_scales,
                              model.logit_opacities, model.sh, cam, cfg,
                              sh_degree=1, alive=model.alive)
        n = model.capacity
        assert p.mean2d.shape == (n, 2) and p.conic.shape == (n, 3)
        assert p.rgb.shape == (n, 3) and p.radius.dtype == jnp.int32
        assert bool(p.valid.any())
        # All gaussians are in front of this camera
        assert bool((p.depth > 0).all())

    def test_behind_camera_culled(self):
        cam = look_at(eye=(0, 0, -5), target=(0, 0, 0), width=64, height=64)
        cfg = RasterConfig()
        means = jnp.array([[0.0, 0.0, 0.0], [0.0, 0.0, -10.0]])  # 2nd behind
        p = project_gaussians(
            means, jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (2, 1)),
            jnp.full((2, 3), -2.0), jnp.zeros((2,)), jnp.zeros((2, 1, 3)),
            cam, cfg, sh_degree=0)
        assert bool(p.valid[0]) and not bool(p.valid[1])
        assert int(p.radius[1]) == 0

    def test_radius_xy_is_exact_ellipse_aabb(self):
        """Per-axis extents must be ceil(sigma_r * sqrt(cov diag)) — the
        exact AABB of the 3-sigma ellipse — and never exceed the max radius
        (sqrt(lambda_max) bound)."""
        model, cam = self._setup(n=128)
        cfg = RasterConfig()
        p = project_gaussians(model.means, model.quats, model.log_scales,
                              model.logit_opacities, model.sh, cam, cfg,
                              sh_degree=1, alive=model.alive)
        rxy = np.asarray(p.radius_xy)
        r = np.asarray(p.radius)
        valid = np.asarray(p.valid)
        conic = np.asarray(p.conic)  # inverse covariance (a, b, c)
        det_inv = conic[:, 0] * conic[:, 2] - conic[:, 1] ** 2
        cov_xx = conic[:, 2] / det_inv
        cov_yy = conic[:, 0] / det_inv
        exp_rx = np.ceil(cfg.sigma_radius * np.sqrt(cov_xx))
        exp_ry = np.ceil(cfg.sigma_radius * np.sqrt(cov_yy))
        sel = valid
        assert sel.any()
        np.testing.assert_allclose(rxy[sel, 0], exp_rx[sel], atol=1.01)
        np.testing.assert_allclose(rxy[sel, 1], exp_ry[sel], atol=1.01)
        assert (rxy[sel, 0] <= r[sel]).all() and (rxy[sel, 1] <= r[sel]).all()
        # culled rows are zeroed
        assert (rxy[~sel] == 0).all()

    def test_beyond_far_plane_culled(self):
        # reference culls near AND far in the raster walk (splat.jl:227);
        # here the cull is at projection time via cfg.far.
        cam = look_at(eye=(0, 0, -5), target=(0, 0, 0), width=64, height=64)
        cfg = RasterConfig(far=20.0)
        means = jnp.array([[0.0, 0.0, 0.0], [0.0, 0.0, 100.0]])  # 2nd past far
        p = project_gaussians(
            means, jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (2, 1)),
            jnp.full((2, 3), -2.0), jnp.zeros((2,)), jnp.zeros((2, 1, 3)),
            cam, cfg, sh_degree=0)
        assert bool(p.valid[0]) and not bool(p.valid[1])
        assert int(p.radius[1]) == 0

    def test_isotropic_conic(self):
        # An isotropic gaussian at the optical axis has an isotropic conic.
        cam = look_at(eye=(0, 0, -5), target=(0, 0, 0), fx=200, fy=200,
                      width=64, height=64)
        cfg = RasterConfig(cov2d_dilation=0.0)
        s = 0.1
        p = project_gaussians(
            jnp.zeros((1, 3)), jnp.array([[1.0, 0, 0, 0]]),
            jnp.full((1, 3), float(np.log(s))), jnp.zeros((1,)),
            jnp.zeros((1, 1, 3)), cam, cfg, sh_degree=0)
        # screen-space sigma = fx * s / z = 200 * 0.1 / 5 = 4 px
        # conic diagonal = 1 / sigma^2
        np.testing.assert_allclose(p.conic[0, 0], 1.0 / 16.0, rtol=1e-3)
        np.testing.assert_allclose(p.conic[0, 2], 1.0 / 16.0, rtol=1e-3)
        np.testing.assert_allclose(p.conic[0, 1], 0.0, atol=1e-6)
        # radius = ceil(3 * sigma) — the 0.01 eigenvalue-discriminant floor
        # (INRIA-standard) can round it up by one
        assert int(p.radius[0]) in (12, 13)

    def test_differentiable(self):
        model, cam = self._setup(n=8)
        cfg = RasterConfig()

        def f(means):
            p = project_gaussians(means, model.quats, model.log_scales,
                                  model.logit_opacities, model.sh, cam, cfg,
                                  sh_degree=1)
            return jnp.sum(p.mean2d) + jnp.sum(p.conic) + jnp.sum(p.rgb)

        g = jax.grad(f)(model.means)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).sum() > 0
