"""Multi-device sharding tests on the virtual 8-device CPU mesh
(SURVEY §4(d)): tile-sharded rendering must equal single-device rendering,
and the sharded train step's psum'd gradients must match the single-device
trainer step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussiansplat_tpu.config import RasterConfig, TrainConfig
from gaussiansplat_tpu.models import random_model
from gaussiansplat_tpu.ops import look_at
from gaussiansplat_tpu.parallel import (
    make_mesh,
    make_sharded_train_step,
    make_tile_sharded_render,
    pad_targets,
    stack_cameras,
)
from gaussiansplat_tpu.render import render
from gaussiansplat_tpu.train import init_train_state, make_train_step

CFG = RasterConfig(tile_size=32, chunk_size=128, impl="xla")

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)


def setup(n=192, width=128, height=128, seed=0):
    model = random_model(jax.random.PRNGKey(seed), n, sh_degree=1, extent=1.0)
    cam = look_at(eye=(0.5, 0.3, -6.0), target=(0, 0, 0), fx=220.0, fy=220.0,
                  width=width, height=height)
    return model, cam


class TestShardedRender:
    @pytest.mark.parametrize("ntile", [2, 4])
    def test_matches_single_device(self, ntile):
        model, cam = setup()
        mesh = make_mesh(data=1, tile=ntile)
        bg = jnp.array([0.1, 0.2, 0.3])
        f = jax.jit(make_tile_sharded_render(mesh, CFG, cam.width, cam.height, 1))
        img_sharded, trans_sharded = f(model, cam, bg)
        out = render(model, cam, CFG, sh_degree=1, background=bg, impl="xla")
        np.testing.assert_allclose(img_sharded, out.image, atol=1e-5)
        np.testing.assert_allclose(trans_sharded, out.transmittance, atol=1e-5)

    def test_uneven_rows_rejected(self):
        model, cam = setup(width=96, height=96)  # 3 tile rows
        mesh = make_mesh(data=1, tile=2)
        with pytest.raises(ValueError):
            make_tile_sharded_render(mesh, CFG, cam.width, cam.height, 1)


class TestShardedTrainStep:
    def test_grad_parity_with_single_device(self):
        """One sharded (data=2, tile=2) step == the single-device step run on
        the mean-of-views loss. We compare the updated parameters."""
        model, cam0 = setup(n=96, width=64, height=64)
        cam1 = look_at(eye=(-0.4, 0.6, -5.5), target=(0, 0, 0), fx=220.0,
                       fy=220.0, width=64, height=64)
        key = jax.random.PRNGKey(3)
        gt0 = jax.random.uniform(key, (64, 64, 3))
        gt1 = jax.random.uniform(jax.random.fold_in(key, 1), (64, 64, 3))

        # ssim_lambda=0: pure L1, which is exactly decomposable over strips,
        # so sharded grads must equal single-device grads to float tolerance.
        tcfg = TrainConfig(iterations=10, random_background=False, ssim_lambda=0.0)
        state, tx = init_train_state(model, tcfg, extent=1.0)

        mesh = make_mesh(data=2, tile=2)
        sharded_step = make_sharded_train_step(
            mesh, tx, CFG, tcfg, 64, 64, sh_degree=1, return_grads=True)
        cams = stack_cameras([cam0, cam1])
        gts = pad_targets(jnp.stack([gt0, gt1]), 64, CFG.tile_size, 2)
        new_state, metrics = sharded_step(state, cams, gts)

        # single-device equivalent: mean loss over the two views
        from gaussiansplat_tpu.train.loss import photometric_loss

        def loss_fn(params):
            m = state.model.with_params(params)
            l0 = photometric_loss(
                render(m, cam0, CFG, sh_degree=1, impl="xla").image, gt0,
                tcfg.ssim_lambda)
            l1 = photometric_loss(
                render(m, cam1, CFG, sh_degree=1, impl="xla").image, gt1,
                tcfg.ssim_lambda)
            return 0.5 * (l0 + l1)

        params = state.model.trainable()
        expect = jax.jit(jax.grad(loss_fn))(params)
        got = metrics["grads"]
        for k in expect:
            scale = np.abs(np.asarray(expect[k])).max() + 1e-8
            np.testing.assert_allclose(
                np.asarray(got[k]) / scale, np.asarray(expect[k]) / scale,
                atol=1e-4, err_msg=k)
        assert np.isfinite(float(metrics["loss"]))
        assert int(new_state.step) == 1

    @pytest.mark.parametrize("ntile", [2, 4])
    def test_full_objective_parity_with_halo_ssim(self, ntile):
        """Full L1+DSSIM objective (ssim_lambda=0.2): the 5-row halo exchange
        makes strip-sharded SSIM EXACTLY the single-device value — loss to
        1e-6 and all parameter grads to float tolerance (VERDICT r1 item 6)."""
        h = 32 * ntile * 2  # two tile rows per strip
        model, cam = setup(n=96, width=64, height=h)
        key = jax.random.PRNGKey(3)
        gt = jax.random.uniform(key, (h, 64, 3))

        tcfg = TrainConfig(iterations=10, random_background=False,
                           ssim_lambda=0.2)
        state, tx = init_train_state(model, tcfg, extent=1.0)
        mesh = make_mesh(data=1, tile=ntile)
        sharded_step = make_sharded_train_step(
            mesh, tx, CFG, tcfg, 64, h, sh_degree=1, return_grads=True)
        cams = stack_cameras([cam])
        gts = pad_targets(jnp.stack([gt]), h, CFG.tile_size, ntile)
        _, metrics = sharded_step(state, cams, gts)

        from gaussiansplat_tpu.train.loss import photometric_loss

        def loss_fn(params):
            m = state.model.with_params(params)
            img = render(m, cam, CFG, sh_degree=1, impl="xla").image
            return photometric_loss(img, gt, tcfg.ssim_lambda)

        params = state.model.trainable()
        expect_loss, expect = jax.jit(
            jax.value_and_grad(loss_fn))(params)
        np.testing.assert_allclose(
            float(metrics["loss"]), float(expect_loss), atol=1e-6)
        got = metrics["grads"]
        for k in expect:
            scale = np.abs(np.asarray(expect[k])).max() + 1e-8
            np.testing.assert_allclose(
                np.asarray(got[k]) / scale, np.asarray(expect[k]) / scale,
                atol=1e-4, err_msg=k)

    def test_runs_8_devices(self):
        model, cam = setup(n=64, width=64, height=128)
        mesh = make_mesh(data=2, tile=4)
        tcfg = TrainConfig()
        state, tx = init_train_state(model, tcfg, extent=1.0)
        step = make_sharded_train_step(mesh, tx, CFG, tcfg, 64, 128, sh_degree=1)
        cams = stack_cameras([cam, cam])
        gts = pad_targets(
            jnp.zeros((2, 128, 64, 3)), 128, CFG.tile_size, 4)
        state2, metrics = step(state, cams, gts)
        assert int(state2.step) == 1
        assert np.isfinite(float(metrics["loss"]))


class TestShardedPallasStrips:
    """The sharded paths must run the fused Pallas kernels (interpret mode on
    CPU), not just the XLA twin — strip rendering via tile_row0/tile_rows in
    ops/pallas/{forward,backward}.py (VERDICT round 1, item 1)."""

    @pytest.mark.parametrize("packed", [False, True])
    def test_strip_pallas_matches_single_device(self, packed):
        model, cam = setup()
        cfg = RasterConfig(tile_size=32, chunk_size=128, impl="xla",
                           packed=packed)
        mesh = make_mesh(data=1, tile=4)
        bg = jnp.array([0.1, 0.2, 0.3])
        f = jax.jit(make_tile_sharded_render(
            mesh, cfg, cam.width, cam.height, 1, impl="pallas_interpret"))
        img_s, trans_s = f(model, cam, bg)
        ref = render(model, cam, cfg, sh_degree=1, background=bg, impl="xla")
        from imgcheck import assert_images_close

        # bf16-packed quantization envelope for packed; the unpacked path
        # gets a tight bulk bound + an alpha-gate flip budget (see imgcheck:
        # the twin's factored q vs the kernels' expanded-polynomial q).
        tol = 8e-3 if packed else 1e-4
        assert_images_close(img_s, ref.image, atol=tol,
                            flip_atol=max(tol, 2.5 / 255.0))
        assert_images_close(trans_s, ref.transmittance, atol=tol,
                            flip_atol=max(tol, 2.5 / 255.0))

    @pytest.mark.parametrize("packed", [False, True])
    def test_strip_pallas_grads_match_single_device(self, packed):
        model, cam = setup(n=128, width=64, height=64)
        cfg = RasterConfig(tile_size=32, chunk_size=128, impl="xla",
                           packed=packed)
        mesh = make_mesh(data=1, tile=2)
        bg = jnp.zeros((3,))
        f = jax.jit(make_tile_sharded_render(
            mesh, cfg, cam.width, cam.height, 1, impl="pallas_interpret"))
        params = model.trainable()

        def loss_sharded(p):
            img, _ = f(model.with_params(p), cam, bg)
            return jnp.sum(img ** 2)

        def loss_single(p):
            o = render(model.with_params(p), cam, cfg, sh_degree=1,
                       background=bg, impl="xla")
            return jnp.sum(o.image ** 2)

        g1 = jax.grad(loss_sharded)(params)
        g2 = jax.grad(loss_single)(params)
        rtol = 2e-2 if packed else 1e-4
        for name in g1:
            a, b = np.asarray(g1[name]), np.asarray(g2[name])
            scale = max(np.abs(b).max(), 1e-6)
            np.testing.assert_allclose(a / scale, b / scale, atol=rtol,
                                       err_msg=name)
