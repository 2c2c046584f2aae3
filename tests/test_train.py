"""Training-stack tests: loss functions, densification mechanics, and an
end-to-end optimization smoke test on the synthetic scene (BASELINE.json
config 1 shape)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussiansplat_tpu.config import RasterConfig, TrainConfig
from gaussiansplat_tpu.data import synthetic_scene
from gaussiansplat_tpu.models import random_model, scene_extent
from gaussiansplat_tpu.models.densify import (
    DensifyState,
    densify_step,
    prune_step,
    reset_opacity,
)
from gaussiansplat_tpu.train import Trainer, psnr, photometric_loss, ssim
from gaussiansplat_tpu.train.loss import l1

CFG = RasterConfig(tile_size=32, chunk_size=128, impl="xla")


class TestLoss:
    def test_ssim_identical(self):
        img = jax.random.uniform(jax.random.PRNGKey(0), (64, 64, 3))
        assert float(jax.jit(ssim)(img, img)) > 0.999

    def test_ssim_decreases_with_noise(self):
        key = jax.random.PRNGKey(0)
        img = jax.random.uniform(key, (64, 64, 3))
        s = jax.jit(ssim)
        noisy1 = img + 0.05 * jax.random.normal(jax.random.PRNGKey(1), img.shape)
        noisy2 = img + 0.3 * jax.random.normal(jax.random.PRNGKey(2), img.shape)
        assert float(s(img, noisy1)) > float(s(img, noisy2))

    def test_ssim_matches_scipy_reference(self):
        # compare against a known structural case: constant shift barely
        # changes SSIM (mean term) but scales L1.
        img = jnp.ones((32, 32, 3)) * 0.5
        shifted = img + 0.1
        assert float(l1(img, shifted)) == pytest.approx(0.1, abs=1e-6)
        assert float(jax.jit(ssim)(img, shifted)) > 0.8

    def test_photometric_mix(self):
        a = jax.random.uniform(jax.random.PRNGKey(0), (64, 64, 3))
        b = jax.random.uniform(jax.random.PRNGKey(1), (64, 64, 3))
        f = jax.jit(lambda a, b: photometric_loss(a, b, 0.2))
        v = float(f(a, b))
        assert 0.0 < v < 1.0
        assert float(f(a, a)) < 1e-5

    def test_psnr(self):
        a = jnp.zeros((8, 8, 3))
        b = jnp.full((8, 8, 3), 0.1)
        assert float(psnr(a, b)) == pytest.approx(20.0, abs=1e-3)

    def test_loss_differentiable(self):
        a = jax.random.uniform(jax.random.PRNGKey(0), (64, 64, 3))
        b = jax.random.uniform(jax.random.PRNGKey(1), (64, 64, 3))
        g = jax.jit(jax.grad(lambda x: photometric_loss(x, b)))(a)
        assert np.isfinite(np.asarray(g)).all()


class TestDensify:
    def _model(self, n=32, cap=128):
        return random_model(jax.random.PRNGKey(0), n, sh_degree=1, capacity=cap)

    def test_clone_fills_dead_slots(self):
        model = self._model()
        cfg = TrainConfig(densify_grad_thresh=0.0, densify_scale_thresh=1e9)
        state = DensifyState.zeros(model.capacity)
        # every alive gaussian has gradient above threshold -> all cloned
        state = state.replace(
            grad2d_sum=jnp.where(model.alive, 1.0, 0.0),
            grad2d_count=model.alive.astype(jnp.int32),
        )
        fn = jax.jit(lambda m, s, k: densify_step(m, s, k, cfg, jnp.float32(1.0)))
        new_model, _, info = fn(model, state, jax.random.PRNGKey(1))
        assert int(new_model.num_alive) == 64  # 32 originals + 32 clones
        assert int(info["cloned"]) == 32
        assert int(info["split"]) == 0

    def test_split_shrinks_scales(self):
        model = self._model()
        cfg = TrainConfig(densify_grad_thresh=0.0, densify_scale_thresh=0.0)
        state = DensifyState.zeros(model.capacity).replace(
            grad2d_sum=jnp.where(model.alive, 1.0, 0.0),
            grad2d_count=model.alive.astype(jnp.int32),
        )
        before = np.asarray(model.log_scales[:32])
        fn = jax.jit(lambda m, s, k: densify_step(m, s, k, cfg, jnp.float32(1.0)))
        new_model, _, info = fn(model, state, jax.random.PRNGKey(1))
        assert int(info["split"]) == 32
        after = np.asarray(new_model.log_scales[:32])
        np.testing.assert_allclose(after, before - np.log(cfg.split_factor),
                                   atol=1e-5)

    def test_capacity_saturation_drops(self):
        model = self._model(n=32, cap=40)  # only 8 free slots
        cfg = TrainConfig(densify_grad_thresh=0.0, densify_scale_thresh=1e9)
        state = DensifyState.zeros(model.capacity).replace(
            grad2d_sum=jnp.where(model.alive, 1.0, 0.0),
            grad2d_count=model.alive.astype(jnp.int32),
        )
        fn = jax.jit(lambda m, s, k: densify_step(m, s, k, cfg, jnp.float32(1.0)))
        new_model, _, info = fn(model, state, jax.random.PRNGKey(1))
        assert int(new_model.num_alive) == 40
        assert int(info["dropped"]) == 24

    def test_prune_faint(self):
        model = self._model()
        model = model.replace(
            logit_opacities=model.logit_opacities.at[:10].set(-10.0)
        )
        cfg = TrainConfig()
        fn = jax.jit(lambda m, s: prune_step(m, s, cfg, jnp.float32(1.0)))
        new_model, info = fn(model, DensifyState.zeros(model.capacity))
        assert int(info["pruned"]) == 10
        assert int(new_model.num_alive) == 22

    def test_opacity_reset(self):
        model = self._model()
        cfg = TrainConfig()
        new = jax.jit(lambda m: reset_opacity(m, cfg))(model)
        op = jax.nn.sigmoid(np.asarray(new.logit_opacities[:32]))
        assert (op <= cfg.opacity_reset_value + 1e-5).all()


class TestEndToEnd:
    def test_optimization_improves_psnr(self):
        """BASELINE.json config-1-shaped check: a short training run must
        substantially improve PSNR on the synthetic scene."""
        from gaussiansplat_tpu.data import synthetic_scene

        scene, _ = synthetic_scene(
            jax.random.PRNGKey(0), n_gaussians=192, n_train=6, n_test=2,
            width=64, height=64, fx=80.0, cfg=CFG,
        )
        tcfg = TrainConfig(
            iterations=120,
            densify_start=40,
            densify_every=40,
            densify_end=100,
            opacity_reset_every=10_000,
            sh_increase_every=50,
            sh_degree=1,
            log_every=1000,
        )
        trainer = Trainer(raster_cfg=CFG, cfg=tcfg, impl="xla")

        from gaussiansplat_tpu.render import render
        cam0, gt0 = scene.train_views[0]
        psnr_before = float(psnr(
            render(scene.init_model, cam0, CFG, sh_degree=1, impl="xla").image, gt0))
        model, metrics = trainer.fit(scene.init_model, scene.train_views)
        psnr_after = float(psnr(
            render(model, cam0, CFG, sh_degree=1, impl="xla").image, gt0))
        assert psnr_after > psnr_before + 1.5, (psnr_before, psnr_after)
        assert np.isfinite(metrics["loss"])
