"""Depth-sliced ring compositing (parallel/depth_ring.py): the ppermute
(C, T)-pair schedule from SURVEY §5 must reproduce the single-device render
EXACTLY (depth-partitioned slabs preserve global front-to-back order), and
its gradients must flow back through the collectives to the owning shards."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussiansplat_tpu.config import RasterConfig
from gaussiansplat_tpu.models import random_model
from gaussiansplat_tpu.ops import look_at
from gaussiansplat_tpu.parallel.depth_ring import make_depth_ring_render
from gaussiansplat_tpu.parallel.gauss_shard import make_gauss_mesh, shard_model
from gaussiansplat_tpu.render import render

CFG = RasterConfig(tile_size=16, chunk_size=32, impl="xla", trans_eps=0.0)
W = H = 96


def _scene(n=256, seed=0):
    model = random_model(jax.random.PRNGKey(seed), n, sh_degree=1, extent=1.0)
    cam = look_at(eye=(0.4, 0.2, -6.0), target=(0, 0, 0), fx=180.0, fy=180.0,
                  width=W, height=H)
    return model, cam


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    return make_gauss_mesh(8)


class TestDepthRing:
    def test_matches_single_device(self, mesh):
        model, cam = _scene()
        bg = jnp.array([0.15, 0.3, 0.45])
        ref = render(model, cam, CFG, sh_degree=1, background=bg, impl="xla",
                     xla_max_chunks=256)

        f = make_depth_ring_render(mesh, CFG, W, H, sh_degree=1,
                                   xla_max_chunks=256)
        smodel = shard_model(model, mesh)
        img, trans, aux = jax.jit(
            lambda m, c, b: f(m, c, b, with_aux=True))(smodel, cam, bg)

        assert int(aux["overflow"]) == 0
        np.testing.assert_allclose(np.asarray(img), np.asarray(ref.image),
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(trans),
                                   np.asarray(ref.transmittance), atol=2e-4)

    def test_gradients_match_single_device(self, mesh):
        model, cam = _scene(n=128, seed=3)
        bg = jnp.zeros(3)
        target = jax.random.uniform(jax.random.PRNGKey(9), (H, W, 3))
        f = make_depth_ring_render(mesh, CFG, W, H, sh_degree=1,
                                   xla_max_chunks=256)

        def loss_ring(params, base):
            m = base.with_params(params)
            img, _ = f(m, cam, bg)
            return jnp.mean((img - target) ** 2)

        def loss_single(params, base):
            m = base.with_params(params)
            out = render(m, cam, CFG, sh_degree=1, background=bg, impl="xla",
                         xla_max_chunks=256)
            return jnp.mean((out.image - target) ** 2)

        smodel = shard_model(model, mesh)
        g_ring = jax.jit(jax.grad(loss_ring))(smodel.trainable(), smodel)
        g_ref = jax.jit(jax.grad(loss_single))(model.trainable(), model)
        for k in g_ref:
            gr = np.asarray(g_ring[k])
            gx = np.asarray(g_ref[k])
            scale = np.abs(gx).max() + 1e-8
            np.testing.assert_allclose(gr / scale, gx / scale, atol=2e-3,
                                       err_msg=f"grad mismatch for {k}")

    def test_empty_scene_is_background(self, mesh):
        model, cam = _scene(n=64)
        model = model.replace(alive=jnp.zeros_like(model.alive))
        bg = jnp.array([0.2, 0.4, 0.6])
        f = make_depth_ring_render(mesh, CFG, W, H, sh_degree=1)
        img, trans = jax.jit(f)(shard_model(model, mesh), cam, bg)
        np.testing.assert_allclose(
            np.asarray(img), np.broadcast_to(bg, (H, W, 3)), atol=1e-6)
        np.testing.assert_allclose(np.asarray(trans), 1.0, atol=1e-6)


class TestDepthRingPallas:
    def test_pallas_impl_matches_single_device(self, mesh):
        """Depth-slab partials rendered by the fused Pallas kernels
        (interpret mode) instead of the XLA twin (VERDICT round 1, item 1)."""
        model, cam = _scene()
        bg = jnp.array([0.15, 0.3, 0.45])
        cfg = RasterConfig(tile_size=16, chunk_size=32, impl="xla",
                           trans_eps=0.0, packed=False)
        ref = render(model, cam, cfg, sh_degree=1, background=bg, impl="xla",
                     xla_max_chunks=256)
        f = make_depth_ring_render(mesh, cfg, W, H, sh_degree=1,
                                   xla_max_chunks=256,
                                   impl="pallas_interpret")
        smodel = shard_model(model, mesh)
        img, trans = jax.jit(f)(smodel, cam, bg)
        np.testing.assert_allclose(np.asarray(img), np.asarray(ref.image),
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(trans),
                                   np.asarray(ref.transmittance), atol=2e-4)
