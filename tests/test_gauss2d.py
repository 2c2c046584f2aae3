"""data x gauss 2D-mesh composition (parallel/gauss2d.py): per-group camera
batching over gaussian-sharded parameters, on the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussiansplat_tpu.config import RasterConfig, TrainConfig
from gaussiansplat_tpu.models import random_model
from gaussiansplat_tpu.ops import look_at
from gaussiansplat_tpu.parallel import (
    make_gauss2d_render,
    make_gauss2d_train_step,
    make_mesh2d,
    shard_model_2d,
    stack_cameras,
)
from gaussiansplat_tpu.render import render
from gaussiansplat_tpu.train import init_train_state
from gaussiansplat_tpu.train.loss import photometric_loss


def _setup(data=2, gauss=4, n=96, size=64):
    if jax.device_count() < data * gauss:
        pytest.skip("needs the 8-device mesh")
    ts = 16
    cfg = RasterConfig(tile_size=ts, chunk_size=32, impl="xla")
    mesh = make_mesh2d(data, gauss)
    model = random_model(jax.random.PRNGKey(0), n, sh_degree=1, extent=1.0)
    smodel = shard_model_2d(model, mesh)
    cams = stack_cameras([
        look_at(eye=(0.4 * i - 0.2, 0.3, -6.0), target=(0, 0, 0),
                fx=60.0, fy=60.0, width=size, height=size)
        for i in range(data)
    ])
    return cfg, mesh, model, smodel, cams, size


def test_gauss2d_render_parity():
    cfg, mesh, model, smodel, cams, size = _setup()
    f = jax.jit(make_gauss2d_render(mesh, cfg, size, size, 1,
                                    xla_max_chunks=8))
    imgs, aux = f(smodel, cams, jnp.zeros((3,)))
    assert imgs.shape == (2, size, size, 3)
    assert int(aux["overflow"]) == 0
    for i in range(2):
        cam = jax.tree_util.tree_map(lambda x: x[i], cams)
        ref = render(model, cam, cfg, sh_degree=1,
                     background=jnp.zeros((3,)), impl="xla").image
        err = float(jnp.max(jnp.abs(imgs[i] - ref)))
        assert err < 1e-4, f"view {i} drifted: {err}"


def test_gauss2d_grads_match_replicated():
    cfg, mesh, model, smodel, cams, size = _setup()
    f = make_gauss2d_render(mesh, cfg, size, size, 1, xla_max_chunks=8)
    gts = jnp.stack([
        jnp.full((size, size, 3), 0.2, jnp.float32),
        jnp.full((size, size, 3), 0.6, jnp.float32),
    ])

    def loss2d(params):
        m = smodel.with_params(params)
        imgs, _ = f(m, cams, jnp.zeros((3,)))
        return jnp.mean(jax.vmap(
            lambda im, gt: photometric_loss(im, gt, 0.2))(imgs, gts))

    g2d = jax.jit(jax.grad(loss2d))(smodel.trainable())

    def loss_ref(params):
        m = model.with_params(params)
        total = 0.0
        for i in range(2):
            cam = jax.tree_util.tree_map(lambda x: x[i], cams)
            img = render(m, cam, cfg, sh_degree=1,
                         background=jnp.zeros((3,)), impl="xla").image
            total = total + photometric_loss(img, gts[i], 0.2)
        return total / 2.0

    gref = jax.jit(jax.grad(loss_ref))(model.trainable())
    for k in gref:
        err = float(jnp.max(jnp.abs(g2d[k] - gref[k])))
        scale = float(jnp.max(jnp.abs(gref[k]))) + 1e-8
        assert err < 1e-4 + 1e-3 * scale, f"grad[{k}] drifted: {err}"


def test_gauss2d_train_step():
    cfg, mesh, model, smodel, cams, size = _setup()
    tcfg = TrainConfig(iterations=3, sh_degree=1, eval_every=10**9)
    state, tx = init_train_state(smodel, tcfg, extent=1.0)
    step = make_gauss2d_train_step(mesh, tx, cfg, tcfg, size, size, 1,
                                   xla_max_chunks=8)
    gts = jnp.zeros((2, size, size, 3), jnp.float32)
    losses = []
    for _ in range(3):
        state, metrics = step(state, cams, gts)
        losses.append(float(metrics["loss"]))
        assert int(metrics["overflow"]) == 0
    assert int(state.step) == 3
    assert losses[-1] < losses[0]
