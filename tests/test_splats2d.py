"""2D screen-space splat family (reference `SplatData2D` / `cov2d.jl` /
the 2D `splatDraw`+`splatGrads` pipeline): rendering, gradients, and a
tiny fit."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from gaussiansplat_tpu.config import RasterConfig
from gaussiansplat_tpu.models import Splat2DModel, random_splats2d, render_splats2d
from gaussiansplat_tpu.models.splats2d import project_splats2d

CFG = RasterConfig(tile_size=32, chunk_size=128, impl="xla")
W = H = 128


def test_covariance_matches_closed_form():
    """conic == inv(R diag(s^2) R^T + dilation I) elementwise."""
    key = jax.random.PRNGKey(0)
    m = random_splats2d(key, 16, W, H)
    proj = project_splats2d(m, CFG, W, H)
    theta = np.asarray(m.thetas)[:16]
    s = np.exp(np.asarray(m.log_scales))[:16]
    for i in range(16):
        c, t = np.cos(theta[i]), np.sin(theta[i])
        R = np.array([[c, -t], [t, c]])
        cov = R @ np.diag(s[i] ** 2) @ R.T + CFG.cov2d_dilation * np.eye(2)
        inv = np.linalg.inv(cov)
        got = np.asarray(proj.conic)[i]
        np.testing.assert_allclose(got, [inv[0, 0], inv[0, 1], inv[1, 1]],
                                   rtol=1e-4, atol=1e-5)


def test_render_shapes_and_range():
    m = random_splats2d(jax.random.PRNGKey(1), 64, W, H)
    out = render_splats2d(m, W, H, CFG, background=jnp.ones((3,)))
    assert out.image.shape == (H, W, 3)
    assert out.transmittance.shape == (H, W)
    img = np.asarray(out.image)
    assert np.isfinite(img).all()
    assert img.min() >= 0.0 and img.max() <= 1.0 + 1e-5


def test_dead_slots_do_not_render():
    m = random_splats2d(jax.random.PRNGKey(2), 32, W, H, capacity=64)
    out = render_splats2d(m, W, H, CFG)
    m2 = m.replace(alive=m.alive & (jnp.arange(64) < 16))
    out2 = render_splats2d(m2, W, H, CFG)
    # Fewer alive splats => transmittance cannot decrease anywhere.
    assert float(jnp.min(out2.transmittance - out.transmittance)) >= -1e-6


def test_gradients_flow_and_fit():
    """A few Adam steps on all five parameter groups reduce L2 to a target."""
    key = jax.random.PRNGKey(3)
    target_model = random_splats2d(key, 48, W, H)
    target = render_splats2d(target_model, W, H, CFG).image

    m = random_splats2d(jax.random.PRNGKey(4), 48, W, H)
    params = m.trainable()
    tx = optax.adam(2e-2)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            img = render_splats2d(m.with_params(p), W, H, CFG).image
            return jnp.mean((img - target) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, upd), opt, loss, g

    params, opt, loss0, g = step(params, opt)
    # every group gets gradient signal
    for k, v in g.items():
        assert float(jnp.abs(v).max()) > 0.0, k
    for _ in range(30):
        params, opt, loss, _ = step(params, opt)
    assert float(loss) < float(loss0)
