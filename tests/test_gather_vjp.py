"""The payload-gather custom VJP (sort + segment reduction, ops/binning.py
reduce_pair_grads) must match plain XLA autodiff of the same gather exactly:
it replaces a scatter-add, not the math. Covers both the xla segment_sum
formulation and the Pallas segment-reduce kernel (interpret mode), including
capacity overflow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussiansplat_tpu.config import RasterConfig
from gaussiansplat_tpu.models import random_model
from gaussiansplat_tpu.ops import look_at
from gaussiansplat_tpu.ops.binning import bin_gaussians
from gaussiansplat_tpu.ops.projection import make_payload, project_gaussians


def _setup(n=300, pairs_per_gaussian=8.0, seed=0):
    cfg = RasterConfig(pairs_per_gaussian=pairs_per_gaussian)
    model = random_model(jax.random.PRNGKey(seed), n, sh_degree=1, extent=1.0,
                         opacity=0.8, scale_range=(0.02, 0.08))
    cam = look_at(eye=(0.2, -0.1, -4.0), target=(0, 0, 0), fx=300.0, fy=300.0,
                  width=256, height=192)
    proj = project_gaussians(model.means, model.quats, model.log_scales,
                             model.logit_opacities, model.sh, cam, cfg,
                             sh_degree=1, alive=model.alive)
    binning = bin_gaussians(proj, cam.width, cam.height, cfg)
    payload = make_payload(proj)
    return payload, binning


def _cotangent(shape, seed=1):
    return jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)


@pytest.mark.parametrize("impl", ["xla", "pallas_interpret"])
@pytest.mark.parametrize("pairs_per_gaussian", [8.0, 0.5])
def test_gather_vjp_matches_autodiff(impl, pairs_per_gaussian):
    payload, binning = _setup(pairs_per_gaussian=pairs_per_gaussian)
    cot = _cotangent(
        (binning.capacity, payload.shape[1])
    ) * (jnp.arange(binning.capacity) < binning.num_pairs)[:, None]

    def custom(p):
        return jnp.vdot(binning.gather_payload(p, impl=impl), cot)

    def plain(p):
        return jnp.vdot(p[binning.depth_order][binning.sorted_ranks], cot)

    g_custom = jax.jit(jax.grad(custom))(payload)
    g_plain = jax.jit(jax.grad(plain))(payload)
    np.testing.assert_allclose(
        np.asarray(g_custom), np.asarray(g_plain), rtol=1e-6, atol=1e-6
    )
    assert bool(jnp.any(g_custom != 0.0))


def test_gather_vjp_masks_tail_garbage():
    """Cotangent rows past num_pairs must not leak into gradients."""
    payload, binning = _setup()
    cot = jnp.ones((binning.capacity, payload.shape[1]), jnp.float32)
    valid = (jnp.arange(binning.capacity) < binning.num_pairs)[:, None]

    def custom_full(p):  # garbage rows present past num_pairs
        return jnp.vdot(binning.gather_payload(p, impl="xla"), cot)

    def plain_masked(p):
        return jnp.vdot(p[binning.depth_order][binning.sorted_ranks],
                        jnp.where(valid, cot, 0.0))

    g_custom = jax.jit(jax.grad(custom_full))(payload)
    g_plain = jax.jit(jax.grad(plain_masked))(payload)
    np.testing.assert_allclose(
        np.asarray(g_custom), np.asarray(g_plain), rtol=1e-6, atol=1e-6
    )
