"""Determinism (SURVEY §5 race-detection analogue) and fail-fast restart."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussiansplat_tpu.config import RasterConfig
from gaussiansplat_tpu.models import random_model
from gaussiansplat_tpu.ops import look_at
from gaussiansplat_tpu.render import render
from gaussiansplat_tpu.utils import is_transient, run_resilient

CFG = RasterConfig(tile_size=32, chunk_size=128, impl="xla")


def test_render_and_grads_bitwise_deterministic():
    """Same scene twice -> bitwise-equal image AND gradients. The reference
    cannot pass this in backward: CUDA.@atomic accumulation order varies
    (splat.jl:353-380); our backward is a deterministic segment scatter."""
    model = random_model(jax.random.PRNGKey(0), 192, sh_degree=1, extent=1.0)
    cam = look_at(eye=(0.5, 0.3, -6.0), target=(0, 0, 0), fx=220.0, fy=220.0,
                  width=128, height=128)

    @jax.jit
    def loss_and_grad(params):
        def f(p):
            out = render(model.with_params(p), cam, CFG, sh_degree=1, impl="xla")
            return jnp.mean(out.image ** 2), out.image

        (l, img), g = jax.value_and_grad(f, has_aux=True)(params)
        return l, img, g

    p = model.trainable()
    l1, img1, g1 = jax.tree_util.tree_map(np.asarray, loss_and_grad(p))
    l2, img2, g2 = jax.tree_util.tree_map(np.asarray, loss_and_grad(p))
    assert (img1 == img2).all()
    assert l1 == l2
    for k in g1:
        assert (g1[k] == g2[k]).all(), k


def test_is_transient_classification():
    assert is_transient(RuntimeError("ABORTED: TPU backend error"))
    assert is_transient(RuntimeError("RESOURCE_EXHAUSTED: out of memory"))
    assert not is_transient(ValueError("bad shape"))


def test_run_resilient_restarts_then_succeeds():
    calls = []

    def fit(x, resume=False):
        calls.append(resume)
        if len(calls) < 3:
            raise RuntimeError("UNAVAILABLE: worker preempted")
        return x * 2

    out = run_resilient(fit, 21, max_restarts=3, backoff_s=0.0,
                        on_restart=lambda a, e: None)
    assert out == 42
    assert calls == [False, True, True]  # retries resume from checkpoint


def test_run_resilient_propagates_real_bugs():
    def fit(resume=False):
        raise ValueError("genuine bug")

    with pytest.raises(ValueError):
        run_resilient(fit, max_restarts=5, backoff_s=0.0)


def test_run_resilient_gives_up_after_max_restarts():
    def fit(resume=False):
        raise RuntimeError("UNAVAILABLE: persistent outage")

    with pytest.raises(RuntimeError):
        run_resilient(fit, max_restarts=2, backoff_s=0.0,
                      on_restart=lambda a, e: None)
