"""Checkpoint/resume + PLY export/import round trips (SURVEY §5: the
reference persists nothing; we must round-trip the full TrainState and
interoperate with the INRIA PLY ecosystem)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from gaussiansplat_tpu.config import RasterConfig, TrainConfig
from gaussiansplat_tpu.models import random_model
from gaussiansplat_tpu.ops import look_at
from gaussiansplat_tpu.train import init_train_state, make_train_step
from gaussiansplat_tpu.utils import (
    export_ply,
    import_ply,
    latest_step,
    restore_checkpoint,
    save_checkpoint,
)

CFG = RasterConfig(tile_size=32, chunk_size=128, impl="xla")


def _trained_state(n=48, steps=2):
    model = random_model(jax.random.PRNGKey(0), n, sh_degree=1, extent=1.0)
    cfg = TrainConfig(random_background=False)
    state, tx = init_train_state(model, cfg, extent=1.0)
    step = make_train_step(tx, CFG, cfg, impl="xla")
    cam = look_at(eye=(0.5, 0.3, -6.0), target=(0, 0, 0), fx=120.0, fy=120.0,
                  width=64, height=64)
    gt = jax.random.uniform(jax.random.PRNGKey(1), (64, 64, 3))
    for _ in range(steps):
        state, _ = step(state, cam, gt, 1)
    return state, tx, cfg


def test_checkpoint_roundtrip(tmp_path):
    state, tx, cfg = _trained_state()
    ckpt = str(tmp_path / "ckpts")
    save_checkpoint(ckpt, state, int(state.step))
    assert latest_step(ckpt) == 2

    # fresh template with the same shapes
    model0 = random_model(jax.random.PRNGKey(9), 48, sh_degree=1, extent=1.0)
    template, _ = init_train_state(model0, cfg, extent=1.0)
    restored, step = restore_checkpoint(ckpt, template)
    assert step == 2
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        jax.device_get(state),
        jax.device_get(restored),
    )


def test_checkpoint_missing_dir_returns_template(tmp_path):
    state, _, cfg = _trained_state(steps=1)
    restored, step = restore_checkpoint(str(tmp_path / "nope"), state)
    assert step is None
    assert restored is state


def test_ply_export_import_roundtrip(tmp_path):
    model = random_model(jax.random.PRNGKey(0), 32, sh_degree=2, extent=1.0,
                         capacity=64)
    path = str(tmp_path / "scene.ply")
    n = export_ply(path, model)
    assert n == 32
    back = import_ply(path, capacity=64)
    assert back.capacity == 64
    assert int(back.num_alive) == 32
    assert back.sh_degree == 2
    np.testing.assert_allclose(
        np.asarray(back.means[:32]), np.asarray(model.means[:32]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(back.sh_rest[:32]), np.asarray(model.sh_rest[:32]), rtol=1e-6)
