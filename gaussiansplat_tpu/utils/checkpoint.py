"""Checkpoint / resume, and PLY interop.

The reference has no persistence at all: its only IO is *reading* pretrained
INRIA checkpoints (`splat.jl:54-66`) and `cameras.json` (`camera.jl:113-151`)
— nothing is ever written (SURVEY §5 checkpoint/resume). Here the full
TrainState pytree (gaussian model + Adam moments + densify stats + step +
PRNG key) round-trips through Orbax, and the model additionally exports to
an ecosystem-compatible 3DGS PLY so INRIA/gsplat viewers can open scenes
trained by this framework.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(ckpt_dir: str, state: Any, step: int) -> str:
    """Write `state` (any pytree) under `ckpt_dir/step_<step>`."""
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step:08d}")
    _checkpointer().save(path, jax.device_get(state))
    return path


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [
        int(d.split("_")[1])
        for d in os.listdir(ckpt_dir)
        if d.startswith("step_") and d.split("_")[1].isdigit()
    ]
    return max(steps) if steps else None


def restore_checkpoint(ckpt_dir: str, template: Any, step: Optional[int] = None):
    """Restore the pytree saved by `save_checkpoint` into the structure of
    `template` (a state with matching shapes, e.g. from init_train_state).
    Returns (state, step) or (template, None) when no checkpoint exists."""
    if step is None:
        step = latest_step(ckpt_dir)
    if step is None:
        return template, None
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step:08d}")
    restored = _checkpointer().restore(path, item=jax.device_get(template))
    return jax.tree_util.tree_map(lambda t, r: jax.numpy.asarray(r), template, restored), step


# ----------------------------------------------------------------------------
# PLY interop for the gaussian model
# ----------------------------------------------------------------------------

def export_ply(path: str, model) -> int:
    """Write the alive gaussians as an INRIA-format PLY (same field names the
    reference reads at `splat.jl:57-63`). Returns the number written."""
    from ..data.ply import save_gaussian_ply

    alive = np.asarray(jax.device_get(model.alive))
    idx = np.nonzero(alive)[0]
    get = lambda a: np.asarray(jax.device_get(a))[idx]
    save_gaussian_ply(
        path,
        get(model.means),
        get(model.quats),
        get(model.log_scales),
        get(model.logit_opacities),
        get(model.sh_dc),
        get(model.sh_rest),
    )
    return len(idx)


def import_ply(path: str, capacity: Optional[int] = None):
    """Load an INRIA-format PLY into a GaussianModel (reference:
    `initData(Val{SPLAT3D}, path)` at `splat.jl:106-119`)."""
    from ..data.ply import load_gaussian_ply
    from ..models.gaussians import from_arrays

    return from_arrays(*load_gaussian_ply(path), capacity=capacity)
