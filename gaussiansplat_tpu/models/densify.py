"""Adaptive density control: clone / split / prune / opacity reset.

Entirely absent from the reference (SURVEY §1: no densification exists;
`BASELINE.json` config 2 requires it). Follows the INRIA 3DGS schedule,
reshaped for XLA's static-shape world (SURVEY §7 hard part (d)): the model
lives in a fixed-capacity buffer with an `alive` mask, densification runs
under jit with constant shapes, and new gaussians are written into dead
slots selected by a rank-compaction argsort — no reallocation, ever.

Densification statistics (mean screen-space positional gradient) are
accumulated by the trainer from the `mean2d_offset` gradient exposed by
`render` (the JAX analogue of 3DGS's viewspace_point_tensor.grad).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..config import TrainConfig
from ..ops.quaternion import quat_to_rotmat, normalize
from .gaussians import GaussianModel


@struct.dataclass
class DensifyState:
    """Running densification statistics, reset after every densify step."""

    grad2d_sum: jax.Array   # (C,) sum of ||d loss / d mean2d|| over steps
    grad2d_count: jax.Array  # (C,) steps where the gaussian was visible
    max_radii: jax.Array    # (C,) max screen radius seen since last reset

    @classmethod
    def zeros(cls, capacity: int) -> "DensifyState":
        return cls(
            grad2d_sum=jnp.zeros((capacity,), jnp.float32),
            grad2d_count=jnp.zeros((capacity,), jnp.int32),
            max_radii=jnp.zeros((capacity,), jnp.int32),
        )

    def update(self, grad2d: jax.Array, radii: jax.Array) -> "DensifyState":
        """Accumulate one step: grad2d (C, 2) loss gradient w.r.t. screen
        position; radii (C,) int32 screen radii (0 = invisible)."""
        visible = radii > 0
        norm = jnp.linalg.norm(grad2d, axis=-1)
        return self.replace(
            grad2d_sum=self.grad2d_sum + jnp.where(visible, norm, 0.0),
            grad2d_count=self.grad2d_count + visible.astype(jnp.int32),
            max_radii=jnp.maximum(self.max_radii, radii),
        )


def _place_into_dead_slots(
    model: GaussianModel,
    want_new: jax.Array,        # (C,) bool: source gaussians requesting a copy
    new_fields: dict,           # per-field (C, ...) values for the copies
) -> Tuple[GaussianModel, jax.Array]:
    """Scatter copies of selected gaussians into dead slots (rank-matched:
    k-th requester -> k-th dead slot). Requests beyond the number of free
    slots are dropped (surfaced by the trainer as a saturation metric)."""
    cap = model.capacity
    # Rank of each requester among requesters; rank of each dead slot.
    req_rank = jnp.cumsum(want_new.astype(jnp.int32)) - 1
    dead = ~model.alive
    n_dead = jnp.sum(dead.astype(jnp.int32))
    # dest_of_rank[k] = index of k-th dead slot
    dead_order = jnp.argsort(~dead, stable=True)  # dead slots first
    granted = want_new & (req_rank < n_dead)
    # Scatter: for each granted requester i, slot = dead_order[req_rank[i]].
    slot = dead_order[jnp.clip(req_rank, 0, cap - 1)]
    slot = jnp.where(granted, slot, cap)  # cap = dropped (scatter out of range)

    def put(buf, vals):
        return buf.at[slot].set(vals, mode="drop")

    updated = {k: put(getattr(model, k), v) for k, v in new_fields.items()}
    alive = model.alive.at[slot].set(True, mode="drop")
    dropped = jnp.sum((want_new & ~granted).astype(jnp.int32))
    return model.replace(alive=alive, **updated), dropped


def densify_step(
    model: GaussianModel,
    state: DensifyState,
    key: jax.Array,
    cfg: TrainConfig,
    scene_extent: jax.Array,
) -> Tuple[GaussianModel, DensifyState, dict]:
    """One clone+split pass (3DGS `densify_and_clone`/`densify_and_split`).

    Clone: high-gradient, small-scale gaussians are duplicated in place.
    Split: high-gradient, large-scale gaussians are replaced by two samples
    drawn from their own distribution with scales / split_factor.
    """
    avg_grad = state.grad2d_sum / jnp.maximum(state.grad2d_count, 1)
    eligible = (state.grad2d_count > 0) & model.alive
    if cfg.densify_target_fraction is None:
        high_grad = (avg_grad > cfg.densify_grad_thresh) & eligible
    else:
        # Budget-targeted control: select EXACTLY the top `fraction` of the
        # CURRENT eligible avg-grad distribution by rank (ties broken by
        # slot index), so each pass densifies a fixed budget regardless of
        # the grads' absolute scale (which depends on loss normalization and
        # resolution; see config.densify_target_fraction). A >= threshold
        # compare would pass ALL tied values — fresh clones are exact copies
        # that accumulate identical grads, so ties are common and made
        # growth bursty, bounded only by dead-slot capacity.
        m = jnp.sum(eligible.astype(jnp.int32))
        k = jnp.maximum(cfg.densify_target_fraction * m.astype(jnp.float32),
                        1.0).astype(jnp.int32)
        order = jnp.argsort(
            -jnp.where(eligible, avg_grad, -jnp.inf), stable=True)
        rank = jnp.zeros((model.capacity,), jnp.int32).at[order].set(
            jnp.arange(model.capacity, dtype=jnp.int32))
        high_grad = (rank < k) & (m > 0) & eligible
    max_scale = jnp.exp(jnp.max(model.log_scales, axis=-1))
    small = max_scale <= cfg.densify_scale_thresh * scene_extent
    clone_mask = high_grad & small & model.alive
    split_mask = high_grad & ~small & model.alive

    # --- clones: exact copies (they then drift apart under the optimizer) ---
    model, clone_dropped = _place_into_dead_slots(
        model,
        clone_mask,
        dict(
            means=model.means,
            quats=model.quats,
            log_scales=model.log_scales,
            logit_opacities=model.logit_opacities,
            sh_dc=model.sh_dc,
            sh_rest=model.sh_rest,
        ),
    )

    # --- splits: new sample into a dead slot + shrink the original ---
    eps = jax.random.normal(key, model.means.shape)
    rot = quat_to_rotmat(normalize(model.quats))
    scales = jnp.exp(model.log_scales)
    sample = model.means + jnp.einsum("nij,nj->ni", rot, eps * scales)
    new_log_scales = model.log_scales - jnp.log(cfg.split_factor)
    model, split_dropped = _place_into_dead_slots(
        model,
        split_mask,
        dict(
            means=sample,
            quats=model.quats,
            log_scales=new_log_scales,
            logit_opacities=model.logit_opacities,
            sh_dc=model.sh_dc,
            sh_rest=model.sh_rest,
        ),
    )
    # Shrink + resample the originals that were split.
    eps2 = jax.random.normal(jax.random.fold_in(key, 1), model.means.shape)
    sample2 = model.means + jnp.einsum("nij,nj->ni", rot, eps2 * scales)
    model = model.replace(
        means=jnp.where(split_mask[:, None], sample2, model.means),
        log_scales=jnp.where(split_mask[:, None], new_log_scales, model.log_scales),
    )

    info = dict(
        cloned=jnp.sum(clone_mask.astype(jnp.int32)) - clone_dropped,
        split=jnp.sum(split_mask.astype(jnp.int32)) - split_dropped,
        dropped=clone_dropped + split_dropped,
        # (C,) bool: slots whose PARAMETERS changed in place (split originals
        # were resampled/shrunk above). The trainer must reset Adam moments
        # for these too, not only for alive-flip slots; it pops this key
        # before logging scalars.
        touched=split_mask,
    )
    return model, DensifyState.zeros(model.capacity), info


def prune_step(
    model: GaussianModel,
    state: DensifyState,
    cfg: TrainConfig,
    scene_extent: jax.Array,
    prune_big_screen: bool = False,
    max_screen_px=None,
) -> Tuple[GaussianModel, dict]:
    """Kill gaussians that are nearly transparent or degenerately large
    (3DGS `prune_points`); dead slots return to the free pool.

    `max_screen_px` is the screen-radius prune threshold in pixels, derived
    by the trainer from the render resolution
    (cfg.prune_screen_frac * max(W, H)); None disables the screen-size test
    (world-space big-prune still applies)."""
    opacity = jax.nn.sigmoid(model.logit_opacities)
    too_faint = opacity < cfg.prune_opacity
    too_big_world = (
        jnp.exp(jnp.max(model.log_scales, axis=-1))
        > cfg.prune_radius_frac * scene_extent
    )
    kill = too_faint
    if prune_big_screen:
        kill = kill | too_big_world
        if max_screen_px is not None:
            kill = kill | (state.max_radii > max_screen_px)
    alive = model.alive & ~kill
    info = dict(pruned=jnp.sum((model.alive & kill).astype(jnp.int32)))
    return model.replace(alive=alive), info


def reset_opacity(model: GaussianModel, cfg: TrainConfig) -> GaussianModel:
    """Clamp opacity to a small value (3DGS resets every 3k steps so pruning
    can reclaim floaters)."""
    import math

    v = math.log(cfg.opacity_reset_value / (1 - cfg.opacity_reset_value))
    new = jnp.minimum(model.logit_opacities, v)
    return model.replace(
        logit_opacities=jnp.where(model.alive, new, model.logit_opacities)
    )
