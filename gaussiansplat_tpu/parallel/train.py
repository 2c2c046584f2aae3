"""Multi-chip training step: data-parallel views x tile-parallel strips.

The full 3DGS train step over a 2D device mesh (SURVEY §2.4 required
strategies, mapped to this domain):

  * DP   — each `data` shard trains on its own camera view(s); gradients are
           `psum`-averaged over the data axis (DCN-friendly on pods).
  * "SP" — within a view, the pixel-tile grid is sharded into horizontal
           strips over the `tile` axis (the sequence/context-parallel
           analogue from SURVEY §5); per-gaussian gradients are partial sums
           `psum`-reduced over ICI.
  * TP/PP/EP — no domain analogue (SURVEY §2.4): parameters are replicated;
           gaussian-axis sharding with ring compositing is the planned
           round-2 extension for >HBM scenes.

Everything runs in one `shard_map` under one jit: forward strips, loss,
backward, cross-device reductions, and the replicated Adam update — no host
round trips.

The objective is EXACT, not strip-approximate: each strip exchanges 5
boundary rows (the 11-px SSIM window radius) with its neighbors via
`ppermute`, computes the per-pixel SSIM map on the halo-extended strip, and
psums masked partial sums — bit-for-bit the single-device L1 + DSSIM over
the true (unpadded) image. Gradients flow back through the halo exchange
(the ppermute VJP is the transposed permutation).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..config import RasterConfig, TrainConfig
from ..models.gaussians import GaussianModel
from ..ops.binning import tile_grid
from ..ops.camera import Camera
from ..train.loss import ssim_map
from ..train.trainer import TrainState
from .mesh import DATA_AXIS, TILE_AXIS
from .render import render_strip

# SSIM window radius: rows exchanged between neighboring strips so windows
# that straddle a strip boundary see the true neighbor pixels.
SSIM_HALO = 5


def stack_cameras(cameras) -> Camera:
    """Stack a list of same-resolution cameras into one batched Camera
    pytree (leading axis = view)."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *cameras)


def make_sharded_train_step(
    mesh: Mesh,
    tx: optax.GradientTransformation,
    raster_cfg: RasterConfig,
    cfg: TrainConfig,
    width: int,
    height: int,
    sh_degree: int,
    xla_max_chunks: int = 64,
    return_grads: bool = False,
    impl: Optional[str] = None,
):
    """Build `step(state, cams (B,...), gts (B, Hp, W, 3)) -> (state, metrics)`.

    B must equal the data-axis size; gts must be pre-padded to the
    tile-aligned height Hp (pad rows replicate the rendered background and
    contribute zero L1 once both sides agree; use `pad_targets`).
    """
    from .render import resolve_shard_impl

    impl = resolve_shard_impl(impl if impl is not None else raster_cfg.impl)
    ndata = mesh.shape[DATA_AXIS]
    ntile = mesh.shape[TILE_AXIS]
    ts = raster_cfg.tile_size
    tiles_x, tiles_y = tile_grid(width, height, ts)
    if tiles_y % ntile != 0:
        raise ValueError(
            f"tile rows ({tiles_y}) must divide across tile axis ({ntile})"
        )
    rows = tiles_y // ntile
    strip_h = rows * ts

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(DATA_AXIS), P(DATA_AXIS, TILE_AXIS)),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )
    def _step(params, state, cams, gts):
        # local shapes: cams leaves (1, ...), gts (1, strip_h, W, 3)
        model = state.model
        cam = jax.tree_util.tree_map(lambda x: x[0], cams)
        gt_strip = gts[0]
        row0 = jax.lax.axis_index(TILE_AXIS) * rows
        n = model.capacity
        pair_cap = max(
            raster_cfg.pair_capacity(n) // ntile, 4 * raster_cfg.chunk_size
        )
        # Background policy mirrors the single-device step. `state.key` is
        # replicated, so folding in the data index gives every strip of one
        # view the same background while views differ.
        if cfg.random_background:
            bg_key = jax.random.fold_in(
                jax.random.fold_in(state.key, 7), jax.lax.axis_index(DATA_AXIS)
            )
            background = jax.random.uniform(bg_key, (3,))
        elif cfg.white_background:
            background = jnp.ones((3,), jnp.float32)
        else:
            background = jnp.zeros((3,), jnp.float32)

        # Rows past the true image height (tile padding) are masked out of
        # the loss on both sides so they contribute no gradient.
        local_row = jax.lax.broadcasted_iota(jnp.int32, (strip_h, 1, 1), 0)
        row_mask = ((row0 * ts + local_row[:, 0, 0]) < height)[:, None, None]

        lam = cfg.ssim_lambda
        denom = float(height * width * 3)

        def loss_fn(params, offset2d):
            m = model.with_params(params)
            img, trans, aux = render_strip(
                m, cam, raster_cfg, sh_degree, background, row0, rows,
                pair_cap, mean2d_offset=offset2d,
                xla_max_chunks=xla_max_chunks, impl=impl,
            )
            img = jnp.where(row_mask, img, 0.0)
            gt = jnp.where(row_mask, gt_strip, 0.0)
            # EXACT global objective: exchange the 5 boundary rows with both
            # neighbors so every 11-px SSIM window sees the true image
            # content it would see single-device. Strip 0's top halo / last
            # strip's bottom halo receive ppermute zeros — identical to the
            # zero padding the single-device blur applies at image borders
            # (pad rows past the true height are already zero-masked).
            fwd_perm = [(i, i + 1) for i in range(ntile - 1)]
            bwd_perm = [(i, i - 1) for i in range(1, ntile)]
            above_i, above_g = jax.lax.ppermute(
                (img[-SSIM_HALO:], gt[-SSIM_HALO:]), TILE_AXIS, fwd_perm)
            below_i, below_g = jax.lax.ppermute(
                (img[:SSIM_HALO], gt[:SSIM_HALO]), TILE_AXIS, bwd_perm)
            ext_i = jnp.concatenate([above_i, img, below_i], axis=0)
            ext_g = jnp.concatenate([above_g, gt, below_g], axis=0)
            smap = ssim_map(ext_i, ext_g)[SSIM_HALO:-SSIM_HALO]
            s_sum = jnp.sum(jnp.where(row_mask, smap, 0.0))
            l1_sum = jnp.sum(jnp.abs(img - gt))
            sq_sum = jnp.sum((img - gt) ** 2)
            # Per-device partial of mean-over-views[(1-l)L1 + l(1-SSIM)]:
            # psum over (data, tile) reconstructs it exactly (the constant
            # l*1 term is spread over the ntile strips of each view).
            local = (((1.0 - lam) * l1_sum - lam * s_sum) / denom
                     + lam / ntile) / ndata
            return local, (sq_sum, aux)

        zeros2d = jnp.zeros((n, 2), jnp.float32)
        (loss_local, (sq_sum, aux)), (grads, grad2d) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(params, zeros2d)

        # Reductions: gradients sum over both axes (loss already carries the
        # 1/(ndata*ntile) normalization).
        grads = jax.lax.psum(grads, (DATA_AXIS, TILE_AXIS))
        grad2d = jax.lax.psum(grad2d, (DATA_AXIS, TILE_AXIS))
        loss = jax.lax.psum(loss_local, (DATA_AXIS, TILE_AXIS))
        radii = jax.lax.pmax(
            jax.lax.pmax(aux["radii"], TILE_AXIS), DATA_AXIS
        )
        # Exact per-view MSE over the true (unpadded) image, then mean of
        # per-view PSNR over the data axis.
        mse = jax.lax.psum(sq_sum, TILE_AXIS) / denom

        updates, opt_state = tx.update(grads, state.opt_state, params)
        new_params = optax.apply_updates(params, updates)
        new_model = model.with_params(new_params)
        densify = state.densify.update(grad2d, radii)
        new_state = state.replace(
            model=new_model,
            opt_state=opt_state,
            densify=densify,
            step=state.step + 1,
            key=jax.random.fold_in(state.key, 1),
        )
        metrics = dict(
            loss=loss,
            psnr=jax.lax.pmean(
                10.0 * jnp.log10(1.0 / jnp.maximum(mse, 1e-12)), DATA_AXIS
            ),
            overflow=jax.lax.psum(
                aux["overflow"], (DATA_AXIS, TILE_AXIS)
            ),
            max_chunks=jax.lax.pmax(
                jax.lax.pmax(aux["max_chunks_needed"], TILE_AXIS), DATA_AXIS
            ),
        )
        if return_grads:
            metrics["grads"] = grads
        return new_params, new_state, metrics, loss

    def step(state: TrainState, cams: Camera, gts: jax.Array):
        params = state.model.trainable()
        new_params, new_state, metrics, _ = _step(params, state, cams, gts)
        return new_state, metrics

    return jax.jit(step)


def pad_targets(gts: jax.Array, height: int, tile_size: int, ntile: int) -> jax.Array:
    """Pad (B, H, W, 3) ground truth to the tile/strip-aligned height."""
    ts = tile_size
    tiles_y = -(-height // ts)
    tiles_y = -(-tiles_y // ntile) * ntile
    hp = tiles_y * ts
    return jnp.pad(gts, ((0, 0), (0, hp - height), (0, 0), (0, 0)))
