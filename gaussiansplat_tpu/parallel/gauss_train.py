"""Training with gaussian-axis-sharded parameters.

The model pytree (and therefore the Adam moments) lives partitioned across
the `gauss` mesh axis; the forward/backward runs through the all_to_all
payload exchange of gauss_shard.py, whose VJP delivers each parameter
gradient directly to the shard that owns it — so the optimizer update is
embarrassingly parallel and no gradient collective is needed (contrast with
the data/tile-sharded step in parallel/train.py, which psums replicated
gradients).

Only the render is an explicit shard_map; the loss, Adam update, and
densification statistics are plain JAX under `jit`, partitioned by GSPMD
propagation from the parameter shardings. Densify/prune (models/densify.py)
work unchanged on sharded state: their cumsum/argsort compaction lowers to
collective ops when XLA needs them, and dead-slot recycling stays exact.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from ..config import RasterConfig, TrainConfig
from ..models.gaussians import GaussianModel
from ..ops.camera import Camera
from ..train.loss import photometric_loss, psnr
from ..train.trainer import TrainState, init_train_state
from .gauss_shard import GAUSS_AXIS, make_gauss_sharded_render, shard_model


def init_gauss_sharded_state(
    model: GaussianModel, mesh: Mesh, cfg: TrainConfig, extent: float
):
    """Shard the model over the gauss axis, then build the train state; the
    optimizer moments inherit the parameter shardings."""
    smodel = shard_model(model, mesh)
    return init_train_state(smodel, cfg, extent)


def make_gauss_sharded_train_step(
    mesh: Mesh,
    tx: optax.GradientTransformation,
    raster_cfg: RasterConfig,
    cfg: TrainConfig,
    width: int,
    height: int,
    sh_degree: int,
    send_cap: Optional[int] = None,
    xla_max_chunks: int = 64,
    impl: Optional[str] = None,
):
    """Build `step(state, camera, gt) -> (state, metrics)` over sharded
    parameters. `gt` is the full (H, W, 3) target, replicated."""
    render_fn = make_gauss_sharded_render(
        mesh, raster_cfg, width, height, sh_degree,
        send_cap=send_cap, xla_max_chunks=xla_max_chunks, impl=impl,
    )

    def step(state: TrainState, camera: Camera, gt: jax.Array):
        key, bg_key = jax.random.split(state.key)
        if cfg.random_background:
            background = jax.random.uniform(bg_key, (3,))
        elif cfg.white_background:
            background = jnp.ones((3,))
        else:
            background = jnp.zeros((3,))

        params = state.model.trainable()
        zeros2d = jnp.zeros((state.model.capacity, 2), jnp.float32)

        def loss_fn(params, offset2d):
            m = state.model.with_params(params)
            img, _, aux = render_fn(
                m, camera, background, mean2d_offset=offset2d, with_aux=True
            )
            return photometric_loss(img, gt, cfg.ssim_lambda), (img, aux)

        (loss, (img, aux)), (grads, grad2d) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(params, zeros2d)

        updates, opt_state = tx.update(grads, state.opt_state, params)
        new_params = optax.apply_updates(params, updates)
        model = state.model.with_params(new_params)
        densify = state.densify.update(grad2d, aux["radii"])
        new_state = state.replace(
            model=model,
            opt_state=opt_state,
            densify=densify,
            step=state.step + 1,
            key=key,
        )
        metrics = dict(
            loss=loss,
            psnr=psnr(img, gt),
            overflow=aux["overflow"],
            max_chunks=aux["max_chunks_needed"],
            num_alive=model.num_alive,
        )
        return new_state, metrics

    return jax.jit(step)
