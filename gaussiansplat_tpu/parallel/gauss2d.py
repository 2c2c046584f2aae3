"""2D data x gauss mesh: batched views over gaussian-sharded parameters.

Composes the two production sharding axes into one pod-shaped mesh
(VERDICT r4 missing item 5; SURVEY §2.4's `(hosts=DCN, devices=ICI)` shape):

  * the `gauss` axis partitions the parameter pytree and runs the strip
    all_to_all exchange of parallel/gauss_shard.py (HBM scaling);
  * the `data` axis renders a DIFFERENT camera per replica group and
    averages the loss (throughput scaling), with the parameter-gradient
    reduction over `data` inserted by shard_map's replicated-input
    transpose (a psum over exactly the axis the model is replicated on).

Only the render lives in an explicit shard_map; the loss, Adam update, and
metrics are plain JAX on the assembled image batch, like gauss_train.py.
Device layout note: `gauss` is the minor (fastest-varying) mesh axis, so
its all_to_all rides neighbor ICI links while the infrequent `data` psum
crosses the slower axis — the standard pod mapping.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import RasterConfig, TrainConfig
from ..models.gaussians import GaussianModel
from ..ops.binning import tile_grid
from ..train.loss import photometric_loss, psnr
from ..train.trainer import TrainState
from .gauss_shard import GAUSS_AXIS, render_gauss_sharded_strip

DATA_AXIS = "data"


def make_mesh2d(data: int, gauss: int, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if data * gauss > len(devices):
        raise ValueError(
            f"mesh {data}x{gauss} needs {data * gauss} devices, "
            f"have {len(devices)}")
    arr = np.asarray(devices[: data * gauss]).reshape(data, gauss)
    return Mesh(arr, (DATA_AXIS, GAUSS_AXIS))


def shard_model_2d(model: GaussianModel, mesh: Mesh) -> GaussianModel:
    """Gauss-axis sharded, data-axis replicated placement."""
    s = NamedSharding(mesh, P(GAUSS_AXIS))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), model)


def make_gauss2d_render(
    mesh: Mesh,
    cfg: RasterConfig,
    width: int,
    height: int,
    sh_degree: int,
    send_cap: Optional[int] = None,
    xla_max_chunks: int = 64,
    impl: Optional[str] = None,
    send_fraction: float = 0.5,
):
    """Build `f(model, cameras, background) -> (images, aux)` rendering one
    camera per data-replica group: `cameras` is a stacked pytree with
    leading axis n_data (parallel.stack_cameras), the result is the
    assembled (n_data, H, W, 3) batch. Differentiable in model/background;
    the model must be placed with shard_model_2d."""
    from .render import resolve_shard_impl

    impl = resolve_shard_impl(impl if impl is not None else cfg.impl)
    nd_g = mesh.shape[GAUSS_AXIS]
    nd_d = mesh.shape[DATA_AXIS]
    ts = cfg.tile_size
    tiles_x, tiles_y = tile_grid(width, height, ts)
    if tiles_y % nd_g != 0:
        raise ValueError(
            f"tile rows ({tiles_y}) must divide across the gauss axis "
            f"({nd_g}); pad the image height to a multiple of {ts * nd_g}")
    rows = tiles_y // nd_g
    strip_h = rows * ts

    @functools.lru_cache(maxsize=None)
    def _make(cap: int):
        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(GAUSS_AXIS), P(DATA_AXIS), P()),
            out_specs=(P((DATA_AXIS, GAUSS_AXIS), None, None), P()),
            check_vma=False,
        )
        def _sharded(model, cameras, background):
            cam = jax.tree_util.tree_map(lambda x: x[0], cameras)
            img, _, aux = render_gauss_sharded_strip(
                model, cam, cfg, sh_degree, background, nd_g, rows, cap,
                axis_name=GAUSS_AXIS, xla_max_chunks=xla_max_chunks,
                impl=impl,
            )
            overflow = jax.lax.psum(
                jax.lax.psum(aux["overflow"].astype(jnp.float32), GAUSS_AXIS),
                DATA_AXIS,
            )
            return img, overflow

        return _sharded

    def resolve_cap(global_capacity: int) -> int:
        if send_cap is not None:
            return send_cap
        from .capacity import plan_gauss_sharded

        return plan_gauss_sharded(
            global_capacity, nd_g, width, height, sh_degree, cfg,
            send_fraction=send_fraction,
        ).send_cap

    def f(model, cameras, background):
        stacked, overflow = _make(resolve_cap(model.capacity))(
            model, cameras, background)
        # dim 0 concatenates data-major over (data, strip): (n_data * n_g *
        # strip_h, W, 3) -> (n_data, padded_h, W, 3), cropped to height.
        imgs = stacked.reshape(nd_d, nd_g * strip_h, width, 3)[:, :height]
        return imgs, dict(overflow=overflow.astype(jnp.int32))

    return f


def make_gauss2d_train_step(
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
    """Build `step(state, cameras, gts) -> (state, metrics)`: one camera and
    (H, W, 3) target per data group (stacked on axis 0), loss averaged over
    the batch, parameters and Adam moments sharded over `gauss` only."""
    render_fn = make_gauss2d_render(
        mesh, raster_cfg, width, height, sh_degree,
        send_cap=send_cap, xla_max_chunks=xla_max_chunks, impl=impl,
    )

    def step(state: TrainState, cameras, gts: jax.Array):
        key, bg_key = jax.random.split(state.key)
        if cfg.random_background:
            background = jax.random.uniform(bg_key, (3,))
        elif cfg.white_background:
            background = jnp.ones((3,))
        else:
            background = jnp.zeros((3,))

        params = state.model.trainable()

        def loss_fn(p):
            m = state.model.with_params(p)
            imgs, aux = render_fn(m, cameras, background)
            losses = jax.vmap(
                lambda im, gt: photometric_loss(im, gt, cfg.ssim_lambda)
            )(imgs, gts)
            return jnp.mean(losses), (imgs, aux)

        (loss, (imgs, aux)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, state.opt_state, params)
        model = state.model.with_params(optax.apply_updates(params, updates))
        new_state = state.replace(
            model=model, opt_state=opt_state, step=state.step + 1, key=key)
        metrics = dict(
            loss=loss,
            psnr=jnp.mean(jax.vmap(psnr)(imgs, gts)),
            overflow=aux["overflow"],
            num_alive=model.num_alive,
        )
        return new_state, metrics

    return jax.jit(step)
