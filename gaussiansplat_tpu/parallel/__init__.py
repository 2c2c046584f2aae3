from .capacity import (
    CapacityPlan,
    max_gaussians_per_chip,
    min_devices_for,
    plan_gauss_sharded,
)
from .depth_ring import make_depth_ring_render
from .gauss_shard import (
    GAUSS_AXIS,
    make_gauss_mesh,
    make_gauss_sharded_render,
    shard_model,
)
from .gauss_train import init_gauss_sharded_state, make_gauss_sharded_train_step
from .gauss2d import (
    make_gauss2d_render,
    make_gauss2d_train_step,
    make_mesh2d,
    shard_model_2d,
)
from .mesh import DATA_AXIS, TILE_AXIS, make_mesh, mesh_from_config
from .render import make_tile_sharded_render, render_strip
from .train import make_sharded_train_step, pad_targets, stack_cameras

__all__ = [
    "CapacityPlan",
    "DATA_AXIS",
    "GAUSS_AXIS",
    "TILE_AXIS",
    "max_gaussians_per_chip",
    "min_devices_for",
    "plan_gauss_sharded",
    "init_gauss_sharded_state",
    "make_depth_ring_render",
    "make_gauss_mesh",
    "make_gauss_sharded_render",
    "make_gauss_sharded_train_step",
    "make_gauss2d_render",
    "make_gauss2d_train_step",
    "make_mesh",
    "make_mesh2d",
    "make_sharded_train_step",
    "make_tile_sharded_render",
    "mesh_from_config",
    "pad_targets",
    "render_strip",
    "shard_model",
    "shard_model_2d",
    "stack_cameras",
]
