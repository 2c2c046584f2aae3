from .gaussians import (
    GaussianModel,
    empty_model,
    from_arrays,
    from_points,
    random_model,
    scene_extent,
)
from .splats2d import Splat2DModel, random_splats2d, render_splats2d

__all__ = [
    "GaussianModel",
    "Splat2DModel",
    "empty_model",
    "from_arrays",
    "from_points",
    "random_model",
    "random_splats2d",
    "render_splats2d",
    "scene_extent",
]
