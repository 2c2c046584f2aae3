from .gaussians import (
    GaussianModel,
    empty_model,
    from_arrays,
    from_points,
    random_model,
    scene_extent,
)

__all__ = [
    "GaussianModel",
    "empty_model",
    "from_arrays",
    "from_points",
    "random_model",
    "scene_extent",
]
