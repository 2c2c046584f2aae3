"""gaussiansplat_tpu: a TPU-native 3D Gaussian Splatting framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the reference
`arhik/GaussianSplat` (see SURVEY.md) redesigned TPU-first: static-shape
tile binning via lexicographic sort, fused matmul-formulated tile
rasterization kernels, a deterministic atomic-free backward, an on-device
training loop with adaptive densification, and mesh sharding for multi-chip
scaling.
"""

from .config import MeshConfig, RasterConfig, TrainConfig

__version__ = "0.1.0"

__all__ = [
    "MeshConfig",
    "RasterConfig",
    "TrainConfig",
    "__version__",
]
