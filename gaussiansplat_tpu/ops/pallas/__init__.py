"""Fused Pallas TPU kernels for the tile rasterizer (forward + backward)."""

from .rasterize import rasterize_tiles_pallas

__all__ = ["rasterize_tiles_pallas"]
