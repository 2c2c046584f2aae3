from .camera import Camera, look_at, make_camera, orbit_camera
from .projection import Projected, make_payload, project_gaussians
from .binning import TileBinning, bin_gaussians, tile_grid
from .oracle import render_oracle, render_oracle_full

__all__ = [
    "Camera",
    "Projected",
    "TileBinning",
    "bin_gaussians",
    "look_at",
    "make_camera",
    "make_payload",
    "orbit_camera",
    "project_gaussians",
    "render_oracle",
    "render_oracle_full",
    "tile_grid",
]
