"""Dataset loaders and synthetic scene generation.

The reference only loads a pretrained PLY and renders it from a hardcoded
default camera (`examples/main.jl`, `forward.jl:43-53`); training datasets
are entirely absent. Provided here:

  * `synthetic_scene` — procedural ground-truth scene + orbit cameras,
    rendered with the oracle; drives BASELINE.json config 1 and all tests
    without any downloaded data.
  * `load_nerf_synthetic` — Blender `transforms_*.json` scenes (config 2).
  * `load_colmap_scene` — COLMAP sparse reconstructions (configs 3-5), via
    data/colmap.py binary readers.
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RasterConfig
from ..models.gaussians import GaussianModel, from_points, random_model
from ..ops.camera import Camera, fov_to_focal, make_camera, orbit_camera
from ..ops.oracle import render_oracle
from ..ops.projection import project_gaussians


@dataclasses.dataclass
class Scene:
    """A training scene: cameras with ground-truth images, plus an initial
    model (from SfM points or random)."""

    train_views: List[Tuple[Camera, jax.Array]]
    test_views: List[Tuple[Camera, jax.Array]]
    init_model: GaussianModel
    name: str = "scene"


def synthetic_scene(
    key: jax.Array,
    n_gaussians: int = 1024,
    n_train: int = 24,
    n_test: int = 4,
    width: int = 256,
    height: int = 256,
    capacity: Optional[int] = None,
    sh_degree: int = 1,
    fx: float = 300.0,
    radius: float = 6.0,
    cfg: Optional[RasterConfig] = None,
) -> Tuple[Scene, GaussianModel]:
    """Procedural scene: a random gaussian soup is the ground truth; GT
    images are oracle renders; the init model is a perturbed/fresh soup.
    Returns (scene, ground_truth_model)."""
    cfg = cfg or RasterConfig()
    k_gt, k_init = jax.random.split(key)
    gt_model = random_model(k_gt, n_gaussians, sh_degree=sh_degree, extent=1.0)

    @jax.jit
    def gt_render(cam):
        proj = project_gaussians(
            gt_model.means, gt_model.quats, gt_model.log_scales,
            gt_model.logit_opacities, gt_model.sh, cam, cfg,
            sh_degree=sh_degree, alive=gt_model.alive,
        )
        img, _ = render_oracle(proj, cam.width, cam.height, cfg)
        return img

    def views(count, offset):
        out = []
        for i in range(count):
            angle = 2.0 * math.pi * (i + offset) / max(count, 1)
            cam = orbit_camera(
                angle, radius, height_offset=1.5, fx=fx, fy=fx,
                width=width, height=height,
            )
            out.append((cam, gt_render(cam)))
        return out

    init = random_model(
        k_init, n_gaussians, sh_degree=sh_degree, extent=1.0,
        capacity=capacity or 4 * n_gaussians, opacity=0.3,
    )
    scene = Scene(
        train_views=views(n_train, 0.0),
        test_views=views(n_test, 0.37),
        init_model=init,
        name=f"synthetic{n_gaussians}",
    )
    return scene, gt_model


def _load_image(path: str, white_background: bool) -> np.ndarray:
    from PIL import Image

    img = np.asarray(Image.open(path), np.float32) / 255.0
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, -1)
    if img.shape[-1] == 4:
        alpha = img[..., 3:4]
        bg = 1.0 if white_background else 0.0
        img = img[..., :3] * alpha + bg * (1.0 - alpha)
    return img


def load_nerf_synthetic(
    root: str,
    split: str = "train",
    white_background: bool = False,
    downscale: int = 1,
    limit: Optional[int] = None,
) -> List[Tuple[Camera, jax.Array]]:
    """Blender/NeRF-synthetic `transforms_{split}.json` loader.

    Blender camera convention: +x right, +y up, -z forward (OpenGL); convert
    to the COLMAP-style +z-forward, +y-down frame used by the projector.
    """
    with open(os.path.join(root, f"transforms_{split}.json")) as f:
        meta = json.load(f)
    fovx = float(meta["camera_angle_x"])
    views = []
    frames = meta["frames"][:limit] if limit else meta["frames"]
    for frame in frames:
        img_path = os.path.join(root, frame["file_path"] + ".png")
        if not os.path.exists(img_path):
            img_path = os.path.join(root, frame["file_path"])
        img = _load_image(img_path, white_background)
        if downscale > 1:
            img = img[::downscale, ::downscale]
        h, w = img.shape[:2]
        c2w = np.asarray(frame["transform_matrix"], np.float32)
        # flip y/z axes: OpenGL cam-to-world -> COLMAP cam-to-world
        c2w[:3, 1:3] *= -1.0
        R = c2w[:3, :3].T            # world-to-camera rotation
        t = -R @ c2w[:3, 3]
        fx = fov_to_focal(fovx, w)
        views.append(
            (
                make_camera(R=R, t=t, fx=fx, fy=fx, width=w, height=h),
                jnp.asarray(img),
            )
        )
    return views


def nerf_synthetic_scene(
    root: str,
    white_background: bool = False,
    n_init: int = 100_000,
    capacity: Optional[int] = None,
    downscale: int = 1,
    limit: Optional[int] = None,
) -> Scene:
    train = load_nerf_synthetic(root, "train", white_background, downscale, limit)
    try:
        test = load_nerf_synthetic(root, "test", white_background, downscale,
                                   limit=limit or 8)
    except FileNotFoundError:
        test = train[:2]
    # 3DGS random-init inside a box for synthetic scenes
    rng = np.random.default_rng(0)
    pts = (rng.random((n_init, 3), dtype=np.float32) * 2.6 - 1.3)
    cols = rng.random((n_init, 3), dtype=np.float32)
    init = from_points(pts, cols, capacity=capacity)
    return Scene(train, test, init, name=os.path.basename(root.rstrip("/")))


def colmap_scene(
    root: str,
    images_dir: str = "images",
    downscale: int = 1,
    capacity: Optional[int] = None,
    limit: Optional[int] = None,
    test_every: int = 8,
) -> Scene:
    """COLMAP scene (Mip-NeRF360 / Tanks&Temples layout: sparse/0 + images)."""
    from .colmap import read_colmap_model

    cams, pts, cols = read_colmap_model(os.path.join(root, "sparse", "0"))
    views = []
    for name, cam in cams[:limit] if limit else cams:
        img_path = os.path.join(root, images_dir, name)
        if not os.path.exists(img_path):
            continue
        img = _load_image(img_path, False)
        if downscale > 1:
            img = img[::downscale, ::downscale]
            cam = cam.resized(img.shape[1], img.shape[0])
        views.append((cam, jnp.asarray(img)))
    train = [v for i, v in enumerate(views) if i % test_every != 0]
    test = [v for i, v in enumerate(views) if i % test_every == 0]
    init = from_points(pts, cols, capacity=capacity)
    return Scene(train, test, init, name=os.path.basename(root.rstrip("/")))
