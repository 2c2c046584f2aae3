"""Command-line entry points: train / render / eval.

The reference's only driver is a script that renders one frame from a
hardcoded camera and PLY path (`examples/main.jl:9-45`, with OS-specific
paths baked in at `main.jl:19-26`). Here: one CLI over explicit config
(`python -m gaussiansplat_tpu <cmd> ...`) covering training with
checkpoint/resume, rendering any PLY from orbit or dataset cameras, and
PSNR/SSIM evaluation.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import math
import os
import sys
from typing import Optional

import numpy as np


def _save_image(path: str, img) -> None:
    import numpy as np

    arr = np.asarray(np.clip(np.asarray(img), 0.0, 1.0) * 255.0, np.uint8)
    try:
        from PIL import Image

        Image.fromarray(arr).save(path)
    except ImportError:  # raw fallback, always available
        np.save(path + ".npy", arr)


def _load_scene(args):
    import jax

    from .data.datasets import colmap_scene, nerf_synthetic_scene, synthetic_scene

    if args.scene == "synthetic":
        scene, _ = synthetic_scene(
            jax.random.PRNGKey(args.seed), n_gaussians=args.synthetic_n,
            width=args.synthetic_size, height=args.synthetic_size,
        )
        return scene
    if args.scene == "benchmark":
        from .data.benchmark import benchmark_scene

        size = args.synthetic_size if args.synthetic_size != 256 else 800
        scene, _ = benchmark_scene(
            width=size, height=size,
            capacity=args.capacity or None,
            seed=args.seed, impl=args.impl,
        )
        return scene
    if os.path.exists(os.path.join(args.scene, "transforms_train.json")):
        return nerf_synthetic_scene(
            args.scene, white_background=args.white_background,
            downscale=args.downscale, capacity=args.capacity or None,
            n_init=args.n_init,
        )
    if os.path.isdir(os.path.join(args.scene, "sparse")):
        return colmap_scene(
            args.scene, downscale=args.downscale,
            capacity=args.capacity or None,
        )
    raise SystemExit(
        f"unrecognized scene '{args.scene}': expected 'synthetic', "
        "'benchmark' (bundled 150k-gaussian quality scene), a NeRF-synthetic "
        "dir (transforms_train.json) or a COLMAP dir (sparse/)"
    )


def cmd_train(args) -> int:
    from .config import RasterConfig, TrainConfig
    from .train.trainer import Trainer
    from .utils import MetricLogger, export_ply

    scene = _load_scene(args)
    tcfg = TrainConfig(
        iterations=args.iterations,
        white_background=args.white_background,
        sh_degree=args.sh_degree,
        eval_every=args.eval_every,
    )
    rcfg = RasterConfig(impl=args.impl, packed=not args.no_packed,
                        pairs_per_gaussian=args.pairs_per_gaussian)
    os.makedirs(args.out, exist_ok=True)
    logger = MetricLogger(os.path.join(args.out, "metrics.jsonl"))
    trainer = Trainer(raster_cfg=rcfg, cfg=tcfg)
    model, metrics = trainer.fit(
        scene.init_model,
        scene.train_views,
        log=logger.log,
        ckpt_dir=os.path.join(args.out, "ckpts"),
        resume=args.resume,
        eval_views=scene.test_views[: args.eval_views] or None,
        preview_dir=(None if args.no_previews
                     else os.path.join(args.out, "previews")),
    )
    n = export_ply(os.path.join(args.out, "point_cloud.ply"), model)
    print(f"trained {args.iterations} iters on '{scene.name}': "
          f"final loss={metrics.get('loss', float('nan')):.4f} "
          f"psnr={metrics.get('psnr', float('nan')):.2f} "
          f"-> {n} gaussians exported to {args.out}/point_cloud.ply")
    logger.close()
    return 0


def cmd_render(args) -> int:
    import jax
    import jax.numpy as jnp

    from .config import RasterConfig
    from .ops.camera import orbit_camera
    from .render import render
    from .utils import import_ply

    model = import_ply(args.ply)
    cfg = RasterConfig(impl=args.impl, packed=not args.no_packed,
                       pairs_per_gaussian=args.pairs_per_gaussian)
    bg = jnp.ones((3,)) if args.white_background else jnp.zeros((3,))

    if args.cameras:
        from .data.cameras import load_cameras_json

        cams = load_cameras_json(args.cameras)[: args.frames]
    else:
        cams = [
            orbit_camera(
                2.0 * math.pi * i / args.frames, args.radius,
                height_offset=args.orbit_height, fx=args.fx, fy=args.fx,
                width=args.width, height=args.height,
            )
            for i in range(args.frames)
        ]

    os.makedirs(args.out, exist_ok=True)
    fn = jax.jit(
        lambda m, c: render(m, c, cfg, sh_degree=args.sh_degree,
                            background=bg).image
    )
    for i, cam in enumerate(cams):
        img = fn(model, cam)
        path = os.path.join(args.out, f"frame_{i:04d}.png")
        _save_image(path, img)
        print(f"rendered {path} ({cam.width}x{cam.height})")
    return 0


def cmd_eval(args) -> int:
    import jax
    import jax.numpy as jnp

    from .config import RasterConfig
    from .render import render
    from .train.loss import psnr, ssim
    from .utils import import_ply

    scene = _load_scene(args)
    model = import_ply(args.ply)
    cfg = RasterConfig(impl=args.impl, packed=not args.no_packed,
                       pairs_per_gaussian=args.pairs_per_gaussian)
    bg = jnp.ones((3,)) if args.white_background else jnp.zeros((3,))
    fn = jax.jit(
        lambda m, c: render(m, c, cfg, sh_degree=args.sh_degree,
                            background=bg).image
    )
    psnrs, ssims = [], []
    for cam, gt in scene.test_views:
        img = fn(model, cam)
        psnrs.append(float(psnr(img, gt)))
        ssims.append(float(ssim(img, gt)))
    out = dict(
        scene=scene.name, n_views=len(psnrs),
        psnr=float(np.mean(psnrs)), ssim=float(np.mean(ssims)),
    )
    print(json.dumps(out))
    return 0


def _add_scene_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--scene", default="synthetic",
                   help="'synthetic', NeRF-synthetic dir, or COLMAP dir")
    p.add_argument("--synthetic-n", type=int, default=1024)
    p.add_argument("--synthetic-size", type=int, default=256)
    p.add_argument("--downscale", type=int, default=1)
    p.add_argument("--capacity", type=int, default=0)
    p.add_argument("--n-init", type=int, default=100_000,
                   help="random-init gaussian count for NeRF-synthetic "
                        "scenes (COLMAP scenes init from SfM points)")
    p.add_argument("--seed", type=int, default=0)


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--impl", default="auto", choices=["auto", "xla", "pallas"])
    p.add_argument("--pairs-per-gaussian", type=float, default=8.0,
                   help="static pair-list capacity as a multiple of N "
                        "(overflow is counted and logged, never reallocated)")
    p.add_argument("--no-packed", action="store_true",
                   help="disable the bf16-packed pallas fast path "
                        "(bit-exact kernels, ~25%% slower)")
    p.add_argument("--sh-degree", type=int, default=3)
    p.add_argument("--white-background", action="store_true")


def main(argv: Optional[list] = None) -> int:
    ap = argparse.ArgumentParser(prog="gaussiansplat_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    pt = sub.add_parser("train", help="train a 3DGS scene")
    _add_scene_args(pt)
    _add_common(pt)
    pt.add_argument("--iterations", type=int, default=7000)
    pt.add_argument("--out", default="runs/out")
    pt.add_argument("--resume", action="store_true")
    pt.add_argument("--eval-every", type=int, default=1000,
                    help="held-out PSNR/SSIM (+ preview PNG) cadence")
    pt.add_argument("--eval-views", type=int, default=8,
                    help="number of test views scored per eval")
    pt.add_argument("--no-previews", action="store_true")
    pt.set_defaults(fn=cmd_train)

    pr = sub.add_parser("render", help="render a PLY scene to images")
    _add_common(pr)
    pr.add_argument("--ply", required=True)
    pr.add_argument("--out", default="renders")
    pr.add_argument("--cameras", default="",
                    help="optional INRIA cameras.json; default orbit")
    pr.add_argument("--frames", type=int, default=1)
    pr.add_argument("--width", type=int, default=1280)
    pr.add_argument("--height", type=int, default=720)
    pr.add_argument("--fx", type=float, default=1000.0)
    pr.add_argument("--radius", type=float, default=6.0)
    pr.add_argument("--orbit-height", type=float, default=1.0)
    pr.set_defaults(fn=cmd_render)

    pe = sub.add_parser("eval", help="PSNR/SSIM of a PLY against a scene")
    _add_scene_args(pe)
    _add_common(pe)
    pe.add_argument("--ply", required=True)
    pe.set_defaults(fn=cmd_eval)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
