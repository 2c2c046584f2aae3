"""Per-stage timing of the render pipeline: projection / binning / gather /
rasterization, each jitted separately, plus the fused whole. Identifies the
frame-time bottleneck on the current backend (SURVEY §5 tracing analogue —
pair with utils.profile_trace for full XProf timelines).

    python benchmarks/profile_stages.py --n 1000000 --width 1920 --height 1080
"""

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(f, *args, warmup=2, iters=10):
    for _ in range(warmup):
        jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    from gaussiansplat_tpu.config import RasterConfig
    from gaussiansplat_tpu.models import random_model
    from gaussiansplat_tpu.ops import look_at
    from gaussiansplat_tpu.ops.binning import bin_gaussians
    from gaussiansplat_tpu.ops.projection import make_payload, project_gaussians
    from gaussiansplat_tpu.ops.tile_raster import rasterize_tiles_xla
    from gaussiansplat_tpu.render import render

    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=65536)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--sh-degree", type=int, default=3)
    ap.add_argument("--impl", default=None)
    ap.add_argument("--chunk-size", type=int, default=128)
    ap.add_argument("--pairs-per-gaussian", type=float, default=8.0)
    args = ap.parse_args()

    cfg = RasterConfig(chunk_size=args.chunk_size,
                       pairs_per_gaussian=args.pairs_per_gaussian)
    impl = args.impl or ("pallas" if jax.default_backend() == "tpu" else "xla")
    model = random_model(jax.random.PRNGKey(0), args.n,
                         sh_degree=args.sh_degree, extent=1.0,
                         opacity=0.8, scale_range=(0.004, 0.012))
    cam = look_at(eye=(0.0, 0.0, -4.0), target=(0, 0, 0),
                  fx=1600.0, fy=1600.0, width=args.width, height=args.height)
    bg = jnp.zeros((3,), jnp.float32)
    sh = args.sh_degree

    project = jax.jit(lambda m: project_gaussians(
        m.means, m.quats, m.log_scales, m.logit_opacities, m.sh, cam, cfg,
        sh_degree=sh, alive=m.alive))
    proj = jax.block_until_ready(project(model))

    binjit = jax.jit(lambda p: bin_gaussians(p, cam.width, cam.height, cfg))
    binning = jax.block_until_ready(binjit(proj))

    gather = jax.jit(lambda p, b: make_payload(p)[b.sorted_ids])
    sorted_payload = jax.block_until_ready(gather(proj, binning))

    if impl == "pallas":
        from gaussiansplat_tpu.ops.pallas.rasterize import rasterize_tiles_pallas

        raster = jax.jit(lambda sp, ts: rasterize_tiles_pallas(
            sp, ts, bg, cam.width, cam.height, cfg).image)
    else:
        raster = jax.jit(lambda sp, ts: rasterize_tiles_xla(
            sp, ts, bg, cam.width, cam.height, cfg).image)

    full = jax.jit(lambda m: render(m, cam, cfg, sh_degree=sh, background=bg,
                                    impl=impl).image)

    t_proj = timeit(project, model)
    t_bin = timeit(binjit, proj)
    t_gather = timeit(gather, proj, binning)
    t_raster = timeit(raster, sorted_payload, binning.tile_starts)
    t_full = timeit(full, model)

    pairs = int(binning.num_pairs)
    print(f"backend={jax.default_backend()} impl={impl} n={args.n} "
          f"{args.width}x{args.height} pairs={pairs} "
          f"capacity={binning.capacity} chunk={cfg.chunk_size}")
    for name, t in [("project", t_proj), ("bin+sort", t_bin),
                    ("gather", t_gather), ("raster", t_raster),
                    ("TOTAL(stages)", t_proj + t_bin + t_gather + t_raster),
                    ("fused render", t_full)]:
        print(f"  {name:>14}: {t * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
