"""Weak-scaling sweep: fixed work per device, growing device count.

BASELINE.json's north star asks for >=80% weak-scaling efficiency from 1 to
N devices. Two axes are swept:

  * tile axis — one view, image height grows with the device count
    (each device rasterizes a fixed strip);
  * gauss axis — gaussian count grows with the device count (each device
    owns a fixed parameter shard, payloads exchanged via all_to_all).

On a machine without a real multi-chip slice, run on the virtual CPU mesh:

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python benchmarks/weak_scaling.py

(Virtual devices share host cores, so CPU "efficiency" is pessimistic — the
point of the CPU run is exercising the real collectives, not the numbers.)
"""

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def time_fn(f, *args, warmup=2, iters=5):
    for _ in range(warmup):
        jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def sweep_tile_axis(counts, base_n, width, base_height, cfg, sh_degree):
    from gaussiansplat_tpu.models import random_model
    from gaussiansplat_tpu.ops import look_at
    from gaussiansplat_tpu.parallel import make_mesh, make_tile_sharded_render

    rows = []
    model = random_model(jax.random.PRNGKey(0), base_n, sh_degree=sh_degree,
                         extent=1.0)
    for nd in counts:
        height = base_height * nd
        cam = look_at(eye=(0.0, 0.0, -4.0), target=(0, 0, 0), fx=700.0,
                      fy=700.0, width=width, height=height)
        mesh = make_mesh(data=1, tile=nd)
        f = jax.jit(make_tile_sharded_render(mesh, cfg, width, height, sh_degree))
        dt = time_fn(f, model, cam, jnp.zeros((3,)))
        rays = width * height
        rows.append(dict(axis="tile", devices=nd, rays=rays, sec=dt,
                         rays_per_sec=rays / dt))
    return rows


def sweep_gauss_axis(counts, n_per_device, width, height, cfg, sh_degree):
    from gaussiansplat_tpu.models import random_model
    from gaussiansplat_tpu.ops import look_at
    from gaussiansplat_tpu.parallel import (
        make_gauss_mesh, make_gauss_sharded_render, shard_model,
    )

    rows = []
    cam = look_at(eye=(0.0, 0.0, -4.0), target=(0, 0, 0), fx=700.0, fy=700.0,
                  width=width, height=height)
    for nd in counts:
        n = n_per_device * nd
        model = random_model(jax.random.PRNGKey(0), n, sh_degree=sh_degree,
                             extent=1.0)
        mesh = make_gauss_mesh(nd)
        smodel = shard_model(model, mesh)
        f = jax.jit(make_gauss_sharded_render(mesh, cfg, width, height, sh_degree))
        dt = time_fn(f, smodel, cam, jnp.zeros((3,)))
        rows.append(dict(axis="gauss", devices=nd, gaussians=n, sec=dt,
                         gaussians_per_sec=n / dt))
    return rows


def main():
    from gaussiansplat_tpu.config import RasterConfig

    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", default="xla")
    ap.add_argument("--base-n", type=int, default=8192)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--base-height", type=int, default=128)
    ap.add_argument("--sh-degree", type=int, default=1)
    args = ap.parse_args()

    nd_max = jax.device_count()
    counts = [c for c in (1, 2, 4, 8, 16, 32) if c <= nd_max]
    cfg = RasterConfig(impl=args.impl)
    print(f"devices: {nd_max} ({jax.default_backend()}); counts {counts}")

    rows = sweep_tile_axis(counts, args.base_n, args.width, args.base_height,
                           cfg, args.sh_degree)
    rows += sweep_gauss_axis(counts, args.base_n // 2, args.width,
                             args.base_height * counts[-1], cfg, args.sh_degree)
    for axis in ("tile", "gauss"):
        sub = [r for r in rows if r["axis"] == axis]
        base = sub[0]["sec"]
        for r in sub:
            r["weak_scaling_efficiency"] = base / r["sec"]
            print(json.dumps(r))


if __name__ == "__main__":
    main()
