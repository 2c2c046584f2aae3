"""Breakdown of the full 1080p training step at the bench config (packed
pallas path): where do the 175ms go beyond the raster kernels?

Isolates: fwd render, fwd+bwd with a trivial sum loss (render + all VJPs,
no loss math), L1-only step, full L1+DSSIM step, and the SSIM fwd+grad on
its own — so loss-side cost is separated from the render pipeline.

    python benchmarks/profile_step.py            # on the TPU
"""

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/gsplat_tpu_cache"),
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def main():
    from gaussiansplat_tpu.config import RasterConfig
    from gaussiansplat_tpu.models import random_model
    from gaussiansplat_tpu.ops import look_at
    from gaussiansplat_tpu.ops.binning import bin_gaussians
    from gaussiansplat_tpu.ops.projection import make_payload, project_gaussians
    from gaussiansplat_tpu.render import render
    from gaussiansplat_tpu.train.loss import l1, photometric_loss, ssim

    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--sh-degree", type=int, default=3)
    ap.add_argument("--pairs-per-gaussian", type=float, default=3.25)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    cfg = RasterConfig(pairs_per_gaussian=args.pairs_per_gaussian)
    impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    sh = args.sh_degree
    model = random_model(jax.random.PRNGKey(0), args.n, sh_degree=sh,
                         extent=1.0, opacity=0.8, scale_range=(0.004, 0.012))
    cam = look_at(eye=(0.0, 0.0, -4.0), target=(0, 0, 0),
                  fx=1600.0, fy=1600.0, width=args.width, height=args.height)
    bg = jnp.zeros((3,), jnp.float32)
    target = jax.random.uniform(
        jax.random.PRNGKey(1), (args.height, args.width, 3))
    params = model.trainable()

    fetch = jax.jit(lambda o: jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.sum(jnp.ravel(x)[:64].astype(jnp.float32)),
        o, jnp.float32(0)))

    def timeit(f, *fargs):
        for _ in range(2):
            float(fetch(f(*fargs)))
        t0 = time.perf_counter()
        out = None
        for _ in range(args.iters):
            out = f(*fargs)
        float(fetch(out))
        return (time.perf_counter() - t0) / args.iters

    project = jax.jit(lambda m: project_gaussians(
        m.means, m.quats, m.log_scales, m.logit_opacities, m.sh, cam, cfg,
        sh_degree=sh, alive=m.alive))
    proj = jax.block_until_ready(project(model))
    binjit = jax.jit(
        lambda p: bin_gaussians(p, cam.width, cam.height, cfg, impl=impl))

    fwd = jax.jit(lambda p: render(
        model.with_params(p), cam, cfg, sh_degree=sh, background=bg,
        impl=impl).image)

    def make_step(loss_kind):
        def loss_fn(p):
            img = render(model.with_params(p), cam, cfg, sh_degree=sh,
                         background=bg, impl=impl).image
            if loss_kind == "sum":
                return jnp.sum(img * target)
            if loss_kind == "l1":
                return l1(img, target)
            return photometric_loss(img, target, 0.2)

        return jax.jit(lambda p: jax.value_and_grad(loss_fn)(p))

    img0 = jax.block_until_ready(fwd(params))
    ssim_grad = jax.jit(lambda a: jax.value_and_grad(
        lambda x: ssim(x, target))(a))

    rows = [
        ("project fwd", timeit(project, model)),
        ("bin+sort", timeit(binjit, proj)),
        ("render fwd", timeit(fwd, params)),
        ("step sum-loss", timeit(make_step("sum"), params)),
        ("step L1", timeit(make_step("l1"), params)),
        ("step L1+DSSIM", timeit(make_step("full"), params)),
        ("ssim fwd+grad", timeit(ssim_grad, img0)),
    ]
    print(f"backend={jax.default_backend()} impl={impl} n={args.n} "
          f"{args.width}x{args.height} sh{sh} ppg={args.pairs_per_gaussian}")
    for name, t in rows:
        print(f"  {name:>16}: {t * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
