"""Per-stage timing of the BACKWARD pass: raster bwd kernel, gather VJP
(scatter-add), projection VJP, and the full fwd+bwd step — to locate where
the gradient-step time goes beyond the forward stages.

    python benchmarks/profile_bwd.py --n 1000000 --width 1920 --height 1080
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
    from gaussiansplat_tpu.render import render
    from gaussiansplat_tpu.train.loss import photometric_loss

    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--sh-degree", type=int, default=3)
    ap.add_argument("--pairs-per-gaussian", type=float, default=4.0)
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

    # --- stage pieces ---
    project = jax.jit(lambda m: project_gaussians(
        m.means, m.quats, m.log_scales, m.logit_opacities, m.sh, cam, cfg,
        sh_degree=sh, alive=m.alive))
    proj = jax.block_until_ready(project(model))
    binning = jax.block_until_ready(
        jax.jit(lambda p: bin_gaussians(p, cam.width, cam.height, cfg))(proj))
    payload = jax.jit(make_payload)(proj)
    sorted_payload = jax.block_until_ready(
        jax.jit(lambda p, b: b.gather_payload(p))(payload, binning))

    # 1. raster fwd+bwd through the custom_vjp (isolates kernels + residuals)
    if impl == "pallas":
        from gaussiansplat_tpu.ops.pallas.rasterize import rasterize_tiles_pallas
        raster_fn = rasterize_tiles_pallas
    else:
        from gaussiansplat_tpu.ops.tile_raster import rasterize_tiles_xla
        raster_fn = rasterize_tiles_xla

    @jax.jit
    def raster_fwd(sp, ts):
        return raster_fn(sp, ts, bg, cam.width, cam.height, cfg).image

    @jax.jit
    def raster_grad(sp, ts):
        def f(sp):
            img = raster_fn(sp, ts, bg, cam.width, cam.height, cfg).image
            return jnp.sum(img * target)
        return jax.grad(f)(sp)

    # 2. gather VJP alone: scatter-add (P,16) -> (N,16)
    dsorted = jax.block_until_ready(
        raster_grad(sorted_payload, binning.tile_starts))

    @jax.jit
    def gather_vjp(ds, b):
        _, vjp = jax.vjp(b.gather_payload, payload)
        return vjp(ds)[0]

    # 3. projection (+payload) VJP alone
    @jax.jit
    def proj_grad(p, dpay):
        def f(p):
            m = model.with_params(p)
            pr = project_gaussians(
                m.means, m.quats, m.log_scales, m.logit_opacities, m.sh, cam,
                cfg, sh_degree=sh, alive=m.alive)
            return jnp.vdot(make_payload(pr), dpay)
        return jax.grad(f)(p)

    dpay = jax.block_until_ready(gather_vjp(dsorted, binning))

    # 4. full step
    @jax.jit
    def fwd(p):
        m = model.with_params(p)
        return render(m, cam, cfg, sh_degree=sh, background=bg,
                      impl=impl).image

    @jax.jit
    def fwd_bwd(p):
        def loss_fn(p):
            m = model.with_params(p)
            out = render(m, cam, cfg, sh_degree=sh, background=bg, impl=impl)
            return photometric_loss(out.image, target, 0.2)
        return jax.value_and_grad(loss_fn)(p)

    print(f"backend={jax.default_backend()} impl={impl} n={args.n} "
          f"{args.width}x{args.height} pairs={int(binning.num_pairs)} "
          f"capacity={binning.capacity}", flush=True)

    def report(name, t):
        print(f"  {name:>22}: {t * 1e3:8.2f} ms", flush=True)

    t_rf = timeit(raster_fwd, sorted_payload, binning.tile_starts)
    report("raster fwd", t_rf)
    t_rg = timeit(raster_grad, sorted_payload, binning.tile_starts)
    report("raster fwd+bwd", t_rg)
    report("raster bwd (diff)", t_rg - t_rf)
    t_gv = timeit(gather_vjp, dsorted, binning)
    report("gather VJP (scatter)", t_gv)
    t_pg = timeit(proj_grad, params, dpay)
    report("projection VJP", t_pg)
    t_f = timeit(fwd, params)
    report("full fwd", t_f)
    t_fb = timeit(fwd_bwd, params)
    report("full fwd+bwd", t_fb)
    report("full bwd (diff)", t_fb - t_f)


if __name__ == "__main__":
    main()
