"""Benchmark harness: fwd+bwd rays(pixels)/sec/chip at 1080p.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md): its demonstrated config is
a single 512x512 forward-only frame on an unspecified GPU
(`examples/main.jl:9-34`), with no training step at all (the 3D backward
does not exist, `splat.jl:271-396` is 2D-only). `vs_baseline` therefore
compares against our own recorded first-round number when present
(benchmarks/baseline.json), else 1.0.
"""

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# First compile of the 1080p pipeline is minutes (remote-compiled via the
# chip tunnel); persist it so repeated bench runs are compile-free.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/gsplat_tpu_cache"),
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

# Headline config (BASELINE north star: 1080p, 1M gaussians, SH3).
# `--config` selects a named BASELINE shape; env overrides take precedence
# for custom sweeps, e.g. GSPLAT_BENCH_WIDTH=3840 GSPLAT_BENCH_HEIGHT=2160
# GSPLAT_BENCH_N=4000000.
# (width, height, n, pairs_per_gaussian budget). Every P-proportional cost
# (sorts, gathers, kernel streams) scales with the STATIC pair capacity, so
# each config's budget is its measured pairs/gaussian (benchmarks/
# bench_*_r3.json artifacts, under the exact-AABB rects + survivor cull)
# plus ~10-15% headroom; the overflow validity bit below catches a budget
# ever going stale.
CONFIGS = {
    "1080p1m": (1920, 1080, 1_000_000, 2.7),  # measured 2.44 pairs/gaussian
    "1080p3m": (1920, 1080, 3_000_000, 2.1),  # measured 1.79 (config-3 shape)
    "4k4m": (3840, 2160, 4_000_000, 2.9),     # BASELINE config 4
    # Single-chip memory ceiling: parallel/capacity.py puts the largest
    # trainable scene at ~8.19M gaussians on a 16 GiB chip at 1080p
    # (max_gaussians_per_chip); this config demonstrates it end to end.
    "1080p8m": (1920, 1080, 8_000_000, 1.8),
}

ap = argparse.ArgumentParser()
ap.add_argument("--config", choices=sorted(CONFIGS), default="1080p1m")
ap.add_argument("--out", default=None,
                help="also write the full validity-stamped record (timings, "
                     "overflow, max chunk count) to this JSON file")
ARGS, _ = ap.parse_known_args()

_W, _H, _N, _PPG = CONFIGS[ARGS.config]
WIDTH = int(os.environ.get("GSPLAT_BENCH_WIDTH", _W))
HEIGHT = int(os.environ.get("GSPLAT_BENCH_HEIGHT", _H))
N_GAUSSIANS = int(os.environ.get("GSPLAT_BENCH_N", _N))
PAIRS_BUDGET = float(os.environ.get("GSPLAT_BENCH_PAIRS", _PPG))
SH_DEGREE = 3
WARMUP = 3
ITERS = 10


def main():
    from gaussiansplat_tpu.config import RasterConfig
    from gaussiansplat_tpu.models import random_model
    from gaussiansplat_tpu.ops import look_at
    from gaussiansplat_tpu.render import render
    from gaussiansplat_tpu.train.loss import photometric_loss

    backend = jax.default_backend()
    cfg = RasterConfig(pairs_per_gaussian=PAIRS_BUDGET)

    # Scene scaled so splats land at realistic sizes (~1-3 tiles each) at
    # ANY config: focal scales with width (same framing), world gaussian
    # size scales so N splats tile the screen at constant per-splat pixel
    # area (s ~ sqrt(W*H/N)/fx).
    fx = 1600.0 * WIDTH / 1920.0
    k = (1600.0 / fx) * ((WIDTH * HEIGHT / N_GAUSSIANS) / 2.0736) ** 0.5
    model = random_model(
        jax.random.PRNGKey(0), N_GAUSSIANS, sh_degree=SH_DEGREE, extent=1.0,
        opacity=0.8, scale_range=(0.004 * k, 0.012 * k),
    )
    camera = look_at(
        eye=(0.0, 0.0, -4.0), target=(0.0, 0.0, 0.0), fx=fx, fy=fx,
        width=WIDTH, height=HEIGHT,
    )
    target = jax.random.uniform(jax.random.PRNGKey(1), (HEIGHT, WIDTH, 3))
    bg = jnp.zeros((3,), jnp.float32)
    params = model.trainable()

    impl = "pallas" if backend == "tpu" else "xla"

    # Guard the measurement's validity: dropped pairs would silently shrink
    # the measured work and inflate rays/s.
    @jax.jit
    def validity_bits(params):
        m = model.with_params(params)
        out = render(m, camera, cfg, sh_degree=SH_DEGREE, background=bg,
                     impl=impl)
        return out.overflow, out.num_pairs, out.max_chunks_needed

    n_overflow, n_pairs, max_chunks = map(int, validity_bits(params))
    if n_overflow:
        sys.stderr.write(
            f"[bench] WARNING: {n_overflow} pairs dropped — raise "
            f"pairs_per_gaussian; rays/s below is NOT trustworthy\n"
        )

    @jax.jit
    def fwd(params):
        m = model.with_params(params)
        return render(m, camera, cfg, sh_degree=SH_DEGREE, background=bg,
                      impl=impl).image

    @jax.jit
    def fwd_bwd(params):
        def loss_fn(p):
            m = model.with_params(p)
            out = render(m, camera, cfg, sh_degree=SH_DEGREE, background=bg,
                         impl=impl)
            return photometric_loss(out.image, target, 0.2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        return loss, grads

    # The remote-TPU platform's block_until_ready can return before the
    # executable actually finishes; a device->host scalar fetch cannot be
    # fabricated early. Launch all ITERS asynchronously (throughput
    # semantics: they queue on the one chip) and force ONE fetch at the end,
    # so the ~tens-of-ms tunnel round trip is amortized 1/ITERS instead of
    # inflating every iteration.
    fetch = jax.jit(lambda o: jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.sum(jnp.ravel(x)[:64].astype(jnp.float32)),
        o, jnp.float32(0)))

    def timeit(f, *args):
        for _ in range(WARMUP):
            float(fetch(f(*args)))
        t0 = time.perf_counter()
        out = None
        for _ in range(ITERS):
            out = f(*args)
        float(fetch(out))
        return (time.perf_counter() - t0) / ITERS

    t_fwd = timeit(fwd, params)
    t_step = timeit(fwd_bwd, params)

    rays = WIDTH * HEIGHT
    value = rays / t_step
    baseline_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "benchmarks", "baseline.json"
    )
    vs = 1.0
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f).get("rays_per_sec_fwd_bwd_1080p")
        if base:
            vs = value / base

    sys.stderr.write(
        f"[bench] backend={backend} impl={impl} n={N_GAUSSIANS} "
        f"fwd={t_fwd*1e3:.2f}ms fwd+bwd={t_step*1e3:.2f}ms "
        f"({rays/t_fwd/1e9:.3f} / {value/1e9:.3f} Grays/s)\n"
    )
    default_cfg = (WIDTH, HEIGHT, N_GAUSSIANS) == (1920, 1080, 1_000_000)
    metric = ("rays_per_sec_fwd_bwd_1080p" if default_cfg
              else f"rays_per_sec_fwd_bwd_{WIDTH}x{HEIGHT}_n{N_GAUSSIANS}")
    result = {
        "metric": metric,
        "value": value,
        "unit": "rays/s/chip",
        "vs_baseline": vs if default_cfg else 1.0,
    }
    if n_overflow:  # make an invalid (work-dropping) run machine-detectable
        result["overflow"] = n_overflow
    print(json.dumps(result))

    if ARGS.out:
        record = dict(
            result,
            config=ARGS.config,
            width=WIDTH, height=HEIGHT, n_gaussians=N_GAUSSIANS,
            sh_degree=SH_DEGREE, backend=backend, impl=impl,
            fwd_ms=t_fwd * 1e3, step_ms=t_step * 1e3,
            overflow=n_overflow, num_pairs=n_pairs,
            max_chunks_needed=max_chunks,
            pairs_per_gaussian_budget=cfg.pairs_per_gaussian,
        )
        with open(ARGS.out, "w") as f:
            json.dump(record, f, indent=1)
            f.write("\n")


if __name__ == "__main__":
    main()
