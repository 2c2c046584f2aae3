"""Backward-kernel speed-of-light decomposition (VERDICT r4 item 1b).

The backward raster kernel is the largest isolated stage at every bench
config, and round 4 left its 40-60% pass-model gap unexplained (read-latency
ruled out by the NBUF=8 A/B). This bench prices the kernel's cost components
DIRECTLY by timing compiled ablation variants of the real kernel
(ops/pallas/backward.py `ablate=`):

    dmaonly   read ring + zero writes, no compute     -> stream floor
    nograd    + forward recompute (alpha/exp/tri)     -> recompute cost
    nogeom    full minus geometry-grad chain          -> moment+conic cost
    nodirect  full minus direct-channel matmul        -> ddirect cost
    nopack    full minus bf16 grad repack             -> pack cost
    nowrite   full minus per-chunk HBM writes         -> write-path cost
    full      production kernel

Each variant is the same Mosaic program shape (same grid, same DMA rings)
minus one component, so differences are attributable. Run on the real chip:

    python benchmarks/profile_bwd_ablate.py --config 1080p3m \
        --out benchmarks/bwd_ablate_3m_r5.json
"""

import argparse
import json
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

CONFIGS = {  # mirrors bench.py
    "1080p1m": (1920, 1080, 1_000_000, 2.6),
    "1080p3m": (1920, 1080, 3_000_000, 1.9),
    "4k4m": (3840, 2160, 4_000_000, 2.6),
    "1080p8m": (1920, 1080, 8_000_000, 1.6),
}

VARIANTS = ("dmaonly", "nograd", "nogeom", "nodirect", "nopack", "nowrite",
            "")


def main():
    from gaussiansplat_tpu.config import RasterConfig
    from gaussiansplat_tpu.models import random_model
    from gaussiansplat_tpu.ops import look_at
    from gaussiansplat_tpu.ops.binning import bin_gaussians
    from gaussiansplat_tpu.ops.pallas.backward import rasterize_backward
    from gaussiansplat_tpu.ops.pallas.common import (
        NCH_PACKED, OUT_STOP, pack_payload_rows)
    from gaussiansplat_tpu.ops.pallas.forward import rasterize_forward
    from gaussiansplat_tpu.ops.pallas.rasterize import _image_cotangents
    from gaussiansplat_tpu.ops.projection import make_payload, project_gaussians

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", choices=sorted(CONFIGS), default="1080p3m")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    w, h, n, ppg = CONFIGS[args.config]

    cfg = RasterConfig(pairs_per_gaussian=ppg)
    ts, cs = cfg.tile_size, cfg.chunk_size
    sh = 3
    fx = 1600.0 * w / 1920.0
    k = (1600.0 / fx) * ((w * h / n) / 2.0736) ** 0.5
    model = random_model(jax.random.PRNGKey(0), n, sh_degree=sh, extent=1.0,
                         opacity=0.8, scale_range=(0.004 * k, 0.012 * k))
    cam = look_at(eye=(0.0, 0.0, -4.0), target=(0, 0, 0), fx=fx, fy=fx,
                  width=w, height=h)
    bg = jnp.zeros((3,), jnp.float32)

    proj = jax.jit(lambda m: project_gaussians(
        m.means, m.quats, m.log_scales, m.logit_opacities, m.sh, cam, cfg,
        sh_degree=sh, alive=m.alive))(model)
    b = jax.block_until_ready(jax.jit(
        lambda p: bin_gaussians(p, w, h, cfg, impl="pallas"))(proj))
    payload = jax.jit(make_payload)(proj)
    payload_t = jax.block_until_ready(jax.jit(
        lambda p, dor, sr: jnp.concatenate(
            [jax.lax.optimization_barrier(pack_payload_rows(p))[dor][sr].T,
             jnp.zeros((NCH_PACKED, cs), jnp.float32)], axis=1)
    )(payload, b.depth_order, b.sorted_ranks))

    out_tiles = jax.block_until_ready(jax.jit(
        lambda pt, tstarts: rasterize_forward(
            pt, tstarts, w, h, cfg, packed=True))(payload_t, b.tile_starts))
    stops = jnp.asarray(out_tiles[:, OUT_STOP, 0], jnp.int32)
    dimg = jax.random.normal(jax.random.PRNGKey(3), (h, w, 3)) * 1e-3
    cot_tiles = jax.block_until_ready(jax.jit(
        lambda di, ot: _image_cotangents(
            (di, jnp.zeros((h, w))), ot, bg, ts)[0])(dimg, out_tiles))

    fetch = jax.jit(lambda o: jnp.sum(jnp.ravel(o)[:64]))

    def timeit(f, *fargs):
        for _ in range(3):
            float(fetch(f(*fargs)))
        t0 = time.perf_counter()
        out = None
        for _ in range(args.iters):
            out = f(*fargs)
        float(fetch(out))
        return (time.perf_counter() - t0) / args.iters

    results = {}
    for v in VARIANTS:
        fkern = jax.jit(lambda pt, tst, st, ct, ft, vv=v: rasterize_backward(
            pt, tst, st, ct, ft, w, h, cfg, packed=True, ablate=vv))
        try:
            t = timeit(fkern, payload_t, b.tile_starts, stops, cot_tiles,
                       out_tiles)
            name = v or "full"
            results[name + "_ms"] = round(t * 1e3, 2)
            print(f"  {name:>9}: {t * 1e3:8.2f} ms", flush=True)
        except Exception as e:
            print(f"  {v or 'full':>9}: FAILED {e!r:.160}", flush=True)

    # Forward-kernel decomposition (same method): with the bench scene
    # early-exiting after ~1 chunk/tile, the per-TILE fixed costs (output
    # transpose + 32KB block store) rival the streamed compute — nowrite
    # prices them.
    fwd_results = {}
    for v in ("dmaonly", "noacc", "nowrite", ""):
        fk = jax.jit(lambda pt, tst, vv=v: rasterize_forward(
            pt, tst, w, h, cfg, packed=True, ablate=vv))
        try:
            t = timeit(fk, payload_t, b.tile_starts)
            name = v or "full"
            fwd_results[name + "_ms"] = round(t * 1e3, 2)
            print(f"  fwd {name:>9}: {t * 1e3:8.2f} ms", flush=True)
        except Exception as e:
            print(f"  fwd {v or 'full':>9}: FAILED {e!r:.160}", flush=True)

    full = results.get("full_ms")
    derived = {}
    if full is not None:
        for v, label in [("nogeom", "geom_chain"), ("nodirect", "direct"),
                         ("nopack", "pack"), ("nowrite", "write_path")]:
            if v + "_ms" in results:
                derived[label + "_ms"] = round(full - results[v + "_ms"], 2)
        if "nograd" in [k[:-3] for k in results]:
            derived["all_grad_math_ms"] = round(
                full - results["nograd_ms"], 2)
        if "dmaonly_ms" in results and "nograd_ms" in results:
            derived["recompute_ms"] = round(
                results["nograd_ms"] - results["dmaonly_ms"], 2)
            derived["stream_floor_ms"] = results["dmaonly_ms"]
    print("derived components:", json.dumps(derived), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(dict(config=args.config, n=n, width=w, height=h,
                           backend=jax.default_backend(),
                           variants=results, derived=derived,
                           fwd_variants=fwd_results), f, indent=1)
            f.write("\n")


if __name__ == "__main__":
    main()
