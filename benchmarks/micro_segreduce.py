"""Micro A/Bs for the backward gradient-plumbing stages (VERDICT r4 scale
work): segreduce block-size sweep + un-permute lowering alternatives, at the
config-3 shape (N=3M, P=6.3M) by default.

The 1M/3M stage profiles (benchmarks/profile_binning_*_r4.json) put the
un-permute 9-op sort + MXU segreduce + rank_of gather at ~55% of the
backward plumbing; segreduce runs ~150x above its byte floor, so block
sizing is the first knob to try.

    python benchmarks/micro_segreduce.py --n 3000000 --ppg 2.1
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
    from gaussiansplat_tpu.ops.pallas.segreduce import segment_reduce_pairs

    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=3_000_000)
    ap.add_argument("--ppg", type=float, default=2.1)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--quick", action="store_true",
                    help="only the production block shape + ablations "
                         "(skip the full sweep and gather micros)")
    ap.add_argument("--sweep", action="store_true",
                    help="force the full block-shape sweep even at shapes "
                         "where it was assumed settled (the 8M dmaonly "
                         "ablation showed the reduce goes per-chunk-fixed-"
                         "cost-bound there, which larger C amortizes)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    results = {}

    n = args.n
    p = int(n * args.ppg)
    key = jax.random.PRNGKey(0)
    # Realistic segment structure: ~ppg pairs per rank, uniform-ish.
    bounds = jnp.sort(jax.random.randint(key, (n - 1,), 0, p))
    seg_offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), bounds.astype(jnp.int32),
         jnp.full((1,), p, jnp.int32)])
    # Pack REAL gradient rows: raw random f32 in the packed lanes would
    # bitcast to NaN bf16 halves inside the kernel and poison comparisons.
    from gaussiansplat_tpu.ops.pallas.common import pack_grad_chunk

    d16 = jax.random.normal(jax.random.PRNGKey(1), (16, p), jnp.float32)
    d8 = jax.jit(pack_grad_chunk)(d16)
    del d16
    pos = jax.random.permutation(jax.random.PRNGKey(2),
                                 jnp.arange(p, dtype=jnp.int32))

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

    print(f"backend={jax.default_backend()} n={n} p={p}")

    # --- segreduce block-size sweep (G first: program-count hypothesis; a
    # config that yields wrong values on hardware is flagged, not fatal) ---
    ref = None
    # Block-shape search is settled (512/512 across r4+r5); at the 8M shape
    # only the floors matter, so the sweep collapses there too.
    sweep = [(512, 512)] if (not args.sweep and
                             (args.quick or n >= 6_000_000)) else [
        (512, 512), (512, 1024), (512, 2048),
        (1024, 512), (1024, 1024), (2048, 512),
        (512, 256), (512, 128), (256, 256)]
    for seg_c, seg_g in sweep:
        dpad = d8  # seg_c-dependent tail padding now lives inside the op
        try:
            f = jax.jit(lambda d, sc=seg_c, sg=seg_g: segment_reduce_pairs(
                d, seg_offsets, n, packed=True, seg_c=sc, seg_g=sg))
            out = jax.block_until_ready(f(dpad))
            if ref is None:
                ref = out
                status = "ref"
            else:
                err = float(jnp.max(jnp.abs(out - ref)))
                status = f"err={err:.2e}" + (
                    " CORRUPT" if not err < 1e-5 else "")
            t = timeit(f, dpad)
            results[f"segreduce_c{seg_c}_g{seg_g}_ms"] = round(t * 1e3, 2)
            print(f"  segreduce C={seg_c:5d} G={seg_g:5d}: {t * 1e3:8.2f} ms"
                  f"  [{status}]", flush=True)
        except Exception as e:
            print(f"  segreduce C={seg_c:5d} G={seg_g:5d}: FAILED {e!r:.120}",
                  flush=True)

    # --- segreduce internal decomposition (r5): what the 50 ms buys ---
    # constoh prices the per-chunk one-hot membership build (wrong values);
    # split1 prices the 3-way Dekker split (lossy); stacked is the exact
    # single-weight-load candidate (must match ref bitwise).
    for ab in ("constoh", "split1", "stacked", "nounpack", "dmaonly"):
        dpad = d8
        try:
            f = jax.jit(lambda d, a=ab: segment_reduce_pairs(
                d, seg_offsets, n, packed=True, ablate=a))
            out = jax.block_until_ready(f(dpad))
            err = float(jnp.max(jnp.abs(out - ref))) if ref is not None else -1
            t = timeit(f, dpad)
            results[f"segreduce_{ab}_ms"] = round(t * 1e3, 2)
            note = (f"err={err:.2e}" + (" MUST-MATCH" if ab == "stacked"
                                        and not err < 1e-6 else ""))
            print(f"  segreduce ablate={ab:8s}: {t * 1e3:8.2f} ms  [{note}]",
                  flush=True)
        except Exception as e:
            print(f"  segreduce ablate={ab:8s}: FAILED {e!r:.120}", flush=True)

    # --- un-permute lowerings (grads sorted order -> pre-sort order) ---
    sortcarry = jax.jit(lambda sp, d: jax.lax.sort(
        (sp,) + tuple(d[i] for i in range(8)), num_keys=1)[1:])
    t = timeit(sortcarry, pos, d8)
    print(f"  unpermute sort-carry 9op      : {t * 1e3:8.2f} ms")

    iota = jnp.arange(p, dtype=jnp.int32)
    invsort = jax.jit(lambda sp: jax.lax.sort((sp, iota), num_keys=1)[1])
    inv = jax.block_until_ready(invsort(pos))
    t = timeit(invsort, pos)
    print(f"  inverse-perm 2op sort         : {t * 1e3:8.2f} ms")

    d_rows = jnp.asarray(d8.T)  # (P, 8) row-major
    rowgather = jax.jit(lambda dr, ix: dr[ix])
    t = timeit(rowgather, d_rows, inv)
    print(f"  (P,8) row-major gather        : {t * 1e3:8.2f} ms")

    rowgather_t = jax.jit(lambda dr, ix: dr[ix].T)
    t = timeit(rowgather_t, d_rows, inv)
    print(f"  (P,8) row gather + transpose  : {t * 1e3:8.2f} ms")

    lanegather = jax.jit(lambda d, ix: d[:, ix])
    t = timeit(lanegather, d8, inv)
    print(f"  (8,P) lane-major gather       : {t * 1e3:8.2f} ms")

    # rank_of application alternatives: (N,16) random gather vs 17-op sort
    d16 = jax.random.normal(jax.random.PRNGKey(3), (n, 16), jnp.float32)
    perm = jax.random.permutation(jax.random.PRNGKey(4),
                                  jnp.arange(n, dtype=jnp.int32))
    g16 = jax.jit(lambda d, ix: d[ix])
    t = timeit(g16, d16, perm)
    print(f"  (N,16) row gather             : {t * 1e3:8.2f} ms")
    g8 = jax.jit(lambda d, ix: d[ix])
    d8n = jax.random.normal(jax.random.PRNGKey(5), (n, 8), jnp.float32)
    t = timeit(g8, d8n, perm)
    results["gather_n8_row_ms"] = round(t * 1e3, 2)
    print(f"  (N,8) row gather              : {t * 1e3:8.2f} ms")

    # Row-width sweep: TPU row gathers have a hard fast path at <= 8 f32
    # per row (~5.6 ns/row) and fall to ~13 ns/row at ANY width >= 9 —
    # the measurement behind the 8-lane packed reorder tables
    # (ops/pallas/common.pack_payload_rows, binning._gather_grad_rows).
    grow = jax.jit(lambda d, ix: d[ix])
    for wdt in (4, 8, 9, 12, 16):
        dw = jax.random.normal(jax.random.PRNGKey(6), (n, wdt), jnp.float32)
        t = timeit(grow, dw, perm)
        results[f"gather_n{wdt}_row_ms"] = round(t * 1e3, 2)
        print(f"  (N,{wdt:2d}) row gather             : {t * 1e3:8.2f} ms",
              flush=True)

    if args.out:
        import json

        with open(args.out, "w") as f:
            json.dump(dict(n=n, p=p, backend=jax.default_backend(),
                           **results), f, indent=1)
            f.write("\n")


if __name__ == "__main__":
    main()
