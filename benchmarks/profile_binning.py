"""Fine-grained profile of the binning + gradient-plumbing stages.

The coarse breakdown (benchmarks/profile_step.py) shows WHERE the step time
splits across project/bin/render/loss; this one isolates the individual
sorts, gathers, the Pallas expand kernel, and the backward un-permute +
segment-reduce at bench shapes — the N-proportional vs P-proportional
decomposition needed to explain the per-ray throughput falloff from 1M to
8M gaussians (VERDICT r3 item 1).

Each isolated sort is timed on the REAL operand arrays produced by the same
code path bin_gaussians runs, so key distributions match production.

    python benchmarks/profile_binning.py --n 1000000 --ppg 2.7 \
        --out benchmarks/profile_binning_1m_r4.json
"""

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

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
    from gaussiansplat_tpu.ops import binning as B
    from gaussiansplat_tpu.ops.projection import make_payload, project_gaussians

    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--ppg", type=float, default=2.7)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    cfg = RasterConfig(pairs_per_gaussian=args.ppg)
    impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    n = args.n
    # Scene identical to bench.py so pair counts match the bench artifacts.
    fx = 1600.0 * args.width / 1920.0
    k = (1600.0 / fx) * ((args.width * args.height / n) / 2.0736) ** 0.5
    model = random_model(jax.random.PRNGKey(0), n, sh_degree=3, extent=1.0,
                         opacity=0.8, scale_range=(0.004 * k, 0.012 * k))
    cam = look_at(eye=(0.0, 0.0, -4.0), target=(0, 0, 0), fx=fx, fy=fx,
                  width=args.width, height=args.height)

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
        sh_degree=3, alive=m.alive))
    proj = jax.block_until_ready(project(model))

    # ---- reproduce bin_gaussians' intermediates (same helpers, same values)
    tiles_x, tiles_y = B.tile_grid(cam.width, cam.height, cfg.tile_size)
    num_tiles = tiles_x * tiles_y
    capacity = cfg.pair_capacity(n)
    mean2d = jax.lax.stop_gradient(proj.mean2d)
    depth = jax.lax.stop_gradient(proj.depth)

    @jax.jit
    def pre_sort_fields(proj):
        xmin, ymin, xmax, ymax = B.tile_ranges(
            mean2d, proj.radius_xy, cfg.tile_size, tiles_x, tiles_y)
        tw = xmax - xmin
        th = ymax - ymin
        counts = jnp.minimum(tw * th, cfg.max_tiles_per_gaussian)
        counts = jnp.where(proj.valid, counts, 0)
        mask = B._tile_survivor_mask(
            mean2d, jax.lax.stop_gradient(proj.conic),
            jax.lax.stop_gradient(proj.opacity),
            xmin, ymin, tw, th, jnp.int32(0),
            cfg.tile_size, cfg.sigma_radius, cfg.alpha_min)
        maskable = (counts > 0) & (tw * th <= B.MASK_TILES)
        surv = jax.lax.population_count(mask)
        counts = jnp.where(
            maskable, jnp.minimum(surv, cfg.max_tiles_per_gaussian), counts)
        mask = jnp.where(maskable, mask, 0)
        by = max(int(tiles_y).bit_length(), 1)
        bw = max(int(tiles_x).bit_length(), 1)
        bh = by
        rect = ((((xmin << by) | ymin) << bw) | tw) << bh | th
        rect = jnp.where(counts > 0, rect, 0)
        return counts, rect, mask

    by = max(int(tiles_y).bit_length(), 1)
    bw = max(int(tiles_x).bit_length(), 1)
    bh = by
    counts, rect, mask = jax.block_until_ready(pre_sort_fields(proj))
    iota_n = jnp.arange(n, dtype=jnp.int32)

    # Current production compaction sort: 5 operands, 3 keys.
    comp5 = jax.jit(lambda c, d, r, m: jax.lax.sort(
        ((c == 0).astype(jnp.int32), d, iota_n, r, m), num_keys=3))
    # Candidate: fold the empty flag into the depth key (+inf tail), 4 ops.
    comp4 = jax.jit(lambda c, d, r, m: jax.lax.sort(
        (jnp.where(c > 0, d, jnp.inf), iota_n, r, m), num_keys=2))

    _, _, comp_order, rect_c, mask_c = jax.block_until_ready(
        comp5(counts, depth, rect, mask))
    th_c = rect_c & ((1 << bh) - 1)
    tw_c = (rect_c >> bh) & ((1 << bw) - 1)
    counts_dense = jnp.minimum(tw_c * th_c, cfg.max_tiles_per_gaussian)
    counts_c = jnp.where(
        mask_c != 0,
        jnp.minimum(jax.lax.population_count(mask_c),
                    cfg.max_tiles_per_gaussian),
        counts_dense)
    offsets = jnp.cumsum(counts_c) - counts_c
    total = offsets[-1] + counts_c[-1]
    off_c = jnp.minimum(offsets, capacity).astype(jnp.int32)
    num_pairs = jnp.minimum(total, capacity).astype(jnp.int32)
    pos = jnp.arange(capacity, dtype=jnp.int32)

    tile_bits = max(int(num_tiles + 1).bit_length(), 1)
    rank_bits = max(int(n - 1).bit_length(), 1) if n > 1 else 1
    packed_keys = tile_bits + rank_bits <= 31

    rows = [
        ("project", timeit(project, model), "N"),
        ("ranges+mask", timeit(pre_sort_fields, proj), "N"),
        ("comp_sort 5op/3key (pre-r4)",
         timeit(comp5, counts, depth, rect, mask), "N"),
        ("comp_sort 4op/2key (prod since r4)",
         timeit(comp4, counts, depth, rect, mask), "N"),
    ]

    expand_t = None
    if impl == "pallas":
        from gaussiansplat_tpu.ops.pallas.expand import expand_pairs_pallas
        expand = jax.jit(lambda o, r, m, np_: expand_pairs_pallas(
            o, r, m, np_, capacity, tiles_x, num_tiles, rank_bits,
            (by, bw, bh), interpret=False, packed=packed_keys))
        out = jax.block_until_ready(expand(off_c, rect_c, mask_c, num_pairs))
        expand_t = timeit(expand, off_c, rect_c, mask_c, num_pairs)
        rows.append(("expand (pallas)", expand_t, "P"))
        if packed_keys:
            key = out
            pair_sort = jax.jit(
                lambda kk: jax.lax.sort((kk, pos), num_keys=1))
            sorted_key, sorted_pos = jax.block_until_ready(pair_sort(key))
            rows.append(("pair_sort 2op/1key packed",
                         timeit(pair_sort, key), "P"))
            sorted_tiles = (sorted_key >> rank_bits).astype(jnp.int32)
        else:
            tile_s, rank_s = out
            pair_sort = jax.jit(lambda t, r: jax.lax.sort(
                (t, r, pos), num_keys=1, is_stable=True))
            sorted_tiles, _, sorted_pos = jax.block_until_ready(
                pair_sort(tile_s, rank_s))
            rows.append(("pair_sort 3op stable (pre-r4)",
                         timeit(pair_sort, tile_s, rank_s), "P"))
            pair_sort2 = jax.jit(lambda t, r: jax.lax.sort(
                (t, r, pos), num_keys=2, is_stable=False))
            rows.append(("pair_sort 3op/2key nonstable (prod since r4)",
                         timeit(pair_sort2, tile_s, rank_s), "P"))
    else:
        sorted_pos = pos
        sorted_tiles = jnp.zeros((capacity,), jnp.int32)

    finish = jax.jit(lambda st: jnp.searchsorted(
        st, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"))
    rows.append(("searchsorted", timeit(finish, sorted_tiles), "T"))

    # ---- full binning + payload gather on the production path
    binjit = jax.jit(
        lambda p: B.bin_gaussians(p, cam.width, cam.height, cfg, impl=impl))
    b = jax.block_until_ready(binjit(proj))
    rows.append(("bin_gaussians total", timeit(binjit, proj), "N+P"))
    payload = jax.jit(make_payload)(proj)
    gfwd = jax.jit(lambda p, bb: bb.gather_payload(p, impl=impl))
    jax.block_until_ready(gfwd(payload, b))
    rows.append(("gather_payload fwd (16-ch API)",
                 timeit(gfwd, payload, b), "N+P"))
    # PRODUCTION form: the packed rasterizer's 8-lane row-gather chain
    # (pack + depth reorder + pair gather + transpose) — what bench.py's
    # gather_pack stage times; the 16-ch row above is the public API only.
    from gaussiansplat_tpu.ops.pallas.common import pack_payload_rows

    gpack = jax.jit(lambda p, dor, sr: jax.lax.optimization_barrier(
        pack_payload_rows(p))[dor][sr].T)
    jax.block_until_ready(gpack(payload, b.depth_order, b.sorted_ranks))
    rows.append(("gather packed 8-lane (prod)",
                 timeit(gpack, payload, b.depth_order, b.sorted_ranks),
                 "N+P"))

    # ---- backward plumbing, isolated on realistic shapes
    if impl == "pallas":
        from gaussiansplat_tpu.ops.pallas.segreduce import segment_reduce_pairs

        key8 = jax.random.PRNGKey(7)
        d8 = jax.random.normal(key8, (8, capacity), jnp.float32)
        unperm = jax.jit(lambda sp, d: jax.lax.sort(
            (sp,) + tuple(d[i] for i in range(8)), num_keys=1))
        jax.block_until_ready(unperm(sorted_pos, d8))
        rows.append(("unpermute 9op/1key sort",
                     timeit(unperm, sorted_pos, d8), "P"))

        dpre_t = d8  # tail padding lives inside segment_reduce_pairs now
        seg_off = jnp.concatenate([off_c, num_pairs[None]])
        segr = jax.jit(lambda d: segment_reduce_pairs(
            d, seg_off, n, interpret=False, packed=True))
        jax.block_until_ready(segr(dpre_t))
        rows.append(("segreduce (pallas)", timeit(segr, dpre_t), "P"))

        dpay_rank = jnp.zeros((n, 16), jnp.float32) + 0.5
        rank_inv = jax.jit(lambda do, dp: dp[jax.lax.sort(
            (do, iota_n), num_keys=1)[1]])
        jax.block_until_ready(rank_inv(b.depth_order, dpay_rank))
        rows.append(("rank_of sort + (N,16) gather",
                     timeit(rank_inv, b.depth_order, dpay_rank), "N"))
        rank_sort_only = jax.jit(lambda do: jax.lax.sort(
            (do, iota_n), num_keys=1)[1])
        rows.append(("rank_of sort only",
                     timeit(rank_sort_only, b.depth_order), "N"))

    # ---- end-to-end gather VJP (un-permute + segreduce + rank_of + gather)
    @jax.jit
    def gvjp(p, bb):
        out, vjp = jax.vjp(lambda pp: bb.gather_payload(pp, impl=impl), p)
        return vjp(out * 0.5)[0]

    jax.block_until_ready(gvjp(payload, b))
    rows.append(("gather VJP total", timeit(gvjp, payload, b), "N+P"))

    np_meas = int(b.num_pairs)
    print(f"backend={jax.default_backend()} impl={impl} n={n} "
          f"{args.width}x{args.height} ppg={args.ppg} capacity={capacity} "
          f"pairs={np_meas} packed_keys={packed_keys} overflow={int(b.overflow)}")
    for name, t, ax in rows:
        print(f"  {name:>38}: {t * 1e3:8.2f} ms  [{ax}]")

    if args.out:
        rec = dict(
            n=n, width=args.width, height=args.height, ppg=args.ppg,
            capacity=capacity, num_pairs=np_meas, packed_keys=packed_keys,
            backend=jax.default_backend(), impl=impl,
            stages={name: t * 1e3 for name, t, _ in rows},
        )
        with open(args.out, "w") as f:
            json.dump(rec, f, indent=1)
            f.write("\n")


if __name__ == "__main__":
    main()
