"""Microbenchmarks for the two forward hot spots outside the raster kernel:
the (tile,depth) pair sort and the P-sized payload gather. Compares layout
and operand-count variants to pick the fastest TPU lowering.

    python benchmarks/micro_sortgather.py --n 1000000 --p 4000000
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
    """Times f with a forced device->host scalar fetch per iteration (the
    remote-TPU platform's block_until_ready can return before single-op
    executables finish; fetching a reduced scalar cannot)."""
    fetch = jax.jit(lambda o: jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.sum(x.astype(jnp.float32)), o, jnp.float32(0)))
    for _ in range(warmup):
        float(fetch(f(*args)))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(fetch(f(*args)))
    dt = (time.perf_counter() - t0) / iters
    # Subtract the fetch-only floor measured on a tiny array.
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--p", type=int, default=4_000_000)
    args = ap.parse_args()
    n, p = args.n, args.p

    k0, k1, k2 = jax.random.split(jax.random.PRNGKey(0), 3)
    rank_bits = max(int(n - 1).bit_length(), 1)
    tiles = 2048
    tile_id = jax.random.randint(k0, (p,), 0, tiles, jnp.int32)
    ids_o = jax.random.randint(k1, (p,), 0, n, jnp.int32)
    key = (tile_id << rank_bits) | ids_o
    table = jax.random.normal(k2, (n, 16), jnp.float32)
    table_t = jnp.asarray(table.T)
    idx = ids_o

    # --- sorts ---
    sort2 = jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1))
    sort1 = jax.jit(lambda k: jax.lax.sort(k))
    sort1v = jax.jit(lambda k: jax.lax.sort((k,), num_keys=1))

    # --- gathers ---
    g_row = jax.jit(lambda t, i: t[i])                       # (N,16)[P] rows
    g_chan = jax.jit(lambda t, i: t[:, i])                   # (16,N)[:,P] lanes
    g_take = jax.jit(lambda t, i: jnp.take(t, i, axis=0, unique_indices=False,
                                           indices_are_sorted=False))
    g_chan_vmap = jax.jit(lambda t, i: jax.vmap(lambda row: row[i])(t))
    srt = jnp.sort(idx)
    g_sorted = jax.jit(lambda t, i: jnp.take(t, i, axis=0,
                                             indices_are_sorted=True))

    # --- scatter-add (the gather VJP) ---
    s_row = jax.jit(lambda d, i: jnp.zeros((n, 16), jnp.float32)
                    .at[i].add(d, mode="drop"))
    s_chan = jax.jit(lambda d, i: jnp.zeros((16, n), jnp.float32)
                     .at[:, i].add(d, mode="drop"))
    d_row = jax.random.normal(k2, (p, 16), jnp.float32)
    d_chan = jnp.asarray(d_row.T)
    seg_row = jax.jit(lambda d, i: jax.ops.segment_sum(
        d, i, num_segments=n, indices_are_sorted=True))

    # --- backward un-permute candidates (reduce_pair_grads_packed_t):
    # move 8 packed grad lanes from sorted order to pre-sort order given the
    # permutation sorted_pos. (a) carry lanes through one variadic sort
    # (current impl); (b) invert the permutation with a unique-indices
    # scatter then lane-gather; (c) invert with a 2-op sort then lane-gather.
    sorted_pos = jax.random.permutation(k0, p).astype(jnp.int32)
    grads8 = jax.random.normal(k1, (8, p), jnp.float32)
    iota_p = jnp.arange(p, dtype=jnp.int32)

    unperm_carry = jax.jit(lambda sp, g: jax.lax.sort(
        (sp,) + tuple(g[i] for i in range(8)), num_keys=1))

    def _unperm_scatter(sp, g):
        inv = jnp.zeros((p,), jnp.int32).at[sp].set(
            iota_p, mode="drop", unique_indices=True)
        return g[:, inv]

    unperm_scatter = jax.jit(_unperm_scatter)

    def _unperm_sortinv(sp, g):
        inv = jax.lax.sort((sp, iota_p), num_keys=1)[1]
        return g[:, inv]

    unperm_sortinv = jax.jit(_unperm_sortinv)

    null = jax.jit(lambda x: x + 1.0)
    tiny = jnp.zeros((8, 128), jnp.float32)
    rows = [
        ("null (round-trip floor)", lambda: timeit(null, tiny)),
        ("sort 2-operand (key,val)", lambda: timeit(sort2, key, ids_o)),
        ("sort 1-operand key only", lambda: timeit(sort1, key)),
        ("sort 1-op tuple", lambda: timeit(sort1v, key)),
        ("gather rows (N,16)[idx]", lambda: timeit(g_row, table, idx)),
        ("gather chan (16,N)[:,idx]", lambda: timeit(g_chan, table_t, idx)),
        ("gather take axis0", lambda: timeit(g_take, table, idx)),
        ("gather chan vmap", lambda: timeit(g_chan_vmap, table_t, idx)),
        ("gather rows SORTED idx", lambda: timeit(g_sorted, table, srt)),
        ("scatter-add rows", lambda: timeit(s_row, d_row, idx)),
        ("scatter-add chan", lambda: timeit(s_chan, d_chan, idx)),
        ("segment_sum sorted idx", lambda: timeit(seg_row, d_row, srt)),
        ("unpermute carry-sort 9op", lambda: timeit(unperm_carry,
                                                    sorted_pos, grads8)),
        ("unpermute scatter+gather", lambda: timeit(unperm_scatter,
                                                    sorted_pos, grads8)),
        ("unpermute sortinv+gather", lambda: timeit(unperm_sortinv,
                                                    sorted_pos, grads8)),
    ]
    print(f"backend={jax.default_backend()} n={n} p={p}")
    for name, f in rows:
        try:
            t = f()
            print(f"  {name:>28}: {t * 1e3:8.2f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"  {name:>28}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
