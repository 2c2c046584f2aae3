"""Pallas TPU segment reduction for the payload-gather VJP.

The rasterizer's backward produces one 16-channel gradient row per (tile,
gaussian) pair; training needs them summed per gaussian. The reference does
this with `CUDA.@atomic` scatters (`splat.jl:353-380`) — nondeterministic and
unavailable on TPU. XLA's scatter-add costs ~110ns per index on TPU
(benchmarks/micro_sortgather.py: ~440ms for 4M pairs — half the train step),
so neither is acceptable.

Instead we exploit how pairs are *generated* (ops/binning.py): in pre-sort
order the pair list is partitioned into contiguous segments, one per
depth-rank, with boundaries `seg_offsets`. After un-permuting pair gradients
back to pre-sort order (a cheap sort + gather — see binning.scatter_pair_grads),
the reduction is a contiguous segment sum, which this kernel evaluates as an
MXU matmul: for a block of G consecutive ranks, the (C pairs x G ranks)
membership one-hot is built from two vector compares against the segment
boundary offsets, and `chunk (NCH, C) @ onehot (C, G)` accumulates every
channel of every rank at once. Deterministic (fixed reduction order), exact
(one-hot operand is exact in bf16, so HIGH-precision f32 passes lose
nothing), and ~100x cheaper than the XLA scatter.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import NBUF, NCH, NCH_PACKED, unpack_grad_chunk

# Ranks (gaussians) reduced per grid program, and pairs streamed per chunk.
# (Measured on hardware: doubling SEG_G to 1024 does not help — the kernel
# is stream-bound, not program-overhead-bound.)
SEG_G = 512
SEG_C = 512
# Lane-padded width of the per-block boundary window (needs G + 1 values).
SEG_WIN = SEG_G + 128


def _segreduce_kernel(
    # scalar prefetch
    off_blocks_ref,    # (NB + 1,) i32 SMEM: pair range per rank block
    # inputs
    dpre_ref,          # (NCH, Ppad) f32 HBM: pair grads in PRE-SORT order
    off_win_ref,       # (1, WIN) i32 VMEM: seg_offsets[bG .. bG+G] window
    # output
    out_ref,           # (NCH, G) f32 VMEM: per-rank sums for this block
    # scratch
    chunk_buf,         # (NBUF, NCH or NCH_PACKED, C) f32 VMEM ring
    sems,              # (NBUF,) DMA semaphores
    *,
    packed: bool,
    seg_c: int,
    seg_g: int,
    ablate: str = "",
):
    # `ablate` compiles reduced variants for the grad-reduce decomposition
    # (benchmarks/micro_segreduce.py --ablate; VERDICT r4 item 2). Variants:
    #   constoh — one-hot replaced by a loop-invariant constant (prices the
    #             per-chunk membership build; WRONG VALUES, timing only)
    #   split1  — hi-only bf16 pass (prices the 3-way split; lossy values)
    #   stacked — alias of the default since the stacked single-matmul form
    #             was promoted to production (r5; kept so older sweeps run)
    #   nounpack — skip the bf16 lane unpack (prices it; wrong values)
    #   dmaonly  — stream-only floor: no unpack/one-hot/matmul (wrong values)
    assert ablate in ("", "constoh", "split1", "stacked", "nounpack",
                      "dmaonly")
    b = pl.program_id(0)
    c = seg_c

    s = off_blocks_ref[b]
    e = off_blocks_ref[b + 1]
    base = pl.multiple_of((s // c) * c, c)
    n_chunks = (e - base + c - 1) // c

    lo = off_win_ref[:, 0:seg_g]                     # (1, G) segment starts
    hi = off_win_ref[:, 1 : seg_g + 1]               # (1, G) segment ends

    def chunk_dma(slot, ci):
        return pltpu.make_async_copy(
            dpre_ref.at[:, pl.ds(pl.multiple_of(base + ci * c, c), c)],
            chunk_buf.at[slot],
            sems.at[slot],
        )

    for o in range(NBUF - 1):
        @pl.when(o < n_chunks)
        def _(o=o):
            chunk_dma(o, o).start()

    def body(ci, acc):
        nxt = ci + NBUF - 1
        @pl.when(nxt < n_chunks)
        def _():
            chunk_dma(nxt % NBUF, nxt).start()

        chunk_dma(ci % NBUF, ci).wait()
        chunk = chunk_buf[ci % NBUF]                 # (NCH or NCH_PACKED, C)
        if ablate == "dmaonly":
            pad_r = jnp.zeros((NCH - chunk.shape[0], c), jnp.float32)
            padded = jnp.concatenate([chunk, pad_r], axis=0)
            return acc + padded[:, :seg_g] * 1e-30
        if packed and ablate != "nounpack":
            chunk = unpack_grad_chunk(chunk)         # (NCH, C)
        elif packed:
            pad_r = jnp.zeros((NCH - chunk.shape[0], c), jnp.float32)
            chunk = jnp.concatenate([chunk, pad_r], axis=0)

        # Membership one-hot from the segment boundaries: pair p belongs to
        # rank r iff off[r] <= p < off[r+1]. Pairs outside this block's rank
        # range fail every interval test, so shared boundary chunks are
        # counted exactly once across adjacent programs.
        if ablate == "constoh":
            onehot = (jax.lax.broadcasted_iota(jnp.int32, (c, seg_g), 0)
                      == jax.lax.broadcasted_iota(
                          jnp.int32, (c, seg_g), 1)).astype(jnp.float32)
        else:
            pg = (jax.lax.broadcasted_iota(jnp.int32, (c, 1), 0)
                  + (base + ci * c))
            onehot = ((pg >= lo) & (pg < hi)).astype(jnp.float32)  # (C, G)

        # The one-hot operand is exact in bf16, so splitting only the chunk
        # suffices; a THREE-way split (hi/mid/lo) reconstructs the full ~24
        # mantissa bits — gradient sums stay f32-exact per element — at half
        # HIGHEST's 6-pass cost. (A 2-way split leaves ~2^-16 per-element
        # quantization, which tests/test_gather_vjp.py's 1e-6 bound catches.)
        # Production form (measured on chip, micro_segreduce r5): the three
        # split operands STACK along the row axis into ONE matmul, so the
        # MXU loads the (C, G) one-hot weights once instead of three times
        # (50.8 -> 47.1 ms at 3M); and in packed mode only rows 0..7 carry
        # inexact f32 (rows 8+ are exact-bf16 colors/depth/zeros from
        # unpack_grad_chunk, whose mid/lo splits are structurally zero), so
        # the mid/lo blocks shrink to 8 rows. Both changes are value-exact:
        # the row-block sums below reproduce the hi + (mid + lo) grouping.
        nch = chunk.shape[0]
        c_hi = chunk.astype(jnp.bfloat16)
        oh16 = onehot.astype(jnp.bfloat16)

        def d(x):
            return jax.lax.dot_general(
                x, oh16,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        if ablate == "split1":
            return acc + d(c_hi)
        nsplit = 8 if packed else nch
        rsub = chunk[:nsplit] - c_hi[:nsplit].astype(jnp.float32)
        c_mid = rsub.astype(jnp.bfloat16)
        c_lo = (rsub - c_mid.astype(jnp.float32)).astype(jnp.bfloat16)
        s = jax.lax.dot_general(
            jnp.concatenate([c_hi, c_mid, c_lo], axis=0), oh16,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        tail = s[nch:nch + nsplit] + s[nch + nsplit:]
        if nsplit < nch:
            tail = jnp.concatenate(
                [tail, jnp.zeros((nch - nsplit, seg_g), jnp.float32)], axis=0)
        return acc + (s[:nch] + tail)

    acc = jax.lax.fori_loop(
        0, n_chunks, body, jnp.zeros((NCH, seg_g), jnp.float32)
    )
    out_ref[...] = acc


def segment_reduce_pairs(
    dpre_t: jax.Array,        # (NCH or NCH_PACKED, P) f32, pre-sort order
    seg_offsets: jax.Array,   # (N + 1,) i32 segment starts (last = num_pairs)
    n: int,
    interpret: bool = False,
    packed: bool = False,
    seg_c: int = SEG_C,
    seg_g: int = SEG_G,
    ablate: str = "",
) -> jax.Array:
    """Sum 16-channel pair gradients per depth rank (unpacking bf16-packed
    color/depth lanes inline when `packed`). Returns (n, NCH).

    Columns past the last valid pair (>= num_pairs) must be zero; the
    seg_c-dependent tail padding (aligned chunk windows poke up to seg_c - 1
    columns past the end) is applied HERE, so tuning seg_c never needs a
    matching change at call sites. seg_c/seg_g are block-size tuning knobs
    (benchmarks/micro_segreduce.py); defaults are the measured-best
    production values."""
    nch_in = NCH_PACKED if packed else NCH
    assert dpre_t.shape[0] == nch_in
    dpre_t = jnp.concatenate(
        [dpre_t, jnp.zeros((nch_in, seg_c), dpre_t.dtype)], axis=1
    )
    seg_win = seg_g + 128
    nb = -(-n // seg_g)
    ranks = jnp.minimum(
        jnp.arange(nb + 1, dtype=jnp.int32) * seg_g, n
    )
    off_blocks = seg_offsets[ranks]
    win = jnp.minimum(
        jnp.arange(nb, dtype=jnp.int32)[:, None] * seg_g
        + jnp.arange(seg_win, dtype=jnp.int32)[None, :],
        n,
    )
    # (NB, 1, WIN): the singleton axis keeps the trailing block dims equal to
    # the array dims, which the Mosaic block-shape rules require here.
    off_win = seg_offsets[win][:, None, :]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, seg_win), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, NCH, seg_g), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((NBUF, nch_in, seg_c), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
    )

    def squeeze_kernel(off_ref, dpre_ref, win_ref, out_ref, chunk_buf, sems):
        _segreduce_kernel(off_ref, dpre_ref, win_ref.at[0], out_ref.at[0],
                          chunk_buf, sems, packed=packed,
                          seg_c=seg_c, seg_g=seg_g, ablate=ablate)

    out = pl.pallas_call(
        squeeze_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, NCH, seg_g), jnp.float32),
        interpret=interpret,
    )(off_blocks, dpre_t, off_win)
    return out.transpose(0, 2, 1).reshape(nb * seg_g, NCH)[:n]
