"""Pallas TPU pair-expansion kernel for tile binning.

Turns the per-gaussian tile rectangles into the flat (tile, depth)-keyed pair
list that the rasterizer's sort consumes. The XLA formulation of this step
(ops/binning.py) needs three P-sized delta scatters plus three P-sized
cumsums plus a P-sized decode — ~60ms of a 1080p/1M-gaussian frame, twice
the fused raster kernel itself. The reference's equivalent is the dense
(tiles_x, tiles_y, N) hit bitmap + `CUDA.scan!` + compaction scatter
(`forward.jl:120-156`), which is both a data-dependent-shape allocation and
O(tiles * N) memory — neither survives contact with XLA.

Here each grid program emits one BP-pair block of sort keys:

  1. the owning-descriptor window for the block is found host-side with one
     tiny searchsorted over the compacted segment offsets (descriptors are
     depth-ordered and compacted to counts > 0, so the owners of BP
     consecutive pairs span at most BP + 1 consecutive descriptor rows);
  2. ownership is the interval one-hot `off[g] <= p < off[g+1]`, evaluated
     as a (BP, W) vector compare against the lane-major offset window;
  3. every per-pair field (tile rect, local segment offset, owner column)
     is extracted with ONE bf16 MXU matmul contracting the one-hot against
     an 8-row value matrix whose entries are <= 8-bit field splits — exact
     in bf16, and only the owner column of each pair row is nonzero, so
     out-of-range junk in non-owner columns cannot leak in. The depth rank
     itself is window-base + owner column: no rank row is even streamed;
  4. the packed (tile << rank_bits | rank) key is decoded with a few
     (1, BP) integer ops and written out; pairs past num_pairs get the
     sentinel key, so the subsequent single lax.sort drops them to the tail.
     When tile_bits + rank_bits > 31 (e.g. 1080p at >= 2M gaussians, the
     BASELINE config-3..5 regime) the kernel instead emits SEPARATE tile and
     rank streams for a stable tile-keyed 3-operand sort — the expansion
     stays on the fast path at every scale instead of falling back to the
     XLA delta-scatter formulation (the round-2 cliff: 3.6x worse per-ray
     at 3M gaussians).

The kernel reads 2 descriptor rows per window (4KB) behind a cross-grid-step
DMA ring and does ~400 cycles of VPU+MXU work per 256 pairs: ~10x faster
than the XLA expansion at 1M gaussians / 4M pairs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Pairs emitted per grid program, and the descriptor-window width. Owners of
# one block span <= BP + 1 compacted descriptor rows; with the 128-aligned
# window start that needs BP + 129 readable lanes, plus one more for the
# interval's upper bound -> W = BP + 256.
BP = 256
W = BP + 256
W1 = BP + 128  # columns actually tested for ownership
NBUF = 4       # cross-grid-step DMA ring depth


def _expand_kernel(
    # scalar prefetch
    g_blk_ref,      # (NB + NBUF,) i32 SMEM: first owning descriptor per block
    np_ref,         # (1,) i32 SMEM: num_pairs
    # inputs
    desc_ref,       # (4, Npad) i32 HBM: rows off / packed-rect / survivor-mask
                    # / zero padding (Mosaic tiles i32 VMEM at (4, 128) sublanes
                    # x lanes, so the windowed DMA below must slice a
                    # 4-sublane-aligned row count; a 3-row slice fails to
                    # compile on hardware)
    # outputs then scratch, in positional order:
    #   packed   -> key_ref (1, 1, BP) i32, desc_buf, sems
    #   unpacked -> tile_ref + rank_ref (1, 1, BP) i32 each, desc_buf, sems
    # where desc_buf is the (NBUF, 4, W) i32 VMEM ring and sems the (NBUF,)
    # DMA semaphores.
    *out_refs,
    nb: int,
    tiles_x: int,
    rank_bits: int,
    pack_bits: tuple,   # (by, bw, bh) bit widths of ymin/tw/th in the rect
    sentinel: int,
    packed: bool,
):
    # Split the scratch refs back out of the trailing varargs (outputs come
    # first, in out_shape order, then scratch_shapes order).
    if packed:
        key_ref, desc_buf, sems = out_refs
    else:
        tile_ref, rank_ref, desc_buf, sems = out_refs
    j = pl.program_id(0)

    def win_dma(slot, blk):
        g0 = pl.multiple_of((g_blk_ref[blk] // 128) * 128, 128)
        return pltpu.make_async_copy(
            desc_ref.at[:, pl.ds(g0, W)],
            desc_buf.at[slot],
            sems.at[slot],
        )

    @pl.when(j == 0)
    def _():
        for o in range(NBUF - 1):
            if o < nb:
                win_dma(o, o).start()

    nxt = j + NBUF - 1
    @pl.when(nxt < nb)
    def _():
        win_dma(nxt % NBUF, nxt).start()

    win_dma(j % NBUF, j).wait()
    win = desc_buf[j % NBUF]                     # (4, W) i32; row 3 is padding

    off = win[0:1, :]                            # (1, W) segment offsets
    rect = win[1:2, 0:W1]                        # (1, W1) packed tile rect
    maskd = win[2:3, 0:W1]                       # (1, W1) survivor bitmask

    by, bw, bh = pack_bits
    xm = (rect >> (by + bw + bh)).astype(jnp.float32)
    ym = ((rect >> (bw + bh)) & ((1 << by) - 1)).astype(jnp.float32)
    tw = ((rect >> bh) & ((1 << bw) - 1)).astype(jnp.float32)

    # Survivor mask split into four 8-bit rows (each <= 255, exact in bf16)
    # so the same one-hot MXU extraction carries it to pair space.
    m0 = (maskd & 255).astype(jnp.float32)
    m1 = ((maskd >> 8) & 255).astype(jnp.float32)
    m2 = ((maskd >> 16) & 255).astype(jnp.float32)
    m3 = ((maskd >> 24) & 255).astype(jnp.float32)

    # Owner-local offset, shifted non-negative and split into 7-bit halves so
    # both are exact in bf16 (owner offL <= BP + max_tiles_per_gaussian;
    # non-owner columns may exceed the split range — they are zeroed by the
    # one-hot, so only finiteness matters). The owner's window column s is
    # likewise split; the depth rank is then g0 + s in exact i32.
    off_l = off[:, 0:W1] - j * BP + 1024
    off_hi = (off_l >> 7).astype(jnp.float32)
    off_lo = (off_l & 127).astype(jnp.float32)
    s = jax.lax.broadcasted_iota(jnp.int32, (1, W1), 1)
    s_hi = (s >> 7).astype(jnp.float32)
    s_lo = (s & 127).astype(jnp.float32)
    one = jnp.ones((1, W1), jnp.float32)

    vals = jnp.concatenate(
        [xm, ym, tw, off_hi, off_lo, s_hi, s_lo, one, m0, m1, m2, m3], axis=0
    )                                            # (12, W1)

    # Interval-membership one-hot: pair p (sublane) belongs to window column
    # g iff off[g] <= p < off[g + 1]. Exactly one column fires per valid pair
    # (compacted offsets are strictly increasing until the capacity clip).
    p = jax.lax.broadcasted_iota(jnp.int32, (BP, 1), 0) + j * BP
    lo = off[:, 0:W1]
    hi = off[:, 1 : W1 + 1]
    onehot = ((p >= lo) & (p < hi)).astype(jnp.bfloat16)   # (BP, W1)

    out = jax.lax.dot_general(
        vals.astype(jnp.bfloat16), onehot,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                            # (12, BP)

    xm_p = out[0:1, :]
    ym_p = out[1:2, :]
    tw_p = jnp.maximum(out[2:3, :], 1.0)
    off_p = out[3:4, :] * 128.0 + out[4:5, :] - 1024.0
    s_p = (out[5:6, :] * 128.0 + out[6:7, :]).astype(jnp.int32)
    found = out[7:8, :] > 0.5
    mask_p = (
        out[8:9, :].astype(jnp.int32)
        | (out[9:10, :].astype(jnp.int32) << 8)
        | (out[10:11, :].astype(jnp.int32) << 16)
        | (out[11:12, :].astype(jnp.int32) << 24)
    )                                            # (1, BP) survivor bitmask

    k = (
        jax.lax.broadcasted_iota(jnp.int32, (1, BP), 1).astype(jnp.float32)
        - off_p
    )
    # Masked rects: pair k occupies the k-th SET BIT's rect-local slot
    # (mask 0 = dense rect, keep k). Bit indices <= 31 are exact in f32.
    k_i = k.astype(jnp.int32)
    cnt = jnp.zeros_like(k_i)
    sel = jnp.zeros_like(k_i)
    for bit in range(32):
        isset = (mask_p >> bit) & 1
        sel = jnp.where((cnt == k_i) & (isset == 1), bit, sel)
        cnt = cnt + isset
    k = jnp.where(mask_p == 0, k, sel.astype(jnp.float32))
    ky = jnp.floor(k / tw_p)
    kx = k - ky * tw_p
    tile = (ym_p + ky) * tiles_x + (xm_p + kx)

    g0 = (g_blk_ref[j] // 128) * 128
    rank = g0 + s_p
    p_lane = jax.lax.broadcasted_iota(jnp.int32, (1, BP), 1) + j * BP
    valid = found & (p_lane < np_ref[0])
    if packed:
        key = (tile.astype(jnp.int32) << rank_bits) | rank
        key_ref[0] = jnp.where(valid, key, sentinel)
    else:
        # Separate streams for the stable tile-keyed sort (sentinel tile
        # sorts invalid pairs to the tail; their rank lanes are garbage by
        # contract — TileBinning.sorted_ranks past num_pairs).
        tile_ref[0] = jnp.where(valid, tile.astype(jnp.int32), sentinel)
        rank_ref[0] = rank


def expand_pairs_pallas(
    off_clip: jax.Array,    # (N,) i32 compacted, capacity-clipped offsets
    packed_rect: jax.Array,  # (N,) i32 (xmin << .. | ymin << .. | tw << .. | th)
    mask: jax.Array,        # (N,) i32 survivor bitmask (0 = dense rect)
    num_pairs: jax.Array,   # () i32
    capacity: int,
    tiles_x: int,
    num_tiles: int,
    rank_bits: int,
    pack_bits: tuple,
    interpret: bool = False,
    packed: bool = True,
) -> jax.Array:
    """Emit the per-pair-slot sort streams.

    packed=True: one (capacity,) i32 array of (tile << rank_bits | rank)
    keys. packed=False (tile_bits + rank_bits > 31): a (tile, rank) tuple of
    (capacity,) i32 arrays for a stable tile-keyed sort carrying rank as a
    payload operand — pairs are emitted in depth-rank order, so a stable
    sort by tile alone reproduces the (tile, rank) lexicographic order."""
    n = off_clip.shape[0]
    nb = -(-capacity // BP)

    jstarts = jnp.arange(nb + NBUF, dtype=jnp.int32) * BP
    g_blk = (
        jnp.searchsorted(off_clip, jstarts, side="right").astype(jnp.int32) - 1
    )
    g_blk = jnp.clip(g_blk, 0, max(n - 1, 0))

    pad = jnp.full((W + 128,), capacity + 1, jnp.int32)
    zpad = jnp.zeros((W + 128,), jnp.int32)
    desc = jnp.stack(
        [
            jnp.concatenate([off_clip, pad]),
            jnp.concatenate([packed_rect, zpad]),
            jnp.concatenate([mask, zpad]),
            # Zero padding row: keeps the descriptor sublane count at 4 so the
            # kernel's windowed DMA slice is aligned to Mosaic's (4, 128) i32
            # tiling (a 3-row slice fails Mosaic compile on real TPUs).
            jnp.concatenate([jnp.zeros((n,), jnp.int32), zpad]),
        ]
    )

    kernel = functools.partial(
        _expand_kernel,
        nb=nb,
        tiles_x=tiles_x,
        rank_bits=rank_bits,
        pack_bits=pack_bits,
        sentinel=(num_tiles << rank_bits) if packed else num_tiles,
        packed=packed,
    )

    out_spec = pl.BlockSpec((1, 1, BP), lambda j, *_: (j, 0, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((nb, 1, BP), jnp.int32)
    n_out = 1 if packed else 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[out_spec] * n_out,
        scratch_shapes=[
            pltpu.VMEM((NBUF, 4, W), jnp.int32),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[out_shape] * n_out,
        interpret=interpret,
    )(g_blk, num_pairs[None], desc)
    if packed:
        return out[0].reshape(nb * BP)[:capacity]
    return (out[0].reshape(nb * BP)[:capacity],
            out[1].reshape(nb * BP)[:capacity])
