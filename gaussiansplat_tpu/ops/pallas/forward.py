"""Fused Pallas TPU forward tile rasterizer.

One grid program per pixel tile (the TPU grid is a sequential loop on the
TensorCore, so programs pipeline; there is no CUDA-style block concurrency to
manage). Each program:

  1. reads its [start, end) segment bounds from scalar-prefetched
     `tile_starts` (SMEM),
  2. streams the segment's payload in chunk_size-aligned (NCH, CS) blocks
     from HBM into a double-buffered VMEM scratch (async DMA overlapped with
     compute — the Pallas analogue of the reference's shared-memory staging
     at `splat.jl:207-213`),
  3. composites with the matmul formulation described in common.py, carrying
     (acc (PX, NCH), logT (PX, 1)) through a `while_loop` that early-exits
     once every pixel's transmittance is below `trans_eps` (the reference has
     no early termination — `splat.jl:224-261` walks the entire list),
  4. writes an (NOUT, PX) output block: RGB accumulators, log-transmittance,
     weight-sum (alpha image) and expected-depth rows, plus the number of
     chunks processed (consumed by the backward kernel's reverse sweep).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import RasterConfig
from ..binning import tile_grid
from .common import (
    CH_B,
    CH_DEPTH,
    CH_G,
    CH_ONE,
    CH_R,
    NBUF,
    NCH,
    NCH_PACKED,
    NOUT,
    chunk_alpha,
    dot_split2_exact_b,
    dot_split3,
    pixel_basis,
    tri_dot_split,
    tri_incl,
    unpack_payload_chunk,
)


def _fwd_kernel(
    # scalar prefetch
    tile_starts_ref,   # (T+1,) int32 in SMEM
    row0_ref,          # (1,) int32 in SMEM — first tile row of this strip
    # inputs
    payload_ref,       # (NCH, Ppad) f32 in HBM/ANY
    # outputs
    out_ref,           # (NOUT, PX) f32 VMEM block for this tile
    # scratch
    chunk_buf,         # (2, NCH, CS) f32 VMEM
    sems,              # (2,) DMA semaphores
    *,
    tile_size: int,
    chunk_size: int,
    tiles_x: int,
    alpha_min: float,
    alpha_max: float,
    sigma_sq: float,
    log_eps: float,
    packed: bool,
    ablate: str = "",
):
    # Timing-only reduced variants for the decomposition bench (see
    # backward.py; benchmarks/profile_bwd_ablate.py --fwd):
    #   dmaonly — read ring only, no compute (stream floor)
    #   noacc   — alpha + logT prefix only, no channel accumulation
    #   nowrite — full compute, but the (PX, NCH) -> (NOUT, PX) output
    #             transpose + block write replaced by a checksum row
    #             (prices the per-tile output relayout)
    assert ablate in ("", "dmaonly", "noacc", "nowrite")
    t = pl.program_id(0)
    cs = chunk_size
    px = tile_size * tile_size

    start = tile_starts_ref[t]
    end = tile_starts_ref[t + 1]
    # Aligned window start. The multiple_of hint is required on hardware:
    # Mosaic must prove HBM DMA slice offsets divisible by the lane tiling
    # (128) and cannot see through the //*cs round-down on its own.
    base = pl.multiple_of((start // cs) * cs, cs)
    n_chunks = (end - base + cs - 1) // cs

    # Half-tile shift pairs with the centered pixel_basis (exact-bf16 ints).
    # row0 offsets the tile row for tile-strip sharding: the grid (and t)
    # are strip-LOCAL, but payload means are in global pixel coordinates.
    ox = ((t % tiles_x) * tile_size + tile_size // 2).astype(jnp.float32)
    oy = ((t // tiles_x + row0_ref[0]) * tile_size
          + tile_size // 2).astype(jnp.float32)

    basis = pixel_basis(tile_size)     # (PX, 8)
    tri = tri_incl(cs)                 # (CS, CS)

    def chunk_dma(slot, ci):
        return pltpu.make_async_copy(
            payload_ref.at[:, pl.ds(pl.multiple_of(base + ci * cs, cs), cs)],
            chunk_buf.at[slot],
            sems.at[slot],
        )

    # NBUF-deep DMA ring: each 8-16KB chunk transfer is latency-bound, so two
    # slots (classic double buffering) leave the MXU waiting; keeping NBUF-1
    # transfers in flight hides the round trip behind several chunks of
    # compute.
    for o in range(NBUF - 1):
        @pl.when(o < n_chunks)
        def _(o=o):
            chunk_dma(o, o).start()

    def cond(carry):
        ci, acc, log_t, alive = carry
        return (ci < n_chunks) & alive

    def body(carry):
        ci, acc, log_t, alive = carry

        nxt = ci + NBUF - 1
        @pl.when(nxt < n_chunks)
        def _():
            chunk_dma(nxt % NBUF, nxt).start()

        chunk_dma(ci % NBUF, ci).wait()
        chunk = chunk_buf[ci % NBUF]   # (NCH or NCH_PACKED, CS)
        if ablate == "dmaonly":
            acc = acc + chunk[0, 0] * 1e-30
            return ci + 1, acc, log_t, alive
        if packed:
            chunk = unpack_payload_chunk(chunk)

        alpha, _, _ = chunk_alpha(
            basis, chunk, ox, oy, base + ci * cs, start, end,
            alpha_min, alpha_max, sigma_sq,
        )
        ell = jnp.log1p(-alpha)                                   # (PX, CS)
        s_incl = tri_dot_split(ell, tri)
        s_excl = s_incl - ell
        t_in = jnp.exp(s_excl + log_t)                            # (PX, CS)
        w = alpha * t_in
        # acc_c += sum_g w * payload[c, g] for every channel c at once. In
        # packed mode the consumed channel rows (colors/one/depth) are
        # bf16-exact, so only w needs the Dekker split (2 passes vs 3); the
        # inexact geometry columns of acc are never read.
        dims = (((1,), (1,)), ((), ()))
        if ablate == "noacc":
            acc = acc + jnp.sum(w, axis=1, keepdims=True) * 1e-30
        elif packed:
            acc = acc + dot_split2_exact_b(w, chunk, dims)
        else:
            acc = acc + dot_split3(w, chunk, dims)
        log_t = log_t + s_incl[:, cs - 1 : cs]
        alive = jnp.max(log_t) > log_eps
        return ci + 1, acc, log_t, alive

    init = (
        jnp.int32(0),
        jnp.zeros((px, NCH), jnp.float32),
        jnp.zeros((px, 1), jnp.float32),
        jnp.bool_(True),
    )
    ci, acc, log_t, _ = jax.lax.while_loop(cond, body, init)

    # Early exit leaves up to NBUF-1 chunk DMAs in flight (chunks
    # ci .. min(ci+NBUF-2, n_chunks-1) were started but never awaited). Drain
    # them, or the dangling semaphores corrupt the next grid step's waits.
    for o in range(NBUF - 1):
        @pl.when(ci + o < n_chunks)
        def _(o=o):
            chunk_dma((ci + o) % NBUF, ci + o).wait()

    if ablate == "nowrite":
        # Checksum write only (no (PX, NCH) -> (NOUT, PX) relayout): prices
        # the per-tile output transpose + block store.
        csum = (jnp.sum(acc, axis=0) + jnp.sum(log_t)
                + ci.astype(jnp.float32))           # (NCH,)
        out_ref[...] = jnp.zeros((NOUT, px), jnp.float32) + csum[:NOUT, None]
        return

    # The stop-chunk counter rides a spare row of the output block (Mosaic
    # rejects tiny scalar output blocks); exact as f32 for any real count.
    stop_row = jnp.full((px, 1), ci, jnp.float32)
    out8 = jnp.concatenate(
        [
            acc[:, CH_R : CH_R + 1],
            acc[:, CH_G : CH_G + 1],
            acc[:, CH_B : CH_B + 1],
            log_t,
            acc[:, CH_ONE : CH_ONE + 1],
            acc[:, CH_DEPTH : CH_DEPTH + 1],
            stop_row,
            jnp.zeros((px, NOUT - 7), jnp.float32),
        ],
        axis=1,
    )                                   # (PX, NOUT)
    out_ref[...] = out8.T               # (NOUT, PX)


def rasterize_forward(
    payload_t: jax.Array,      # (NCH or NCH_PACKED, Ppad) f32, (tile, depth) order
    tile_starts: jax.Array,    # (T+1,) int32
    width: int,
    height: int,
    cfg: RasterConfig,
    interpret: bool = False,
    packed: bool = False,
    tile_row0=None,            # dynamic first tile row (tile-sharded strips)
    tile_rows=None,            # static number of tile rows to render
    ablate: str = "",
):
    """Returns out_tiles (T, NOUT, PX); row OUT_STOP holds the per-tile\n    stop-chunk count (broadcast across the pixel row, exact in f32).\n    `ablate` selects timing-only reduced variants (see _fwd_kernel)."""
    import math

    tiles_x, tiles_y = tile_grid(width, height, cfg.tile_size)
    if tile_rows is None:
        tile_rows = tiles_y
    if tile_row0 is None:
        tile_row0 = jnp.int32(0)
    row0 = jnp.asarray(tile_row0, jnp.int32).reshape((1,))
    num_tiles = tiles_x * tile_rows
    px = cfg.tile_size * cfg.tile_size
    nch_in = NCH_PACKED if packed else NCH
    assert payload_t.shape[0] == nch_in

    kernel = functools.partial(
        _fwd_kernel,
        tile_size=cfg.tile_size,
        chunk_size=cfg.chunk_size,
        tiles_x=tiles_x,
        alpha_min=cfg.alpha_min,
        alpha_max=cfg.alpha_max,
        sigma_sq=cfg.sigma_radius * cfg.sigma_radius,
        log_eps=math.log(cfg.trans_eps) if cfg.trans_eps > 0 else -1e30,
        packed=packed,
        ablate=ablate,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, NOUT, px), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((NBUF, nch_in, cfg.chunk_size), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
    )

    def squeeze_kernel(ts_ref, row0_ref, payload_ref, out_ref, chunk_buf, sems):
        kernel(ts_ref, row0_ref, payload_ref, out_ref.at[0], chunk_buf, sems)

    out_tiles = pl.pallas_call(
        squeeze_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles, NOUT, px), jnp.float32),
        interpret=interpret,
    )(tile_starts, row0, payload_t)
    return out_tiles
