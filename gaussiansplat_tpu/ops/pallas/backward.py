"""Fused Pallas TPU backward tile rasterizer.

Replaces the reference's atomic-scatter backward (`splatGrads`,
`splat.jl:271-396` — which only exists for the 2D-splat variant, recovers
transmittance by dividing by (1 - alpha) at `splat.jl:389`, and accumulates
into global gradient buffers with `CUDA.@atomic`, making it nondeterministic)
with a deterministic, atomics-free design (SURVEY §7 step 5):

* Each tile program walks its segment's chunks in REVERSE, rewinding the
  transmittance exactly in log space (logT_start = logT_end - sum L; no
  divide-by-(1-alpha) instability) starting from the forward pass's saved
  final logT and per-tile stop-chunk counter.

* All per-gaussian gradient reductions over the pixel tile are MXU matmuls:
  the within-chunk suffix sums of d(log T) use a strictly-triangular ones
  matrix, and the conic/mean gradients come from a single moment matrix
  basis^T @ dq (8, CS) combined with per-gaussian scalars — the moment trick
  turns Sum_px dq * (x - mx)^k into linear combinations of polynomial
  moments.

* Every sorted pair list entry belongs to exactly ONE tile (segments
  partition the sorted array), so per-entry gradients are written to
  disjoint regions of the (NCH, Ppad) output with no atomics. Because chunk
  windows are aligned, the first chunk of a tile can overlap the previous
  tile's last chunk; the TPU grid is sequential, so that program simply
  read-modify-writes the boundary block (keeping lanes < start) — ordering
  is guaranteed, determinism preserved. Per-gaussian accumulation across
  tiles then happens outside the kernel as a segment-sum over gaussian ids —
  also deterministic.
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
    CH_DEPTH,
    CH_R,
    NBUF,
    NCH,
    NCH_PACKED,
    NOUT,
    OUT_LOGT,
    chunk_alpha,
    dot_split2_exact_b,
    dot_split3,
    mom_dot_exact_basis,
    pack_grad_chunk,
    pixel_basis,
    tri_dot_split,
    tri_incl,
    tri_suffix_strict,
    unpack_payload_chunk,
)


def _bwd_kernel(
    # scalar prefetch
    tile_starts_ref,   # (T+1,) int32 SMEM
    stops_ref,         # (T,) int32 SMEM — chunks processed by forward
    row0_ref,          # (1,) int32 SMEM — first tile row of this strip
    # inputs
    payload_ref,       # (NCH, Ppad) f32 HBM
    cot_ref,           # (1, NOUT, PX) VMEM: rows dR,dG,dB, dlogT, dWsum, dDepth
    fwd_ref,           # (1, NOUT, PX) VMEM: forward outputs (row OUT_LOGT used)
    # output
    dpayload_ref,      # (NCH, Ppad) f32 HBM
    # scratch
    chunk_buf,         # (NBUF, NCH, CS) VMEM read ring
    out_buf,           # (WBUF, NCH, CS) VMEM write ring
    zero_buf,          # (NCH, CS) VMEM constant-zero block (tail fill)
    rmw_buf,           # (NCH, CS) VMEM boundary-chunk prefetch
    in_sems,           # (NBUF,) DMA sems
    out_sems,          # (WBUF,) DMA sems
    rmw_sem,           # () DMA sem for the boundary prefetch
    *,
    tile_size: int,
    chunk_size: int,
    tiles_x: int,
    alpha_min: float,
    alpha_max: float,
    sigma_sq: float,
    packed: bool,
    ablate: str = "",
):
    # `ablate` compiles reduced variants for the speed-of-light decomposition
    # (benchmarks/profile_bwd_ablate.py; VERDICT r4 item 1b) — NEVER set in
    # production. Each drops one cost component while keeping the rest
    # bit-faithful, so timing differences price components directly:
    #   dmaonly  — no compute at all: read ring + zero writes (stream floor)
    #   nograd   — forward recompute + logT rewind only; zero grads written
    #   nogeom   — full minus the geometry-gradient chain (moment matmul +
    #              conic/mean/opacity combine)
    #   nodirect — full minus the direct linear-channel gradient matmul
    #   nopack   — full minus the bf16 grad repack (writes raw rows 0..7)
    #   nowrite  — full compute, but per-chunk HBM writes replaced by one
    #              checksum write per tile (prices the write path; checksum
    #              keeps the gradient math alive through DCE)
    assert ablate in ("", "dmaonly", "nograd", "nogeom", "nodirect",
                      "nopack", "nowrite")
    t = pl.program_id(0)
    cs = chunk_size
    px = tile_size * tile_size

    start = tile_starts_ref[t]
    end = tile_starts_ref[t + 1]
    # multiple_of: Mosaic must prove HBM DMA offsets divisible by the lane
    # tiling (128); see the same hint in forward.py.
    base = pl.multiple_of((start // cs) * cs, cs)
    n_chunks = (end - base + cs - 1) // cs
    stop = stops_ref[t]
    # Chunks >= stop were never composited by the (early-exiting) forward:
    # their gradients are zero by construction, so they are filled by pure
    # zero DMAs with no payload read and no compute. Chunk 0 always runs the
    # compute path because its aligned window can overlap the previous
    # tile's segment and needs the read-modify-write boundary handling.
    n_live = jnp.maximum(jnp.minimum(stop, n_chunks), jnp.minimum(n_chunks, 1))

    # Half-tile shift pairs with the centered pixel_basis (exact-bf16 ints).
    # row0 offsets the tile row for tile-strip sharding (see forward.py).
    ox = ((t % tiles_x) * tile_size + tile_size // 2).astype(jnp.float32)
    oy = ((t // tiles_x + row0_ref[0]) * tile_size
          + tile_size // 2).astype(jnp.float32)

    basis = pixel_basis(tile_size)       # (PX, 8)
    tri = tri_incl(cs)
    tri_suf = tri_suffix_strict(cs)

    cot = cot_ref[0].T                   # (PX, NOUT)
    # Cotangent w.r.t. the acc channels (PX, NCH): RGB at 6..8, weight-sum at
    # 9, depth at 10 (channel layout of ops/projection.make_payload).
    dacc = jnp.concatenate(
        [
            jnp.zeros((px, CH_R), jnp.float32),
            cot[:, 0:3],
            cot[:, 4:5],
            cot[:, 5:6],
            jnp.zeros((px, NCH - CH_DEPTH - 1), jnp.float32),
        ],
        axis=1,
    )

    def chunk_dma(slot, ci):
        return pltpu.make_async_copy(
            payload_ref.at[:, pl.ds(pl.multiple_of(base + ci * cs, cs), cs)],
            chunk_buf.at[slot],
            in_sems.at[slot],
        )

    def out_dma(slot, ci):
        return pltpu.make_async_copy(
            out_buf.at[slot],
            dpayload_ref.at[:, pl.ds(pl.multiple_of(base + ci * cs, cs), cs)],
            out_sems.at[slot],
        )

    wbuf = out_buf.shape[0]

    # Prefetch the boundary chunk for the read-modify-write at ci == 0: its
    # aligned window can overlap the PREVIOUS tile's segment (whose writes
    # were fully drained before that program ended), and issuing the read
    # here hides its round trip behind this tile's whole reverse sweep —
    # the old in-loop start+wait exposed a full DMA latency per tile.
    # Disjoint from this program's zero-fills (those target chunks >= n_live
    # >= 1) and from its own writes (chunk 0 is written last).
    @pl.when(n_chunks > 0)
    def _():
        pltpu.make_async_copy(
            dpayload_ref.at[:, pl.ds(pl.multiple_of(base, cs), cs)],
            rmw_buf,
            rmw_sem,
        ).start()

    # Zero-fill the dead tail [n_live, n_chunks) with ring DMAs from the
    # constant-zero block; drained before the compute loop reuses the
    # out_sems slots. Windows are chunk-aligned and distinct per chunk,
    # so these writes are disjoint from the live chunks' writes below.
    zero_buf[...] = jnp.zeros((zero_buf.shape[0], cs), jnp.float32)
    n_dead = jnp.int32(0) if ablate == "nowrite" else n_chunks - n_live

    def zero_body(j, _):
        slot = j % wbuf

        @pl.when(j >= wbuf)
        def _():
            out_dma(slot, 0).wait()

        pltpu.make_async_copy(
            zero_buf,
            dpayload_ref.at[:, pl.ds(
                pl.multiple_of(base + (n_live + j) * cs, cs), cs)],
            out_sems.at[slot],
        ).start()
        return 0

    jax.lax.fori_loop(0, n_dead, zero_body, 0)
    # At most one DMA is outstanding per slot; slot s was used iff s < n_dead.
    for s in range(wbuf):
        @pl.when(s < n_dead)
        def _(s=s):
            out_dma(s, 0).wait()

    # Reverse-direction NBUF-deep read ring (see forward.py: 8-16KB chunk
    # DMAs are latency-bound; keep several in flight) over live chunks only.
    for o in range(NBUF - 1):
        @pl.when(o < n_live)
        def _(o=o):
            chunk_dma((n_live - 1 - o) % NBUF, n_live - 1 - o).start()

    def body(j, carry):
        log_t_end, dlog_t_end, csum = carry
        ci = n_live - 1 - j

        nxt = ci - (NBUF - 1)
        @pl.when(nxt >= 0)
        def _():
            chunk_dma(nxt % NBUF, nxt).start()

        chunk_dma(ci % NBUF, ci).wait()
        chunk = chunk_buf[ci % NBUF]     # (NCH or NCH_PACKED, CS)
        active = ci < stop               # forward actually composited this chunk

        if ablate == "dmaonly":
            dchunk = jnp.zeros(
                (NCH_PACKED if packed else NCH, cs), jnp.float32)
            new_log_t, new_dlog_t = log_t_end, dlog_t_end
        else:
            if packed:
                chunk = unpack_payload_chunk(chunk)

            alpha, unclamped, (mx, my, a, b, c, op) = chunk_alpha(
                basis, chunk, ox, oy, base + ci * cs, start, end,
                alpha_min, alpha_max, sigma_sq,
            )
            ell = jnp.log1p(-alpha)
            s_incl = tri_dot_split(ell, tri)
            s_excl = s_incl - ell
            log_t_start = log_t_end - s_incl[:, cs - 1 : cs]
            t_in = jnp.exp(s_excl + log_t_start)
            w = alpha * t_in

            if ablate == "nograd":
                # 1e-30-scaled w-sum (not *0.0) keeps the alpha/exp chain
                # alive through algebraic simplification.
                dchunk = jnp.concatenate(
                    [jnp.sum(w, axis=0, keepdims=True) * 1e-30,
                     jnp.zeros((NCH - 1, cs), jnp.float32)], axis=0)
                d_se = jnp.zeros((px, cs), jnp.float32)
            else:
                # dw[px,g] = sum_c dacc[px,c] * chunk[c,g]: dacc is zero on
                # the f32 geometry rows and the remaining rows of chunk are
                # bf16-exact in packed mode, so splitting only dacc loses
                # nothing (2 passes vs 3).
                dims_dw = (((1,), (0,)), ((), ()))
                if packed:
                    dw = dot_split2_exact_b(dacc, chunk, dims_dw)
                else:
                    dw = dot_split3(dacc, chunk, dims_dw)      # (PX, CS)
                d_se = dw * w
                d_ell = tri_dot_split(d_se, tri_suf)
                d_ell = d_ell + dlog_t_end
                dalpha = dw * t_in - d_ell / (1.0 - alpha)
                dalpha = jnp.where(unclamped, dalpha, 0.0)
                dq = -0.5 * dalpha * alpha

                if ablate == "nogeom":
                    dgeom = jnp.zeros((NCH, cs), jnp.float32)
                else:
                    # Moment matrix: rows sum_px dq * [x^2,y^2,xy,x,y,1,_,_].
                    mom = mom_dot_exact_basis(basis, dq)   # (8, CS)
                    bxx = mom[0:1]; byy = mom[1:2]; bxy = mom[2:3]
                    bx = mom[3:4]; by = mom[4:5]; b1 = mom[5:6]
                    da = bxx - 2.0 * mx * bx + mx * mx * b1
                    dc = byy - 2.0 * my * by + my * my * b1
                    db = 2.0 * (bxy - mx * by - my * bx + mx * my * b1)
                    dmx = -2.0 * a * (bx - mx * b1) - 2.0 * b * (by - my * b1)
                    dmy = -2.0 * c * (by - my * b1) - 2.0 * b * (bx - mx * b1)
                    dop = -2.0 * b1 / jnp.maximum(op, 1e-20)
                    dgeom = jnp.concatenate(
                        [dmx, dmy, da, db, dc, dop,
                         jnp.zeros((NCH - 6, cs), jnp.float32)],
                        axis=0,
                    )

                # Direct (linear) gradients: d payload_c = sum_px dacc_c * w.
                if ablate == "nodirect":
                    ddirect = jnp.zeros((NCH, cs), jnp.float32)
                else:
                    ddirect = dot_split3(
                        dacc, w, (((0,), (0,)), ((), ()))
                    )                                # (NCH, CS)
                # Geometry channels come only through alpha; linear channels
                # only through the accumulator (their ddirect rows).
                row = jax.lax.broadcasted_iota(jnp.int32, (NCH, 1), 0)
                dchunk = jnp.where(row < 6, dgeom, ddirect)
                dchunk = jnp.where(active, dchunk, 0.0)
            if packed:
                if ablate == "nopack":
                    dchunk = dchunk[:NCH_PACKED]
                else:
                    dchunk = pack_grad_chunk(dchunk)  # (NCH_PACKED, CS)

            new_log_t = jnp.where(active, log_t_start, log_t_end)
            new_dlog_t = jnp.where(
                active,
                dlog_t_end + jnp.sum(d_se, axis=1, keepdims=True),
                dlog_t_end,
            )

        if ablate == "nowrite":
            # No per-chunk stores: fold dchunk into a checksum carried to a
            # single end-of-tile write, so the gradient math survives DCE.
            new_csum = csum + jnp.sum(dchunk, axis=1, keepdims=True)
            return new_log_t, new_dlog_t, new_csum

        # Write path: WBUF-deep ring so the HBM store overlaps several
        # chunks of compute. Before reusing a slot, consume the completion
        # of the write issued on it WBUF chunks ago (same transfer shape, so
        # the wait size matches).
        slot = ci % wbuf

        @pl.when(ci + wbuf < n_live)
        def _():
            out_dma(slot, ci + wbuf).wait()

        # Boundary chunk: preserve the previous tile's lanes, prefetched
        # into rmw_buf at program start (see above).
        @pl.when(ci == 0)
        def _():
            pltpu.make_async_copy(
                dpayload_ref.at[:, pl.ds(pl.multiple_of(base, cs), cs)],
                rmw_buf, rmw_sem,
            ).wait()
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, cs), 1) + base
            out_buf[slot] = jnp.where(lane < start, rmw_buf[...], dchunk)

        @pl.when(ci > 0)
        def _():
            out_buf[slot] = dchunk

        out_dma(slot, ci).start()
        return new_log_t, new_dlog_t, csum

    log_t_final = fwd_ref[0, OUT_LOGT : OUT_LOGT + 1, :].T     # (PX, 1)
    dlog_t_init = cot[:, 3:4]
    csum0 = jnp.zeros((NCH_PACKED if packed else NCH, 1), jnp.float32)
    _, _, csum = jax.lax.fori_loop(
        0, n_live, body, (log_t_final, dlog_t_init, csum0))

    if ablate == "nowrite":
        # One write per tile: the checksum lands in the tile's first chunk
        # window (timing variant — output values are NOT gradients).
        @pl.when(n_chunks > 0)
        def _():
            pltpu.make_async_copy(
                dpayload_ref.at[:, pl.ds(pl.multiple_of(base, cs), cs)],
                rmw_buf, rmw_sem,
            ).wait()
            out_buf[0] = csum + jnp.zeros_like(out_buf[0])
            out_dma(0, 0).start()

        @pl.when(n_chunks > 0)
        def _():
            out_dma(0, 0).wait()
        return

    # Drain the in-flight writes of the final chunks (ci = 0..WBUF-1, each
    # on its own slot) before this program ends: the next tile's boundary
    # read-modify-write may touch the shared window.
    for s in range(wbuf):
        @pl.when(s < n_live)
        def _(s=s):
            out_dma(s, s).wait()


def rasterize_backward(
    payload_t: jax.Array,     # (NCH or NCH_PACKED, Ppad)
    tile_starts: jax.Array,   # (T+1,)
    stops: jax.Array,         # (T,) int32
    cot_tiles: jax.Array,     # (T, NOUT, PX)
    fwd_tiles: jax.Array,     # (T, NOUT, PX)
    width: int,
    height: int,
    cfg: RasterConfig,
    interpret: bool = False,
    packed: bool = False,
    tile_row0=None,
    tile_rows=None,
    ablate: str = "",
) -> jax.Array:
    """Returns dpayload_t, same layout (and packing) as payload_t; entries
    never touched by any tile are garbage and must be masked by the caller
    (entry index < num_pairs). `ablate` selects reduced timing variants for
    the decomposition bench (see _bwd_kernel) — production callers leave it
    empty."""
    tiles_x, tiles_y = tile_grid(width, height, cfg.tile_size)
    if tile_rows is None:
        tile_rows = tiles_y
    if tile_row0 is None:
        tile_row0 = jnp.int32(0)
    row0 = jnp.asarray(tile_row0, jnp.int32).reshape((1,))
    num_tiles = tiles_x * tile_rows
    px = cfg.tile_size * cfg.tile_size
    nch_io = NCH_PACKED if packed else NCH
    assert payload_t.shape[0] == nch_io

    kernel = functools.partial(
        _bwd_kernel,
        tile_size=cfg.tile_size,
        chunk_size=cfg.chunk_size,
        tiles_x=tiles_x,
        alpha_min=cfg.alpha_min,
        alpha_max=cfg.alpha_max,
        sigma_sq=cfg.sigma_radius * cfg.sigma_radius,
        packed=packed,
        ablate=ablate,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, NOUT, px), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NOUT, px), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((NBUF, nch_io, cfg.chunk_size), jnp.float32),
            pltpu.VMEM((4, nch_io, cfg.chunk_size), jnp.float32),
            pltpu.VMEM((nch_io, cfg.chunk_size), jnp.float32),
            pltpu.VMEM((nch_io, cfg.chunk_size), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF,)),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA,
        ],
    )

    dpayload_t = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(payload_t.shape, jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(tile_starts, stops, row0, payload_t, cot_tiles, fwd_tiles)
    return dpayload_t
