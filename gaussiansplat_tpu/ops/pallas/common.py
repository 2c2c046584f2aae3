"""Shared pieces of the Pallas forward/backward tile rasterizer kernels.

Kernel-level design (TPU-first; contrast with the reference's `splatDraw`
CUDA kernel, `splat.jl:195-269`, which is one thread per pixel and a scalar
walk of the gaussian list):

* The pixel tile is a flat (PX, 1) vector (PX = tile_size^2; 32x32 -> 1024 =
  a whole (8,128) f32 register file column), and gaussians stream through in
  depth-ordered chunks of `chunk_size` (=128, one MXU edge).

* The quadratic form q(px, g) = d^T conic d is evaluated as ONE MXU matmul:
  q = B @ Q, where B (PX, 8) is a per-tile pixel polynomial basis
  [x^2, y^2, xy, x, y, 1, 0, 0] in *tile-local* coordinates (keeps f32
  conditioning at 4K), and Q (8, CS) packs per-gaussian quadratic
  coefficients.

* Front-to-back alpha compositing is done in log-transmittance space:
  L = log1p(-alpha); within-chunk inclusive prefix sums of L are again ONE
  MXU matmul against a constant triangular matrix, so the classic serial
  per-splat transmittance recurrence becomes parallel MXU work.

* Color (and any other linear channel: alpha-weight sum, depth) accumulates
  as W @ chunk^T — a third matmul. The VPU only does the cheap elementwise
  glue; the MXU carries the O(PX * CS) work.

* Chunk windows are aligned down to chunk_size so every HBM DMA is
  tile-aligned; entries outside the tile's [start, end) segment are masked by
  global index. Segments are contiguous (they partition the sorted pair
  list), which the backward kernel exploits for race-free output writes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Payload channel indices (must match ops/projection.py).
CH_MX, CH_MY, CH_CA, CH_CB, CH_CC, CH_OP, CH_R, CH_G, CH_B = range(9)
CH_ONE = 9     # constant 1.0 -> accumulates sum of weights (alpha image)
CH_DEPTH = 10  # camera depth -> accumulates expected depth image
NCH = 16

# Rows of the fused per-tile output block (fwd kernel).
OUT_R, OUT_G, OUT_B, OUT_LOGT, OUT_WSUM, OUT_DEPTH, OUT_STOP = range(7)
NOUT = 8

# Chunk-DMA ring depth (slots in the VMEM read buffer; NBUF-1 transfers stay
# in flight). 8-16KB chunk reads are HBM-latency-bound: two slots leave the
# MXU waiting on the round trip, four hide it behind compute. Depth 8 was
# A/B'd on chip (round 4, 3M config): identical step time, so the
# backward kernel's ~50%-of-pass-model gap is NOT read-latency exposure —
# four slots already hide it. Kept at 4 for the smaller VMEM footprint.
NBUF = 4

# Packed payload: 8 f32 lanes per pair instead of 16. Geometry stays exact
# f32 (mean, conic — the quadratic form cancels catastrophically and its
# coefficients must keep full precision); opacity/color/depth ride as
# bit-packed bf16 pairs (~0.4% relative quantization on values in [0, ~2] —
# far below splat-accumulation noise). Halves every P-proportional byte
# stream: the sorted gather, both kernels' chunk DMAs, the gradient
# write-back, and the gather-VJP's un-permute + segment reduce.
NCH_PACKED = 8
PK_MX, PK_MY, PK_CA, PK_CB, PK_CC, PK_OP_DEPTH, PK_R_G, PK_B_X = range(8)
# Packed GRADIENT lanes (backward output): geometry + opacity grads exact
# f32, color/depth grads bf16-packed. (The wsum/'one' channel has no real
# cotangent — the raster returns only image and transmittance.)
GK_MX, GK_MY, GK_CA, GK_CB, GK_CC, GK_OP, GK_R_G, GK_B_DEPTH = range(8)

_HI_MASK = np.int32(-65536)           # 0xFFFF0000
_LO_MASK = np.int32(0xFFFF)


def pack_bf16_pair(x: jax.Array, y: jax.Array) -> jax.Array:
    """Round x, y to bf16 and bit-pack both into one f32 lane (x in the high
    half). Pure int32 bit ops — Mosaic-safe inside kernels, plain XLA outside."""
    xh = jax.lax.bitcast_convert_type(
        x.astype(jnp.bfloat16).astype(jnp.float32), jnp.int32)
    yh = jax.lax.bitcast_convert_type(
        y.astype(jnp.bfloat16).astype(jnp.float32), jnp.int32)
    packed = (xh & _HI_MASK) | ((yh >> 16) & _LO_MASK)
    return jax.lax.bitcast_convert_type(packed, jnp.float32)


def unpack_bf16_pair(p: jax.Array):
    """Inverse of pack_bf16_pair: f32 lane -> (x, y) as exact-bf16 f32s."""
    u = jax.lax.bitcast_convert_type(p, jnp.int32)
    x = jax.lax.bitcast_convert_type(u & _HI_MASK, jnp.float32)
    y = jax.lax.bitcast_convert_type(u << 16, jnp.float32)
    return x, y


def pack_payload_t(payload: jax.Array) -> jax.Array:
    """(N, 16) unpacked payload rows -> (NCH_PACKED, N) channel-major packed.

    Channel-major so the downstream P-sized gather indexes lanes directly and
    no (P, NCH) transpose pass ever materializes. Zero rows pack to zero, so
    padded/dead gaussians stay inert."""
    pt = payload.T
    return jnp.concatenate(
        [
            pt[CH_MX : CH_CC + 1, :],
            pack_bf16_pair(pt[CH_OP : CH_OP + 1, :], pt[CH_DEPTH : CH_DEPTH + 1, :]),
            pack_bf16_pair(pt[CH_R : CH_R + 1, :], pt[CH_G : CH_G + 1, :]),
            pack_bf16_pair(pt[CH_B : CH_B + 1, :], jnp.zeros_like(pt[:1, :])),
        ],
        axis=0,
    )


def pack_payload_rows(payload: jax.Array) -> jax.Array:
    """(N, 16) unpacked payload rows -> (N, NCH_PACKED) ROW-major packed.

    Row-major (not the channel-major pack_payload_t) because TPU row
    gathers have a hard fast path at row width <= 8 f32: the packed
    pipeline's two reorders (depth compaction, then the P-sized pair
    gather) run ~2x faster over (N, 8) rows than over either (N, 16) rows
    or (8, N) lanes (measured: production lane-major chain 67.5 ms vs
    row-major chain 53.3 ms at N=3M/P=6.3M, including the one
    (P, 8) -> (8, P) transpose the kernels' channel-major layout needs)."""
    return jnp.concatenate(
        [
            payload[:, CH_MX : CH_CC + 1],
            pack_bf16_pair(payload[:, CH_OP : CH_OP + 1],
                           payload[:, CH_DEPTH : CH_DEPTH + 1]),
            pack_bf16_pair(payload[:, CH_R : CH_R + 1],
                           payload[:, CH_G : CH_G + 1]),
            pack_bf16_pair(payload[:, CH_B : CH_B + 1],
                           jnp.zeros_like(payload[:, :1])),
        ],
        axis=1,
    )


def unpack_payload_chunk(p8: jax.Array) -> jax.Array:
    """(NCH_PACKED, C) packed chunk -> (NCH, C) standard channel rows.

    CH_ONE is synthesized (it is constant 1; out-of-segment lanes are masked
    by chunk_alpha's in_seg gate, so its value there is irrelevant)."""
    c = p8.shape[1]
    op, depth = unpack_bf16_pair(p8[PK_OP_DEPTH : PK_OP_DEPTH + 1, :])
    r, g = unpack_bf16_pair(p8[PK_R_G : PK_R_G + 1, :])
    b, _ = unpack_bf16_pair(p8[PK_B_X : PK_B_X + 1, :])
    return jnp.concatenate(
        [
            p8[PK_MX : PK_CC + 1, :],
            op, r, g, b,
            jnp.ones((1, c), jnp.float32),
            depth,
            jnp.zeros((NCH - CH_DEPTH - 1, c), jnp.float32),
        ],
        axis=0,
    )


def pack_grad_chunk(d16: jax.Array) -> jax.Array:
    """(NCH, C) gradient rows -> (NCH_PACKED, C) packed gradient rows."""
    return jnp.concatenate(
        [
            d16[CH_MX : CH_OP + 1, :],
            pack_bf16_pair(d16[CH_R : CH_R + 1, :], d16[CH_G : CH_G + 1, :]),
            pack_bf16_pair(d16[CH_B : CH_B + 1, :], d16[CH_DEPTH : CH_DEPTH + 1, :]),
        ],
        axis=0,
    )


def unpack_grad_chunk(d8: jax.Array) -> jax.Array:
    """Inverse of pack_grad_chunk; the CH_ONE row is zero (no cotangent)."""
    c = d8.shape[1]
    r, g = unpack_bf16_pair(d8[GK_R_G : GK_R_G + 1, :])
    b, depth = unpack_bf16_pair(d8[GK_B_DEPTH : GK_B_DEPTH + 1, :])
    return jnp.concatenate(
        [
            d8[GK_MX : GK_OP + 1, :],
            r, g, b,
            jnp.zeros((1, c), jnp.float32),
            depth,
            jnp.zeros((NCH - CH_DEPTH - 1, c), jnp.float32),
        ],
        axis=0,
    )


def pixel_basis(tile_size: int) -> jax.Array:
    """(PX, 8) polynomial basis over tile-CENTERED pixel coordinates.

    Centering makes every basis entry an integer with |entry| <= (ts/2)^2
    (<= 256 for 32px tiles) — exactly representable in bf16 — so the
    quadratic form q = basis @ Q needs only a 3-way Dekker split of Q
    (3 MXU passes) instead of Precision.HIGHEST's 6 to keep f32 accuracy:
    see q_dot_exact_basis. CALLERS MUST PASS THE HALF-TILE-SHIFTED ORIGIN
    (tile_origin + tile_size // 2) to chunk_alpha/quad_coeff_matrix so the
    mean offset lands in the same centered frame."""
    # The exact-bf16 premise breaks beyond (ts/2)^2 = 256 (bf16 has an 8-bit
    # mantissa): guard it rather than silently losing the cancellation-
    # critical precision of q.
    if tile_size > 32:  # ValueError, not assert: must survive python -O
        raise ValueError(
            f"pallas rasterizer requires tile_size <= 32 (got {tile_size}): "
            "the exact-bf16 centered basis bounds entries by "
            "(tile_size/2)^2 <= 256"
        )
    px = tile_size * tile_size
    h = tile_size // 2
    idx = jax.lax.broadcasted_iota(jnp.int32, (px, 1), 0)
    x = (idx % tile_size - h).astype(jnp.float32)
    y = (idx // tile_size - h).astype(jnp.float32)
    one = jnp.ones_like(x)
    zero = jnp.zeros_like(x)
    return jnp.concatenate([x * x, y * y, x * y, x, y, one, zero, zero], axis=1)


def tri_incl(cs: int) -> jax.Array:
    """(CS, CS) upper-triangular (incl. diagonal) ones: L @ tri = inclusive
    prefix sum of L along the gaussian axis."""
    r = jax.lax.broadcasted_iota(jnp.int32, (cs, cs), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (cs, cs), 1)
    return (r <= c).astype(jnp.float32)


def tri_suffix_strict(cs: int) -> jax.Array:
    """(CS, CS) with M[g, h] = 1 where h < g: dSe @ M = strict suffix sum
    (each entry h receives sum over later entries g > h)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (cs, cs), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (cs, cs), 1)
    return (c < r).astype(jnp.float32)


def dot_split3(a: jax.Array, b: jax.Array, dims) -> jax.Array:
    """dot_general in 3 bf16 MXU passes (hi*hi + hi*lo + lo*hi).

    The Dekker hi/lo split reconstructs ~16 mantissa bits of each operand;
    dropping the lo*lo term loses only ~2^-16 relative — the same error
    budget as tri_dot_split, at half the cost of HIGHEST's 6 passes. Use for
    linear-channel ACCUMULATION matmuls (colors, gradients), not for the
    quadratic form q, whose expanded-polynomial evaluation cancels
    catastrophically and needs HIGHEST.
    """
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def d(x, y):
        return jax.lax.dot_general(
            x, y, dimension_numbers=dims,
            preferred_element_type=jnp.float32,
        )

    return d(a_hi, b_hi) + (d(a_hi, b_lo) + d(a_lo, b_hi))


def dot_split2_exact_b(a: jax.Array, b_exact: jax.Array, dims) -> jax.Array:
    """dot_general with only `a` Dekker-split (2 bf16 passes): valid when
    every contraction-relevant entry of `b_exact` is exactly representable
    in bf16 — true for the UNPACKED payload chunk's linear channels
    (bf16-quantized color/opacity/depth, the constant 1, zeros) in packed
    mode. Rows contracted against inexact-f32 entries of b_exact produce
    slightly less accurate sums; callers must only use outputs whose
    contraction touched exact rows (the raster discards the others)."""
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b16 = b_exact.astype(jnp.bfloat16)

    def d(x):
        return jax.lax.dot_general(
            x, b16, dimension_numbers=dims,
            preferred_element_type=jnp.float32,
        )

    return d(a_hi) + d(a_lo)


def tri_dot_split(x: jax.Array, tri: jax.Array) -> jax.Array:
    """x @ tri with x split into two bf16 passes (Dekker-style hi/lo).

    The triangular ones matrix is exact in bf16, so only x needs splitting:
    hi = bf16(x) and lo = bf16(x - hi) reconstruct ~16 mantissa bits, and
    the MXU accumulates in f32. Two bf16 passes vs HIGHEST's six — this is
    the dominant matmul of both raster kernels (PX x CS x CS). (Measured
    alternative: log2(CS) masked pltpu.roll lane-scans on the VPU are
    SLOWER than the HIGHEST matmul at CS=128 — lane rotates are expensive.)
    """
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    t16 = tri.astype(jnp.bfloat16)
    out = jnp.dot(hi, t16, preferred_element_type=jnp.float32)
    return out + jnp.dot(lo, t16, preferred_element_type=jnp.float32)


def q_dot_exact_basis(basis: jax.Array, q_rows: jax.Array) -> jax.Array:
    """basis @ q_rows where `basis` is exact in bf16 (integer entries
    |.| <= 256 from the tile-centered pixel_basis): a 3-way Dekker split of
    q_rows reconstructs its full ~24 mantissa bits, matching
    Precision.HIGHEST (six passes) on the catastrophically-cancelling
    expanded polynomial.

    The mid and lo splits are STACKED along the contraction dim —
    [b16 b16] (PX, 16) @ [mid; lo] (16, CS) — so the whole thing is TWO MXU
    passes instead of three K = 8 passes: an MXU pass streams M rows
    regardless of K/N underfill, so the unstacked form cost 3 row-streams
    for identical math. The hi pass stays separate ON PURPOSE: its products
    are 2^8 / 2^16 larger than mid's / lo's, and interleaving all three in
    one accumulation chain raises the error at the q ~ sigma^2 support
    boundary ~4x (measured 6.6e-6 vs 1.5e-6), enough to flip alpha gates a
    few ULPs from the boundary. With hi separate, the grouped sum is
    error-equivalent to the original three-pass form. The basis duplicate
    is a compile-time constant."""
    b16 = basis.astype(jnp.bfloat16)
    b2 = jnp.concatenate([b16, b16], axis=1)               # (PX, 16) const
    hi = q_rows.astype(jnp.bfloat16)
    r = q_rows - hi.astype(jnp.float32)
    mid = r.astype(jnp.bfloat16)
    lo = (r - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    q2 = jnp.concatenate([mid, lo], axis=0)                # (16, CS)
    return (jnp.dot(b16, hi, preferred_element_type=jnp.float32)
            + jnp.dot(b2, q2, preferred_element_type=jnp.float32))


def mom_dot_exact_basis(basis: jax.Array, dq: jax.Array) -> jax.Array:
    """basis^T @ dq (contraction over pixels) with the exact-bf16 centered
    basis: only dq needs the hi/lo split — two MXU passes for the same ~16
    reconstructed mantissa bits dot_split3 gets from three."""
    b16 = basis.astype(jnp.bfloat16)
    hi = dq.astype(jnp.bfloat16)
    lo = (dq - hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def d(x):
        return jax.lax.dot_general(
            b16, x, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    return d(hi) + d(lo)


def quad_coeff_matrix(chunk: jax.Array, ox: jax.Array, oy: jax.Array) -> tuple:
    """Per-gaussian quadratic coefficients Q (8, CS) s.t. basis @ Q = q, plus
    the tile-local means and conic rows used again by the backward pass.

    chunk: (NCH, CS) payload block; ox/oy: () tile origin in global pixels.
    """
    cs = chunk.shape[1]
    mx = chunk[CH_MX : CH_MX + 1, :] - ox
    my = chunk[CH_MY : CH_MY + 1, :] - oy
    a = chunk[CH_CA : CH_CA + 1, :]
    b = chunk[CH_CB : CH_CB + 1, :]
    c = chunk[CH_CC : CH_CC + 1, :]
    zero = jnp.zeros((1, cs), jnp.float32)
    q_rows = jnp.concatenate(
        [
            a,
            c,
            2.0 * b,
            -2.0 * a * mx - 2.0 * b * my,
            -2.0 * c * my - 2.0 * b * mx,
            a * mx * mx + 2.0 * b * mx * my + c * my * my,
            zero,
            zero,
        ],
        axis=0,
    )
    return q_rows, mx, my, a, b, c


def chunk_alpha(
    basis: jax.Array,      # (PX, 8)
    chunk: jax.Array,      # (NCH, CS)
    ox: jax.Array,
    oy: jax.Array,
    gidx0: jax.Array,      # () global index of lane 0 of this chunk
    start: jax.Array,      # () segment start (global)
    end: jax.Array,        # () segment end (global)
    alpha_min: float,
    alpha_max: float,
    sigma_sq: float,
):
    """Alpha matrix (PX, CS) plus the clamp gate used by backward.

    Support is gated explicitly: a splat contributes only where
    q <= sigma_radius^2 AND alpha >= alpha_min. The q-gate makes the
    rendered footprint the exact sigma_radius ellipse — independent of the
    binning rectangle's shape — which is what lets binning cull whole
    (gaussian, tile) pairs whose tile lies outside that support with
    bit-identical output (ops/binning.py tile_mask)."""
    cs = chunk.shape[1]
    q_rows, mx, my, a, b, c = quad_coeff_matrix(chunk, ox, oy)
    q = q_dot_exact_basis(basis, q_rows)              # (PX, CS)
    op = chunk[CH_OP : CH_OP + 1, :]
    alpha_raw = op * jnp.exp(-0.5 * q)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, cs), 1) + gidx0
    in_seg = (lane >= start) & (lane < end)
    live = in_seg & (alpha_raw >= alpha_min) & (q <= sigma_sq)
    alpha = jnp.where(live, jnp.minimum(alpha_raw, alpha_max), 0.0)
    unclamped = live & (alpha_raw < alpha_max)
    return alpha, unclamped, (mx, my, a, b, c, op)
