"""custom_vjp wrapper around the fused Pallas forward/backward kernels.

Presents the same interface as ops/tile_raster.rasterize_tiles_xla. Only the
rasterization itself is hand-differentiated; everything upstream (projection,
SH, activations, the sorted gather) is ordinary JAX autodiff, so the VJP
boundary is exactly the (P, NCH) sorted payload — per SURVEY §7 step 5, wired
as `jax.custom_vjp` around the Pallas forward.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

import numpy as np

from ...config import RasterConfig
from ..binning import reduce_pair_grads_packed_t
from ..projection import PAYLOAD_DIM
from ..tile_raster import RasterOut, image_to_tiles, tiles_to_image
from .backward import rasterize_backward
from .common import NCH_PACKED, NOUT, OUT_LOGT, OUT_STOP, pack_payload_rows
from .forward import rasterize_forward


def _compose_outputs(out_tiles, background, width, height, ts):
    """Shared tail of both forward paths: background compositing + tile
    grid -> image reassembly from the kernels' (T, NOUT, PX) block."""
    log_t = out_tiles[:, OUT_LOGT, :]
    trans_tiles = jnp.exp(log_t)
    rgb_tiles = jnp.transpose(out_tiles[:, 0:3, :], (0, 2, 1))
    img_tiles = rgb_tiles + trans_tiles[..., None] * background[None, None, :]
    image = tiles_to_image(img_tiles, width, height, ts)
    trans = tiles_to_image(trans_tiles, width, height, ts)
    return image, trans


def _image_cotangents(cots, out_tiles, background, ts):
    """Shared head of both backward paths: image/transmittance cotangents ->
    the (T, NOUT, PX) per-tile cotangent block for the bwd kernel, plus the
    background cotangent."""
    dimg, dtrans = cots
    dimg_tiles = image_to_tiles(dimg, ts)          # (T, PX, 3)
    dtrans_tiles = image_to_tiles(dtrans, ts)      # (T, PX)
    trans_tiles = jnp.exp(out_tiles[:, OUT_LOGT, :])

    # d/d logT of (trans output + background compositing).
    dtrans_total = dtrans_tiles + jnp.einsum("tpc,c->tp", dimg_tiles, background)
    dlog_t = dtrans_total * trans_tiles

    px = ts * ts
    num_tiles = dimg_tiles.shape[0]
    # COUPLING INVARIANT: cot rows 4 (dWsum) and 5 (dDepth) must stay
    # structurally zero — the rasterizer exposes only image + transmittance
    # as differentiable outputs, and the packed reduce path downstream
    # (binning._gather_grad_rows) discards payload-gradient channels 9..15
    # on that assumption. If wsum/depth ever become differentiable outputs,
    # their cotangents must be threaded here AND _gather_grad_rows must stop
    # zero-padding those channels.
    cot_tiles = jnp.concatenate(
        [
            jnp.transpose(dimg_tiles, (0, 2, 1)),  # rows dR, dG, dB
            dlog_t[:, None, :],
            jnp.zeros((num_tiles, NOUT - 4, px), jnp.float32),
        ],
        axis=1,
    )
    dbg = jnp.einsum("tpc,tp->c", dimg_tiles, trans_tiles)
    return cot_tiles, dbg


@functools.lru_cache(maxsize=None)
def _make_rasterizer(width: int, height: int, cfg: RasterConfig, interpret: bool,
                     tile_rows=None):
    ts = cfg.tile_size
    cs = cfg.chunk_size
    strip = tile_rows is not None
    # Strips render tile_rows * ts uncropped pixel rows (strips compose to
    # the padded image; the caller crops), matching the XLA twin's contract.
    img_h = tile_rows * ts if strip else height

    @jax.custom_vjp
    def raster(sorted_payload, tile_starts, background, tile_row0):
        img, trans, *_ = _fwd(sorted_payload, tile_starts, background, tile_row0)
        return img, trans

    def _fwd(sorted_payload, tile_starts, background, tile_row0):
        payload_t = jnp.concatenate(
            [sorted_payload.T, jnp.zeros((PAYLOAD_DIM, cs), jnp.float32)],
            axis=1,
        )  # (NCH, P + CS): aligned chunk windows may poke past the last entry
        out_tiles = rasterize_forward(
            payload_t, tile_starts, width, height, cfg, interpret=interpret,
            tile_row0=tile_row0, tile_rows=tile_rows,
        )
        image, trans = _compose_outputs(out_tiles, background, width, img_h, ts)
        return image, trans, payload_t, out_tiles

    def raster_fwd(sorted_payload, tile_starts, background, tile_row0):
        image, trans, payload_t, out_tiles = _fwd(
            sorted_payload, tile_starts, background, tile_row0
        )
        res = (payload_t, tile_starts, background, out_tiles, tile_row0)
        return (image, trans), res

    def raster_bwd(res, cots):
        payload_t, tile_starts, background, out_tiles, tile_row0 = res
        stops = out_tiles[:, OUT_STOP, 0].astype(jnp.int32)
        p = payload_t.shape[1] - cs
        cot_tiles, dbg = _image_cotangents(cots, out_tiles, background, ts)

        dpayload_t = rasterize_backward(
            payload_t, tile_starts, stops, cot_tiles, out_tiles,
            width, height, cfg, interpret=interpret,
            tile_row0=tile_row0, tile_rows=tile_rows,
        )
        dsorted = dpayload_t[:, :p].T
        # Entries past the last valid pair were never written: mask garbage.
        valid = jnp.arange(p, dtype=jnp.int32) < tile_starts[-1]
        dsorted = jnp.where(valid[:, None], dsorted, 0.0)

        d_starts = jnp.zeros_like(tile_starts)  # integer: no real cotangent
        d_row0 = np.zeros(jnp.shape(tile_row0), jax.dtypes.float0)
        return dsorted, d_starts, dbg, d_row0

    raster.defvjp(raster_fwd, raster_bwd)
    return raster


def rasterize_tiles_pallas(
    sorted_payload: jax.Array,   # (P, NCH) in (tile, depth) order
    tile_starts: jax.Array,      # (T+1,) int32
    background: jax.Array,       # (3,)
    width: int,
    height: int,
    cfg: RasterConfig,
    interpret: bool = False,
    tile_row0=None,              # dynamic first tile row (tile-sharded strips)
    tile_rows=None,              # static number of tile rows to render
) -> RasterOut:
    f = _make_rasterizer(width, height, cfg, interpret, tile_rows)
    if tile_row0 is None:
        tile_row0 = jnp.int32(0)
    image, trans = f(sorted_payload, tile_starts, background,
                     jnp.asarray(tile_row0, jnp.int32))
    seg_len = tile_starts[1:] - tile_starts[:-1]
    needed = (jnp.max(seg_len) + cfg.chunk_size - 1) // cfg.chunk_size
    return RasterOut(image=image, transmittance=trans, max_chunks_needed=needed)


@functools.lru_cache(maxsize=None)
def _make_packed_rasterizer(width: int, height: int, cfg: RasterConfig,
                            interpret: bool, tile_rows=None):
    """Fused packed pipeline: the custom_vjp boundary is the (N, NCH)
    per-gaussian payload — packing (bf16 color/opacity/depth), the sorted
    P-gather, the raster kernels, and the gather-VJP's un-permute + segment
    reduction all live INSIDE the boundary, so autodiff never sees a bit op
    and every P-proportional stream moves 8 lanes instead of 16."""
    ts = cfg.tile_size
    cs = cfg.chunk_size
    strip = tile_rows is not None
    img_h = tile_rows * ts if strip else height

    @jax.custom_vjp
    def raster(payload, binfields, background):
        img, trans, *_ = _fwd(payload, binfields, background)
        return img, trans

    def _fwd(payload, bf, background):
        # Row-major packed table + two <=8-wide row gathers + one transpose:
        # measured ~2x cheaper than the channel-major pack + lane-major
        # P-gather (see common.pack_payload_rows). The barrier keeps XLA
        # from fusing the pack into the gathers (which would re-widen the
        # gathered rows past the fast-path width).
        rows = jax.lax.optimization_barrier(pack_payload_rows(payload))
        gathered = rows[bf["depth_order"]][bf["sorted_ranks"]]   # (P, 8)
        payload_t = jnp.concatenate(
            [
                gathered.T,                                      # (8, P)
                jnp.zeros((NCH_PACKED, cs), jnp.float32),
            ],
            axis=1,
        )
        out_tiles = rasterize_forward(
            payload_t, bf["tile_starts"], width, height, cfg,
            interpret=interpret, packed=True,
            tile_row0=bf["tile_row0"], tile_rows=tile_rows,
        )
        image, trans = _compose_outputs(out_tiles, background, width, img_h, ts)
        return image, trans, payload_t, out_tiles

    def raster_fwd(payload, bf, background):
        image, trans, payload_t, out_tiles = _fwd(payload, bf, background)
        return (image, trans), (payload_t, bf, background, out_tiles)

    def raster_bwd(res, cots):
        payload_t, bf, background, out_tiles = res
        stops = out_tiles[:, OUT_STOP, 0].astype(jnp.int32)
        p = payload_t.shape[1] - cs
        cot_tiles, dbg = _image_cotangents(cots, out_tiles, background, ts)

        dpacked_t = rasterize_backward(
            payload_t, bf["tile_starts"], stops, cot_tiles, out_tiles,
            width, height, cfg, interpret=interpret, packed=True,
            tile_row0=bf["tile_row0"], tile_rows=tile_rows,
        )                                              # (8, P + cs)
        dpayload = reduce_pair_grads_packed_t(
            dpacked_t[:, :p],
            bf["sorted_ranks"],
            bf["depth_order"],
            bf["sorted_pos"],
            bf["seg_offsets"],
            bf["num_pairs"],
            interpret=interpret,
        )                                              # (N, NCH) orig order

        dbf = jax.tree_util.tree_map(
            lambda x: np.zeros(x.shape, jax.dtypes.float0), bf
        )
        return dpayload, dbf, dbg

    raster.defvjp(raster_fwd, raster_bwd)
    return raster


def rasterize_payload_pallas(
    payload: jax.Array,          # (N, NCH) per-gaussian payload (unpacked)
    binning,                     # TileBinning
    background: jax.Array,       # (3,)
    width: int,
    height: int,
    cfg: RasterConfig,
    interpret: bool = False,
    tile_row0=None,              # dynamic first tile row (tile-sharded strips)
    tile_rows=None,              # static number of tile rows to render
) -> RasterOut:
    """Packed fast path: differentiable w.r.t. `payload` and `background`."""
    f = _make_packed_rasterizer(width, height, cfg, interpret, tile_rows)
    if tile_row0 is None:
        tile_row0 = jnp.int32(0)
    binfields = dict(
        depth_order=binning.depth_order,
        sorted_ranks=binning.sorted_ranks,
        sorted_pos=binning.sorted_pos,
        seg_offsets=binning.seg_offsets,
        num_pairs=binning.num_pairs,
        tile_starts=binning.tile_starts,
        tile_row0=jnp.asarray(tile_row0, jnp.int32),
    )
    image, trans = f(payload, binfields, background)
    ts = binning.tile_starts
    seg_len = ts[1:] - ts[:-1]
    needed = (jnp.max(seg_len) + cfg.chunk_size - 1) // cfg.chunk_size
    return RasterOut(image=image, transmittance=trans, max_chunks_needed=needed)
