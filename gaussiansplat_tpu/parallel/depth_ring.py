"""Depth-sliced ring compositing across gaussian shards (SURVEY §5).

The second beyond-HBM scaling schedule, complementary to gauss_shard's
strip routing (which keeps PIXELS stationary per device): here every device
owns 1/D of the gaussian parameters and renders the FULL tile grid for one
DEPTH SLAB, and cross-device compositing uses the associative
(color, transmittance) pair combiner

    C = C_front + T_front * C_back        T = T_front * T_back

rotated around the device ring with `jax.lax.ppermute` — exactly the
ring-attention-shaped schedule sketched in SURVEY §5 ("shard tiles as the
stationary axis, stream gaussian shards past them"), with the ordering
hazard (SURVEY §7 hard part (c)) resolved by depth-partitioning: slabs are
equal-count quantiles of a global depth histogram (one small psum), so
composing slab partials front-to-back reproduces the exact global
depth order — per-pixel results match the single-device renderer to
float tolerance, not approximately. One caveat: gaussians with EQUAL
depth (same histogram bin) may composite in a different tie-break order
than the single-device (depth, index) sort — e.g. freshly cloned
duplicates right after densification. Ties between identical splats are
symmetric (same composite); distinct equal-depth splats assume distinct
depths for exactness.

The reference has no distribution of any kind (SURVEY §2.4); this module
and gauss_shard are the TPU-native answers to scaling the gaussian axis
(BASELINE configs 4-5, 30M gaussians).

Everything is differentiable end to end: the slab routing indices are
stop-gradient order data (like tile binning), while payload values flow
through `all_to_all` / `ppermute` / `psum`, whose VJPs are the transposed
collectives, so each parameter gradient lands on the shard that owns it.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..config import RasterConfig
from ..models.gaussians import GaussianModel
from ..ops.binning import bin_gaussians
from ..ops.camera import Camera
from ..ops.projection import (
    PAYLOAD_DIM,
    make_payload,
    payload_to_projected,
    project_gaussians,
)
from ..ops.raster_dispatch import rasterize_payload
from .gauss_shard import GAUSS_AXIS, pack_to_destinations

# Static log-depth histogram resolution for the slab quantiles. 512 bins
# over [HIST_ZMIN, HIST_ZMAX] gives ~2.7% depth granularity per bin — slab
# boundaries land on bin edges, which only shifts the LOAD BALANCE, never
# correctness (every gaussian in a bin goes to the same slab).
HIST_BINS = 512
HIST_ZMIN = 1e-2
HIST_ZMAX = 1e5


def _depth_bin(depth: jax.Array) -> jax.Array:
    lo = np.log(HIST_ZMIN)
    hi = np.log(HIST_ZMAX)
    z = jnp.log(jnp.clip(depth, HIST_ZMIN, HIST_ZMAX))
    b = jnp.floor((z - lo) / (hi - lo) * HIST_BINS)
    return jnp.clip(b, 0, HIST_BINS - 1).astype(jnp.int32)


def depth_slab_bounds(
    depth: jax.Array,     # (n_local,) camera-space depth
    valid: jax.Array,     # (n_local,) bool
    n_slabs: int,
    axis_name: str,
) -> jax.Array:
    """Equal-count slab boundaries as histogram-bin indices, shape
    (n_slabs - 1,). Globally consistent: built from the psum'd histogram, so
    every device computes identical bounds."""
    bins = _depth_bin(depth)
    hist = jnp.zeros((HIST_BINS,), jnp.int32).at[bins].add(
        valid.astype(jnp.int32), mode="drop"
    )
    hist = jax.lax.psum(hist, axis_name)
    cdf = jnp.cumsum(hist)
    total = cdf[-1]
    # boundary k = first bin with cdf >= (k+1)/n_slabs of the mass. Computed
    # in f32 because k * total overflows int32 at fleet scale (30M gaussians
    # x 128 slabs); the ~2^-24 relative rounding only nudges LOAD BALANCE by
    # a few counts, never correctness (slab membership stays bin-aligned).
    frac = jnp.arange(1, n_slabs, dtype=jnp.float32) / n_slabs
    targets = frac * total.astype(jnp.float32)
    bounds = jnp.searchsorted(
        cdf.astype(jnp.float32), targets, side="left"
    ).astype(jnp.int32)
    return bounds


def pack_by_slab(
    payload: jax.Array,    # (n_local, 16)
    slab: jax.Array,       # (n_local,) int32 destination, n_slabs = drop
    n_slabs: int,
    send_cap: int,
):
    """Fixed-shape (n_slabs, send_cap, 16) send buffer (no duplication —
    each gaussian lives in exactly one depth slab) plus overflow count."""
    n = payload.shape[0]
    return pack_to_destinations(
        payload, slab, jnp.arange(n, dtype=jnp.int32), n_slabs, send_cap
    )


def _compose(front, back):
    """(C, logT) pair combiner; exact front-over-back alpha compositing of
    segment partials (SURVEY §5: C = C_a + T_a C_b, T = T_a T_b — log-space
    for T to match the rasterizer's carry)."""
    c_f, lt_f = front
    c_b, lt_b = back
    return c_f + jnp.exp(lt_f)[..., None] * c_b, lt_f + lt_b


def render_depth_ring(
    model: GaussianModel,
    camera: Camera,
    cfg: RasterConfig,
    sh_degree: int,
    background: jax.Array,
    n_slabs: int,
    send_cap: int,
    axis_name: str = GAUSS_AXIS,
    xla_max_chunks: int = 64,
    impl: str = "xla",
):
    """Per-device body (inside shard_map): project local shard, route
    payloads to depth-slab owners, rasterize the full grid for my slab,
    ring-compose the (C, logT) partials. Returns replicated (image, trans,
    aux)."""
    d = jax.lax.axis_index(axis_name)

    proj = project_gaussians(
        model.means, model.quats, model.log_scales, model.logit_opacities,
        model.sh, camera, cfg, sh_degree=sh_degree, alive=model.alive,
    )
    payload = make_payload(proj)                          # (n_local, 16)

    depth = jax.lax.stop_gradient(proj.depth)
    valid = proj.valid & (proj.radius > 0)
    bounds = depth_slab_bounds(depth, valid, n_slabs, axis_name)
    bins = _depth_bin(depth)
    slab = jnp.sum(
        (bins[:, None] > bounds[None, :]).astype(jnp.int32), axis=1
    )
    slab = jnp.where(valid, slab, n_slabs)                # cull -> drop

    send, pack_overflow = pack_by_slab(payload, slab, n_slabs, send_cap)
    recv = jax.lax.all_to_all(
        send, axis_name, split_axis=0, concat_axis=0, tiled=True
    )                                                     # (n_slabs, K, 16)
    flat = recv.reshape(n_slabs * send_cap, PAYLOAD_DIM)
    proj2 = payload_to_projected(flat)

    binning = bin_gaussians(
        proj2, camera.width, camera.height, cfg,
        capacity=cfg.pair_capacity(flat.shape[0]),
        impl=impl,
    )
    out = rasterize_payload(
        flat, binning, jnp.zeros((3,), jnp.float32),
        camera.width, camera.height, cfg,
        impl, xla_max_chunks=xla_max_chunks,
    )
    # The raster composited over black; recover this slab's own partials.
    log_t = jnp.log(jnp.maximum(out.transmittance, 1e-30))
    v = (out.image, log_t)

    # Ring reduction; on device i the accumulator composes slabs [i, i+k) in
    # ring order, so only device 0's wraparound-free prefix is the true
    # composite — broadcast it with a masked psum. For power-of-two D the
    # hops double: after step s, acc_i covers [i, i + 2^s), and receiving
    # acc_{i+2^s} (which covers the ADJACENT segment [i+2^s, i+2^{s+1}))
    # extends it associatively — log2(D) full-image hops instead of D-1.
    # Compositing is associative over contiguous depth segments, so the
    # doubled combine is exact, not approximate.
    acc = v
    if n_slabs & (n_slabs - 1) == 0:
        span = 1
        while span < n_slabs:
            perm = [(i, (i - span) % n_slabs) for i in range(n_slabs)]
            u = jax.lax.ppermute(acc, axis_name, perm)    # device i gets acc_{i+span}
            acc = _compose(acc, u)
            span *= 2
    else:  # any D: D-1 single rotations of the original partials
        for k in range(1, n_slabs):
            perm = [(i, (i - k) % n_slabs) for i in range(n_slabs)]
            u = jax.lax.ppermute(v, axis_name, perm)      # device i gets v_{i+k}
            acc = _compose(acc, u)
    full = jax.tree_util.tree_map(
        lambda x: jax.lax.psum(jnp.where(d == 0, x, jnp.zeros_like(x)),
                               axis_name),
        acc,
    )
    c_full, lt_full = full
    trans = jnp.exp(lt_full)
    image = c_full + trans[..., None] * background[None, None, :]

    aux = dict(
        radii=proj.radius,
        overflow=binning.overflow + pack_overflow,
        num_pairs=binning.num_pairs,
        max_chunks_needed=out.max_chunks_needed,
    )
    return image, trans, aux


def make_depth_ring_render(
    mesh: Mesh,
    cfg: RasterConfig,
    width: int,
    height: int,
    sh_degree: int,
    send_cap: Optional[int] = None,
    xla_max_chunks: int = 64,
    impl: Optional[str] = None,
):
    """Build a jit-able `f(model, camera, background) -> (image, trans)` with
    the model sharded over the mesh's `gauss` axis (use
    `gauss_shard.shard_model`). The returned image is replicated."""
    from .render import resolve_shard_impl

    impl = resolve_shard_impl(impl if impl is not None else cfg.impl)
    nd = mesh.shape[GAUSS_AXIS]

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(GAUSS_AXIS), P(), P()),
        out_specs=(P(), P(), P(GAUSS_AXIS), P()),
        check_vma=False,
    )
    def _sharded(model, camera, background):
        cap = send_cap
        if cap is None:
            # Local shard splits ~evenly over D slabs; 2x headroom.
            cap = max(2 * model.capacity // nd, 256)
        img, trans, aux = render_depth_ring(
            model, camera, cfg, sh_degree, background, nd, cap,
            xla_max_chunks=xla_max_chunks, impl=impl,
        )
        scalars = jnp.stack([
            jax.lax.psum(aux["overflow"].astype(jnp.float32), GAUSS_AXIS),
            jax.lax.pmax(
                aux["max_chunks_needed"].astype(jnp.float32), GAUSS_AXIS
            ),
        ])
        return img, trans, aux["radii"], scalars

    def f(model, camera, background, with_aux: bool = False):
        if (camera.width, camera.height) != (width, height):
            raise ValueError(
                f"camera is {camera.width}x{camera.height} but this renderer "
                f"was built for {width}x{height}"
            )
        img, trans, radii, scalars = _sharded(model, camera, background)
        if not with_aux:
            return img, trans
        aux = dict(radii=radii, overflow=scalars[0].astype(jnp.int32),
                   max_chunks_needed=scalars[1].astype(jnp.int32))
        return img, trans, aux

    return f
