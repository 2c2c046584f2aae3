"""Top-level differentiable render API.

`render(model, camera, ...)` is the rebuild of the reference's per-frame
pipeline `preprocess -> compactIdxs -> forward` (`forward.jl:35,118,163`,
driven from `examples/main.jl:30-34`) as one jit-compiled function:

  project_gaussians   (ops/projection.py, autodiff JAX)
  bin_gaussians       (ops/binning.py, stop-gradient sort/segment data)
  payload gather      (sorted by (tile, depth); VJP = deterministic scatter-add)
  rasterize           (XLA twin or fused Pallas kernels, custom VJP)

Unlike the reference there are no per-frame host->device uploads
(`forward.jl:63-69,169-173`) and no device->host sync for data-dependent
shapes (`forward.jl:139-141`): everything is static-shape and stays on
device under a single jit.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from .config import RasterConfig
from .models.gaussians import GaussianModel
from .ops.binning import bin_gaussians
from .ops.camera import Camera
from .ops.projection import make_payload, project_gaussians
from .ops.raster_dispatch import rasterize_payload


@struct.dataclass
class RenderOutput:
    image: jax.Array           # (H, W, 3)
    transmittance: jax.Array   # (H, W)
    radii: jax.Array           # (N,) int32 screen-space radius (0 = culled)
    num_pairs: jax.Array       # () int32 tile/gaussian pairs binned
    overflow: jax.Array        # () int32 pairs dropped (capacity exceeded)
    max_chunks_needed: jax.Array  # () int32 longest tile list, in chunks


def _resolve_impl(impl: str) -> str:
    if impl != "auto":
        return impl
    return "pallas" if jax.default_backend() == "tpu" else "xla"


def render(
    model: GaussianModel,
    camera: Camera,
    cfg: Optional[RasterConfig] = None,
    sh_degree: Optional[int] = None,
    background: Optional[jax.Array] = None,
    mean2d_offset: Optional[jax.Array] = None,
    impl: Optional[str] = None,
    xla_max_chunks: int = 64,
) -> RenderOutput:
    """Render a camera view of the model. Differentiable w.r.t. all model
    parameters and `mean2d_offset` (pass zeros to harvest per-gaussian
    screen-space position gradients for densification)."""
    cfg = cfg or RasterConfig()
    if sh_degree is None:
        sh_degree = model.sh_degree
    if background is None:
        background = jnp.zeros((3,), jnp.float32)
    impl = _resolve_impl(impl if impl is not None else cfg.impl)

    proj = project_gaussians(
        model.means,
        model.quats,
        model.log_scales,
        model.logit_opacities,
        model.sh,
        camera,
        cfg,
        sh_degree=sh_degree,
        alive=model.alive,
    )
    if mean2d_offset is not None:
        proj = proj.replace(mean2d=proj.mean2d + mean2d_offset)

    binning = bin_gaussians(proj, camera.width, camera.height, cfg, impl=impl)
    payload = make_payload(proj)

    out = rasterize_payload(
        payload, binning, background, camera.width, camera.height, cfg,
        impl, xla_max_chunks=xla_max_chunks,
    )

    return RenderOutput(
        image=out.image,
        transmittance=out.transmittance,
        radii=proj.radius,
        num_pairs=binning.num_pairs,
        overflow=binning.overflow,
        max_chunks_needed=out.max_chunks_needed,
    )
