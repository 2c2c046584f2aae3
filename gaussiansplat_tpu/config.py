"""Configuration dataclasses for the TPU-native Gaussian Splatting framework.

The reference keeps its "config" as hardcoded constants scattered through the
code (tile sizes in ``examples/main.jl:9-11``, camera intrinsics in
``camera.jl:29-33``, covariance dilation 0.3 in ``projection.jl:150``, the 3
sigma bounding-box radius in ``boundingbox.jl:23``, loss mix in
``loss.jl:67``).  Here everything lives in explicit dataclasses with CLI-able
fields; all values that shape compiled programs are static Python ints so XLA
sees static shapes.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class RasterConfig:
    """Static configuration of the tile rasterizer.

    Unlike the reference — which allocates a dense (tiles_x, tiles_y, N) hit
    bitmap (``forward.jl:120``) and sizes the per-tile lists from a
    device->host ``maximum`` round trip (``forward.jl:139-142``, a
    data-dependent shape) — every shape here is static: the duplicated
    (tile, depth)-keyed pair list has fixed capacity ``max_pairs`` and an
    overflow counter is reported as a metric instead of reallocating.
    """

    # Pixel tile edge. 32x32 = 1024 px = a full (8, 128) f32 vector register
    # layout on the VPU, so per-gaussian work vectorizes with no lane waste.
    # (The reference uses 16x16 CUDA blocks, `examples/main.jl:9`.)
    tile_size: int = 32

    # Gaussians are streamed through a tile in depth-ordered chunks of this
    # many; compositing within a chunk is evaluated with an MXU matmul against
    # a triangular matrix (see ops/tile_raster.py). 128 = one MXU edge.
    chunk_size: int = 128

    # Static capacity of the duplicated (tile, depth, gaussian) pair list,
    # expressed as a multiple of N (rounded up to a multiple of chunk_size).
    pairs_per_gaussian: float = 8.0

    # Hard cap on tiles a single gaussian may be duplicated into; gaussians
    # covering more tiles are clamped (they are extremely rare and huge).
    max_tiles_per_gaussian: int = 1024

    # EWA low-pass dilation added to the 2x2 screen-space covariance
    # (reference: +0.3 at `projection.jl:150`; same constant as INRIA 3DGS).
    cov2d_dilation: float = 0.3

    # Bounding radius in standard deviations (`boundingbox.jl:23` uses 3).
    # Splat support is gated EXPLICITLY at q <= sigma_radius^2 in every
    # rasterizer (pallas kernels, XLA twin, oracle), so the rendered
    # footprint is the exact sigma ellipse regardless of binning rects.
    sigma_radius: float = 3.0

    # Exact per-tile support culling during binning: keep only the tiles a
    # splat's visible-support ellipse {q <= min(sigma_radius^2,
    # 2 ln(op/alpha_min))} actually touches (output-exact given the q/alpha
    # gates above; see ops/binning._tile_survivor_mask). Cuts every
    # pair-proportional cost; disable only for debugging.
    tile_cull: bool = True

    # Alpha handling, matching INRIA/gsplat semantics: splats with
    # alpha < alpha_min are skipped, alpha is clamped to alpha_max, and a
    # pixel tile stops compositing once every pixel's transmittance is below
    # trans_eps. (The reference forward has no early termination and no
    # clamp, `splat.jl:246-259`.)
    alpha_min: float = 1.0 / 255.0
    alpha_max: float = 0.999
    trans_eps: float = 1e-4

    # Near-plane cull depth (world units), INRIA uses 0.2.
    near: float = 0.2
    far: float = 1e6

    # 'pallas' (TPU fused kernels), 'xla' (pure-JAX same algorithm — used on
    # CPU meshes and as the differentiable cross-check), or 'auto'.
    impl: str = "auto"

    # Pallas-only: move pairs through the pipeline as 8 packed f32 lanes
    # (mean/conic exact f32; opacity/color/depth as bf16 bit-pairs) instead
    # of 16 — halves the sorted gather, both kernels' HBM streams, and the
    # gradient reduction. Costs ~0.4% relative quantization on color/opacity
    # (far below rendering/SGD noise). Set False for bit-exact parity with
    # the XLA twin (tests, debugging).
    packed: bool = True

    def pair_capacity(self, num_gaussians: int) -> int:
        cap = int(self.pairs_per_gaussian * num_gaussians)
        cap = max(cap, 4 * self.chunk_size)
        # Round to a multiple of chunk_size so chunk loops never straddle.
        return ((cap + self.chunk_size - 1) // self.chunk_size) * self.chunk_size


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters (standard 3DGS schedule).

    The reference sketches but never completes a training loop
    (``train.jl:16-60``: loss call, backward and SGD update are all commented
    out and the loop condition never updates). Values here follow the INRIA
    paper / gsplat defaults instead.
    """

    iterations: int = 30_000
    # Loss mix: L = (1 - lambda) * L1 + lambda * DSSIM.  (Reference used 0.1
    # at `loss.jl:67`; the standard value is 0.2.)
    ssim_lambda: float = 0.2

    # Learning rates (per parameter group, as in 3DGS).
    lr_means: float = 1.6e-4          # scaled by scene extent; exp-decayed
    lr_means_final: float = 1.6e-6
    lr_quats: float = 1e-3
    lr_scales: float = 5e-3
    lr_opacities: float = 5e-2
    lr_sh_dc: float = 2.5e-3
    lr_sh_rest: float = 2.5e-3 / 20.0

    # Adaptive density control.
    densify_start: int = 500
    densify_end: int = 15_000
    densify_every: int = 100
    densify_grad_thresh: float = 2e-4     # mean 2D position-grad norm
    # When set, each densify pass derives its own grad threshold from the
    # CURRENT avg-grad distribution: the top `fraction` of eligible (alive,
    # visible this window) gaussians clone/split. The absolute
    # densify_grad_thresh is ignored. Robust where the absolute knob is
    # fragile — the natural units of the 2D position grad depend on loss
    # normalization and render resolution, so a threshold tuned on one
    # scene/scale silently disables density control on another (budget-
    # targeted control, cf. the strategy variants in gsplat's docs).
    densify_target_fraction: Optional[float] = None
    densify_scale_thresh: float = 0.01    # x scene extent: clone below, split above
    split_factor: float = 1.6
    prune_opacity: float = 0.005
    prune_radius_frac: float = 0.1        # x scene extent, world-space prune
    # Screen-space big prune threshold as a fraction of max(W, H): the
    # trainer derives the pixel threshold from the actual render resolution.
    # 0.15 prunes only degenerately large screen-filling splats. (3DGS's
    # hardcoded 20 px ~= 0.025 at 800 px is far more aggressive and only
    # survives its 30k-iteration schedule where densification continuously
    # replenishes what the prune removes — measured here: at 7k iterations
    # it killed 97% of a converged 19k-gaussian scene in one pass.)
    prune_screen_frac: float = 0.15
    opacity_reset_every: int = 3_000
    opacity_reset_value: float = 0.01

    # SH degree ramps up one degree every `sh_increase_every` iterations.
    sh_degree: int = 3
    sh_increase_every: int = 1_000

    white_background: bool = False
    random_background: bool = False

    eval_every: int = 1_000
    checkpoint_every: int = 5_000
    log_every: int = 100
    seed: int = 0


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for multi-chip / multi-host runs.

    The reference is strictly single GPU (no NCCL/MPI anywhere); scaling here
    is via a `jax.sharding.Mesh` with a data axis (views; gradients psum over
    ICI/DCN) and a tile axis (image tiles sharded across chips).
    """

    data_axis: str = "data"
    tile_axis: str = "tile"
    data: int = 1
    tile: int = 1

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.data, self.tile)
