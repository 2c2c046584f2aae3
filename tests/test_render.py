"""End-to-end render tests: binning invariants, oracle vs tiled-XLA parity,
and gradients through the full pipeline (SURVEY §4 proposed strategy (a)-(c))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussiansplat_tpu.config import RasterConfig
from gaussiansplat_tpu.models import random_model
from gaussiansplat_tpu.ops import (
    bin_gaussians,
    look_at,
    project_gaussians,
    render_oracle,
    tile_grid,
)
from gaussiansplat_tpu.render import render

CFG = RasterConfig(tile_size=32, chunk_size=128, impl="xla")

render = jax.jit(render, static_argnames=("cfg", "sh_degree", "impl", "xla_max_chunks"))
render_oracle = jax.jit(render_oracle, static_argnames=("width", "height", "cfg", "respect_tiles"))


def setup_scene(n=256, seed=0, width=128, height=128, sh_degree=1):
    model = random_model(jax.random.PRNGKey(seed), n, sh_degree=sh_degree, extent=1.0)
    cam = look_at(eye=(0.5, 0.3, -6.0), target=(0, 0, 0), fx=220.0, fy=220.0,
                  width=width, height=height)
    return model, cam


@jax.jit
def project(model, cam):
    return project_gaussians(model.means, model.quats, model.log_scales,
                             model.logit_opacities, model.sh, cam, CFG,
                             sh_degree=1, alive=model.alive)


bin_gaussians = jax.jit(bin_gaussians, static_argnames=("width", "height", "cfg"))


class TestBinning:
    def test_segments_partition_and_order(self):
        model, cam = setup_scene()
        proj = project(model, cam)
        b = bin_gaussians(proj, cam.width, cam.height, CFG)
        starts = np.asarray(b.tile_starts)
        tiles = np.asarray(b.sorted_tiles)
        n_pairs = int(b.num_pairs)
        assert int(b.overflow) == 0
        assert starts[0] == 0 and starts[-1] == n_pairs
        assert (np.diff(starts) >= 0).all()
        # sorted by tile, and within tile by depth
        assert (np.diff(tiles) >= 0).all()
        depth = np.asarray(proj.depth)[np.asarray(b.sorted_ids)]
        for t in np.unique(tiles[:n_pairs]):
            seg = depth[starts[t]:starts[t + 1]]
            assert (np.diff(seg) >= -1e-6).all(), f"tile {t} not depth sorted"

    def test_pairs_match_bruteforce(self):
        # The brute-force oracle enumerates the DENSE rect, so run with the
        # tile-survivor cull off; the cull's own evidence is the
        # output-exactness test below.
        cfg_nocull = RasterConfig(tile_size=32, chunk_size=128, impl="xla",
                                  tile_cull=False)
        model, cam = setup_scene(n=64)
        proj = project(model, cam)
        b = bin_gaussians(proj, cam.width, cam.height, cfg_nocull)
        tiles_x, tiles_y = tile_grid(cam.width, cam.height, CFG.tile_size)
        # brute force expected pair set (exact per-axis ellipse AABB)
        mean2d = np.asarray(proj.mean2d)
        radius_xy = np.asarray(proj.radius_xy)
        valid = np.asarray(proj.valid)
        expect = set()
        for i in range(64):
            rx, ry = radius_xy[i]
            if not valid[i] or rx <= 0 or ry <= 0:
                continue
            xmn = max(0, int(np.floor((mean2d[i, 0] - rx) / CFG.tile_size)))
            ymn = max(0, int(np.floor((mean2d[i, 1] - ry) / CFG.tile_size)))
            xmx = min(tiles_x, int(np.floor((mean2d[i, 0] + rx) / CFG.tile_size)) + 1)
            ymx = min(tiles_y, int(np.floor((mean2d[i, 1] + ry) / CFG.tile_size)) + 1)
            for ty in range(ymn, ymx):
                for tx in range(xmn, xmx):
                    expect.add((ty * tiles_x + tx, i))
        got = set()
        n_pairs = int(b.num_pairs)
        st = np.asarray(b.sorted_tiles)[:n_pairs]
        si = np.asarray(b.sorted_ids)[:n_pairs]
        for t, i in zip(st, si):
            got.add((int(t), int(i)))
        assert got == expect

    def test_overflow_counted(self):
        model, cam = setup_scene(n=256)
        small = RasterConfig(tile_size=32, chunk_size=32,
                             pairs_per_gaussian=0.125)  # 128-pair capacity
        proj = project(model, cam)
        b = bin_gaussians(proj, cam.width, cam.height, small)
        assert int(b.overflow) > 0
        assert int(b.num_pairs) == b.capacity

    def test_tile_cull_output_exact(self):
        # The survivor mask only drops tiles where every pixel fails the
        # rasterizer's q/alpha gates, whose contributions are EXACTLY zero
        # (ops/tile_raster.py live mask), so culling must not change the
        # image at all — while measurably shrinking the pair list.
        cfg_cull = RasterConfig(tile_size=32, chunk_size=128, impl="xla",
                                tile_cull=True)
        cfg_nocull = RasterConfig(tile_size=32, chunk_size=128, impl="xla",
                                  tile_cull=False)
        bg = jnp.array([0.05, 0.1, 0.15])
        for seed in (0, 1):
            model, cam = setup_scene(n=256, seed=seed)
            proj = project(model, cam)
            b_on = bin_gaussians(proj, cam.width, cam.height, cfg_cull)
            b_off = bin_gaussians(proj, cam.width, cam.height, cfg_nocull)
            assert int(b_on.num_pairs) < int(b_off.num_pairs), \
                "cull removed nothing — test scene too easy"
            out_on = render(model, cam, cfg_cull, sh_degree=1,
                            background=bg, impl="xla")
            out_off = render(model, cam, cfg_nocull, sh_degree=1,
                             background=bg, impl="xla")
            # Culled pairs contribute exactly 0, but removing them shifts the
            # chunk boundaries of the compositing reduction, reassociating
            # f32 sums — bounded by a few ULP. A wrongly-culled VISIBLE tile
            # would move pixels by >= alpha_min * color ~ 4e-3, 4 orders of
            # magnitude above this tolerance.
            np.testing.assert_allclose(
                np.asarray(out_on.image), np.asarray(out_off.image),
                atol=5e-7, rtol=0)
            np.testing.assert_allclose(
                np.asarray(out_on.transmittance),
                np.asarray(out_off.transmittance), atol=5e-7, rtol=0)


class TestTiledVsOracle:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_forward_matches_oracle(self, seed):
        model, cam = setup_scene(n=256, seed=seed)
        bg = jnp.array([0.1, 0.2, 0.3])
        proj = project(model, cam)
        img_o, trans_o = render_oracle(proj, cam.width, cam.height, CFG, bg)
        out = render(model, cam, CFG, sh_degree=1, background=bg, impl="xla")
        # Tolerance note: borderline splats at the alpha_min cutoff can flip
        # inclusion between the two paths (local vs global pixel-coordinate
        # rounding), bounding the per-pixel diff by ~alpha_min.
        np.testing.assert_allclose(out.image, img_o, atol=5e-3)
        assert float(jnp.abs(out.image - img_o).mean()) < 3e-4
        np.testing.assert_allclose(out.transmittance, trans_o, atol=5e-3)
        assert int(out.max_chunks_needed) <= 64

    def test_nonsquare_image(self):
        model, _ = setup_scene(n=128)
        cam = look_at(eye=(0, 0, -6), target=(0, 0, 0), fx=200, fy=200,
                      width=100, height=72)  # not tile multiples
        bg = jnp.zeros(3)
        proj = project(model, cam)
        img_o, _ = render_oracle(proj, cam.width, cam.height, CFG, bg)
        out = render(model, cam, CFG, sh_degree=1, background=bg, impl="xla")
        assert out.image.shape == (72, 100, 3)
        np.testing.assert_allclose(out.image, img_o, atol=5e-3)

    @pytest.mark.parametrize("seed", [0, 1])
    def test_matrix_oracle_matches_scan_oracle(self, seed):
        """The batched matrix oracle (GT renderer of the bundled quality
        benchmark) against the sequential-scan oracle: same alpha gates,
        same compositing, independent evaluation orders. The scan oracle
        restricts splats to their bounding tiles (respect_tiles) while the
        matrix oracle uses the pure ellipse support, but both gates zero the
        same contributions, so agreement is to summation tolerance."""
        from gaussiansplat_tpu.ops import render_oracle_full

        model, cam = setup_scene(n=256, seed=seed, width=120, height=88)
        bg = jnp.array([0.3, 0.15, 0.05])
        proj = project(model, cam)
        img_s, trans_s = render_oracle(proj, cam.width, cam.height, CFG, bg)
        img_m, trans_m = jax.jit(
            lambda p: render_oracle_full(p, cam.width, cam.height, CFG, bg,
                                         pixel_chunk=512)
        )(proj)
        np.testing.assert_allclose(np.asarray(img_m), np.asarray(img_s),
                                   atol=1e-5, rtol=0)
        np.testing.assert_allclose(np.asarray(trans_m), np.asarray(trans_s),
                                   atol=1e-5, rtol=0)

    def test_empty_scene_is_background(self):
        model, cam = setup_scene(n=4)
        model = model.replace(alive=jnp.zeros_like(model.alive))
        bg = jnp.array([0.25, 0.5, 0.75])
        out = render(model, cam, CFG, sh_degree=1, background=bg, impl="xla")
        np.testing.assert_allclose(out.image, jnp.broadcast_to(bg, out.image.shape), atol=1e-6)
        np.testing.assert_allclose(out.transmittance, 1.0, atol=1e-6)


class TestGradients:
    def test_grads_match_oracle(self):
        """Full-pipeline parameter gradients vs the oracle renderer."""
        model, cam = setup_scene(n=64, width=64, height=64)
        bg = jnp.zeros(3)
        target = jax.random.uniform(jax.random.PRNGKey(9), (64, 64, 3))

        def loss_tiled(params):
            m = model.with_params(params)
            out = render(m, cam, CFG, sh_degree=1, background=bg, impl="xla")
            return jnp.mean((out.image - target) ** 2)

        def loss_oracle(params):
            m = model.with_params(params)
            proj = project(m, cam)
            img, _ = render_oracle(proj, cam.width, cam.height, CFG, bg)
            return jnp.mean((img - target) ** 2)

        p = model.trainable()
        g_tiled = jax.jit(jax.grad(loss_tiled))(p)
        g_oracle = jax.jit(jax.grad(loss_oracle))(p)
        for k in p:
            gt, go = np.asarray(g_tiled[k]), np.asarray(g_oracle[k])
            assert np.isfinite(gt).all(), k
            scale = np.abs(go).max() + 1e-8
            np.testing.assert_allclose(gt / scale, go / scale, atol=5e-3,
                                       err_msg=f"grad mismatch for {k}")

    def test_finite_difference(self):
        """Spot finite-difference check through the tiled path."""
        model, cam = setup_scene(n=16, width=64, height=64)
        bg = jnp.zeros(3)

        def loss(dc):
            m = model.replace(sh_dc=dc)
            out = render(m, cam, CFG, sh_degree=1, background=bg, impl="xla")
            return jnp.sum(out.image)

        g = jax.jit(jax.grad(loss))(dc_init := model.sh_dc)

        # Finite differences on the f32 renderer need an f64 reduction on the
        # host and a generous step to rise above summation noise.
        def loss64(dc):
            m = model.replace(sh_dc=dc)
            out = render(m, cam, CFG, sh_degree=1, background=bg, impl="xla")
            return np.asarray(out.image, np.float64).sum()

        eps = 1e-2
        for probe in [(3, 1), (7, 2)]:  # sh_dc is flat (N, 3)
            e = jnp.zeros_like(dc_init).at[probe].set(eps)
            fd = (loss64(dc_init + e) - loss64(dc_init - e)) / (2 * eps)
            np.testing.assert_allclose(g[probe], fd, rtol=7e-2, atol=1e-3)
