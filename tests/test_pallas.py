"""Pallas kernel tests (interpreter mode on CPU — SURVEY §5: interpret mode
is the sanitizer analogue). Real-TPU execution of the same kernels is
exercised by bench.py and benchmarks/verify_tpu.py on hardware."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussiansplat_tpu.config import RasterConfig
from gaussiansplat_tpu.models import random_model
from gaussiansplat_tpu.ops import look_at
from gaussiansplat_tpu.render import render as _render

render = jax.jit(_render, static_argnames=("cfg", "sh_degree", "impl", "xla_max_chunks"))

# packed=False everywhere below: these tests check math equivalence of the
# unpacked kernels against the XLA twin. The bf16-packed fast path (the
# production default) is covered by TestPallasPacked with quantization-scale
# tolerances.
CFG = RasterConfig(tile_size=32, chunk_size=128, impl="xla", packed=False)
# Small chunks force multi-chunk segments and exercise the reverse sweep,
# boundary-chunk read-modify-write, and early exit.
CFG_SMALL_CHUNK = RasterConfig(tile_size=32, chunk_size=8, impl="xla",
                               packed=False)
# Exact-comparison variants: early exit off (trans_eps=0), because XLA never
# early-exits and a saturated tile can legitimately differ by ~trans_eps *
# remaining color; the saturation tests below cover early exit explicitly.
CFG_EXACT = RasterConfig(tile_size=32, chunk_size=128, impl="xla",
                         trans_eps=0.0, packed=False)
CFG_SMALL_CHUNK_EXACT = RasterConfig(
    tile_size=32, chunk_size=8, impl="xla", trans_eps=0.0, packed=False)
# Packed fast path (the default on TPU): 8 f32 lanes per pair, opacity/
# color/depth bf16-quantized (~0.4% relative).
CFG_PACKED = RasterConfig(tile_size=32, chunk_size=128, impl="xla",
                          trans_eps=0.0, packed=True)
CFG_PACKED_SMALL = RasterConfig(tile_size=32, chunk_size=8, impl="xla",
                                trans_eps=0.0, packed=True)


def setup_scene(n=256, seed=0, width=128, height=128, opacity=0.8):
    model = random_model(jax.random.PRNGKey(seed), n, sh_degree=1, extent=1.0,
                         opacity=opacity)
    cam = look_at(eye=(0.5, 0.3, -6.0), target=(0, 0, 0), fx=220.0, fy=220.0,
                  width=width, height=height)
    return model, cam


def assert_images_close(a, b, atol=1e-4, outlier_frac=1e-3, outlier_atol=5e-2):
    """Near-equality with a tiny outlier budget: a splat whose alpha sits
    exactly at the alpha_min cutoff can flip inclusion between the two
    implementations' differently-associated quadratic forms, legitimately
    moving a few pixels by ~alpha_min. Require all but `outlier_frac` of
    elements within `atol`, and even outliers within `outlier_atol`."""
    a, b = np.asarray(a), np.asarray(b)
    d = np.abs(a - b)
    assert d.max() <= outlier_atol, f"max diff {d.max():.3e}"
    frac = float((d > atol).mean())
    assert frac <= outlier_frac, (
        f"{frac:.2%} of elements exceed atol={atol} (max {d.max():.3e})")


class TestPallasForward:
    @pytest.mark.parametrize(
        "cfg", [CFG_EXACT, CFG_SMALL_CHUNK_EXACT], ids=["cs128", "cs8"])
    def test_matches_xla(self, cfg):
        model, cam = setup_scene()
        bg = jnp.array([0.1, 0.2, 0.3])
        ox = render(model, cam, cfg, sh_degree=1, background=bg, impl="xla",
                    xla_max_chunks=256)
        op = render(model, cam, cfg, sh_degree=1, background=bg,
                    impl="pallas_interpret")
        # identical math, modulo matmul-vs-cumsum association and early exit
        assert_images_close(op.image, ox.image, atol=5e-4)
        assert_images_close(op.transmittance, ox.transmittance, atol=5e-4)

    def test_saturated_early_exit(self):
        # near-opaque gaussians saturate tiles; pallas early-exits, xla does
        # not — results must agree within trans_eps.
        model, cam = setup_scene(n=512, opacity=0.99)
        bg = jnp.zeros(3)
        ox = render(model, cam, CFG_SMALL_CHUNK, sh_degree=1, background=bg,
                    impl="xla", xla_max_chunks=256)
        op = render(model, cam, CFG_SMALL_CHUNK, sh_degree=1, background=bg,
                    impl="pallas_interpret")
        assert float(ox.transmittance.min()) < 1e-4  # scene actually saturates
        assert_images_close(op.image, ox.image, atol=2e-3)

    def test_nonsquare(self):
        model, _ = setup_scene(n=128)
        cam = look_at(eye=(0, 0, -6), target=(0, 0, 0), fx=200, fy=200,
                      width=100, height=72)
        bg = jnp.array([0.5, 0.0, 0.25])
        ox = render(model, cam, CFG, sh_degree=1, background=bg, impl="xla")
        op = render(model, cam, CFG, sh_degree=1, background=bg,
                    impl="pallas_interpret")
        assert op.image.shape == (72, 100, 3)
        assert_images_close(op.image, ox.image, atol=5e-4)

    def test_empty_scene(self):
        model, cam = setup_scene(n=4)
        model = model.replace(alive=jnp.zeros_like(model.alive))
        bg = jnp.array([0.25, 0.5, 0.75])
        op = render(model, cam, CFG, sh_degree=1, background=bg,
                    impl="pallas_interpret")
        np.testing.assert_allclose(
            op.image, jnp.broadcast_to(bg, op.image.shape), atol=1e-6)


class TestPallasPacked:
    """The bf16-packed fast path vs the XLA twin: identical math except
    opacity/color/depth are bf16-rounded (|Δ| ≲ 0.4% relative), so images
    and gradients must agree to quantization scale, not machine epsilon."""

    @pytest.mark.parametrize(
        "cfg", [CFG_PACKED, CFG_PACKED_SMALL], ids=["cs128", "cs8"])
    def test_forward_matches_xla(self, cfg):
        model, cam = setup_scene()
        bg = jnp.array([0.1, 0.2, 0.3])
        ox = render(model, cam, cfg, sh_degree=1, background=bg, impl="xla",
                    xla_max_chunks=256)
        op = render(model, cam, cfg, sh_degree=1, background=bg,
                    impl="pallas_interpret")
        assert_images_close(op.image, ox.image, atol=8e-3, outlier_atol=8e-2)
        assert_images_close(op.transmittance, ox.transmittance, atol=8e-3,
                            outlier_atol=8e-2)

    def test_packed_vs_unpacked_pallas(self):
        """Packing is the ONLY difference between the two pallas paths."""
        model, cam = setup_scene(n=192)
        bg = jnp.array([0.4, 0.1, 0.2])
        o_u = render(model, cam, CFG_EXACT, sh_degree=1, background=bg,
                     impl="pallas_interpret")
        o_p = render(model, cam, CFG_PACKED, sh_degree=1, background=bg,
                     impl="pallas_interpret")
        assert_images_close(o_p.image, o_u.image, atol=8e-3, outlier_atol=8e-2)

    def test_grads_match_xla(self):
        model, cam = setup_scene(n=96, width=64, height=64)
        target = jax.random.uniform(jax.random.PRNGKey(7), (64, 64, 3))
        bg = jnp.array([0.3, 0.1, 0.6])

        def make_loss(impl):
            def loss(params):
                m = model.with_params(params)
                out = render(m, cam, CFG_PACKED, sh_degree=1, background=bg,
                             impl=impl, xla_max_chunks=256)
                return (jnp.mean((out.image - target) ** 2)
                        + 0.1 * jnp.mean(out.transmittance))
            return loss

        p = model.trainable()
        g_xla = jax.jit(jax.grad(make_loss("xla")))(p)
        g_pal = jax.jit(jax.grad(make_loss("pallas_interpret")))(p)
        for k in p:
            gx, gp = np.asarray(g_xla[k]), np.asarray(g_pal[k])
            assert np.isfinite(gp).all(), k
            scale = np.abs(gx).max() + 1e-8
            np.testing.assert_allclose(gp / scale, gx / scale, atol=2e-2,
                                       err_msg=f"grad mismatch for {k}")

    def test_background_grad(self):
        model, cam = setup_scene(n=64, width=64, height=64)

        def loss(bg, impl):
            out = render(model, cam, CFG_PACKED, sh_degree=1, background=bg,
                         impl=impl)
            return jnp.sum(out.image * jnp.arange(3.0))

        bg = jnp.array([0.2, 0.4, 0.6])
        g_x = jax.jit(jax.grad(lambda b: loss(b, "xla")))(bg)
        g_p = jax.jit(jax.grad(lambda b: loss(b, "pallas_interpret")))(bg)
        np.testing.assert_allclose(g_p, g_x, rtol=2e-2, atol=2e-3)

    def test_pack_unpack_roundtrip(self):
        from gaussiansplat_tpu.ops.pallas.common import (
            pack_bf16_pair, unpack_bf16_pair)

        x = jnp.array([0.0, 1.0, -0.5, 3.14159, 1e-8, -1e8, 0.999], jnp.float32)
        y = jnp.array([2.0, -1.0, 0.25, 1e-20, 7.5, 0.001, -0.999], jnp.float32)
        xr, yr = unpack_bf16_pair(pack_bf16_pair(x, y))
        np.testing.assert_array_equal(
            np.asarray(xr), np.asarray(x.astype(jnp.bfloat16).astype(jnp.float32)))
        np.testing.assert_array_equal(
            np.asarray(yr), np.asarray(y.astype(jnp.bfloat16).astype(jnp.float32)))


class TestPallasExpand:
    """The pair-expansion kernel must reproduce the XLA delta-scatter
    expansion bit-exactly: same keys, same pre-sort pair positions."""

    def _proj(self, n=300, width=160, height=96, seed=3):
        from gaussiansplat_tpu.ops.projection import project_gaussians

        model, _ = setup_scene(n=n, seed=seed, width=width, height=height)
        cam = look_at(eye=(0.5, 0.3, -6.0), target=(0, 0, 0), fx=220.0,
                      fy=220.0, width=width, height=height)
        proj = project_gaussians(
            model.means, model.quats, model.log_scales,
            model.logit_opacities, model.sh, cam, CFG, sh_degree=1,
            alive=model.alive,
        )
        return proj, cam

    @pytest.mark.parametrize("capacity", [None, 256], ids=["roomy", "overflow"])
    def test_matches_xla_expansion(self, capacity):
        from gaussiansplat_tpu.ops.binning import bin_gaussians

        proj, cam = self._proj()
        kw = dict(capacity=capacity) if capacity else {}
        bx = jax.jit(
            lambda p: bin_gaussians(p, cam.width, cam.height, CFG,
                                    impl="xla", **kw))(proj)
        bp = jax.jit(
            lambda p: bin_gaussians(p, cam.width, cam.height, CFG,
                                    impl="pallas_interpret", **kw))(proj)
        assert int(bx.num_pairs) > 0
        np.testing.assert_array_equal(bp.num_pairs, bx.num_pairs)
        np.testing.assert_array_equal(bp.overflow, bx.overflow)
        np.testing.assert_array_equal(bp.depth_order, bx.depth_order)
        np.testing.assert_array_equal(bp.tile_starts, bx.tile_starts)
        npairs = int(bx.num_pairs)
        np.testing.assert_array_equal(
            bp.sorted_tiles[:npairs], bx.sorted_tiles[:npairs])
        np.testing.assert_array_equal(
            bp.sorted_ranks[:npairs], bx.sorted_ranks[:npairs])
        np.testing.assert_array_equal(
            bp.sorted_pos[:npairs], bx.sorted_pos[:npairs])

    def test_strip_mode(self):
        from gaussiansplat_tpu.ops.binning import bin_gaussians

        proj, cam = self._proj()
        f = lambda p, impl: bin_gaussians(
            p, cam.width, cam.height, CFG, tile_row0=jnp.int32(1),
            tile_rows=2, impl=impl)
        bx = jax.jit(lambda p: f(p, "xla"))(proj)
        bp = jax.jit(lambda p: f(p, "pallas_interpret"))(proj)
        assert int(bx.num_pairs) > 0
        npairs = int(bx.num_pairs)
        np.testing.assert_array_equal(bp.tile_starts, bx.tile_starts)
        np.testing.assert_array_equal(
            bp.sorted_tiles[:npairs], bx.sorted_tiles[:npairs])
        np.testing.assert_array_equal(
            bp.sorted_ranks[:npairs], bx.sorted_ranks[:npairs])


    def test_unpacked_key_regime(self):
        """tile_bits + rank_bits > 31 (the BASELINE config-3..5 scale class):
        the expand kernel must emit separate tile/rank streams that the
        stable tile-keyed sort orders identically to the XLA fallback.

        2.2M mostly-invalid gaussians push rank_bits to 22 while the 32x16
        tile grid keeps tile_bits at 10 (sum 32 > 31) and the rect pack at
        22 bits; capacity is pinned small so the interpret-mode kernel runs
        few grid steps."""
        import sys
        sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
        from test_binning_fallbacks import _fake_proj
        from gaussiansplat_tpu.ops.binning import bin_gaussians
        from gaussiansplat_tpu.config import RasterConfig

        n, width, height, ts = 2_200_000, 1024, 512, 32
        cfg = RasterConfig(tile_size=ts, impl="xla")
        proj, *_ = _fake_proj(n, width, height, seed=5, n_valid=64,
                              max_r=width / 16)
        f = lambda p, impl: bin_gaussians(p, width, height, cfg,
                                          capacity=4096, impl=impl)
        bx = jax.jit(lambda p: f(p, "xla"))(proj)
        bp = jax.jit(lambda p: f(p, "pallas_interpret"))(proj)
        assert int(bx.num_pairs) > 0
        npairs = int(bx.num_pairs)
        np.testing.assert_array_equal(bp.num_pairs, bx.num_pairs)
        np.testing.assert_array_equal(bp.overflow, bx.overflow)
        np.testing.assert_array_equal(bp.tile_starts, bx.tile_starts)
        np.testing.assert_array_equal(
            bp.sorted_tiles[:npairs], bx.sorted_tiles[:npairs])
        np.testing.assert_array_equal(
            bp.sorted_ranks[:npairs], bx.sorted_ranks[:npairs])
        np.testing.assert_array_equal(
            bp.sorted_pos[:npairs], bx.sorted_pos[:npairs])


class TestPallasBackward:
    @pytest.mark.parametrize(
        "cfg", [CFG_EXACT, CFG_SMALL_CHUNK_EXACT], ids=["cs128", "cs8"])
    def test_grads_match_xla(self, cfg):
        """Hand-derived Pallas VJP vs autodiff of the XLA twin."""
        model, cam = setup_scene(n=96, width=64, height=64)
        target = jax.random.uniform(jax.random.PRNGKey(7), (64, 64, 3))
        bg = jnp.array([0.3, 0.1, 0.6])

        def make_loss(impl):
            def loss(params):
                m = model.with_params(params)
                out = render(m, cam, cfg, sh_degree=1, background=bg,
                             impl=impl, xla_max_chunks=256)
                # touch both outputs so dtrans cotangent is nonzero
                return (jnp.mean((out.image - target) ** 2)
                        + 0.1 * jnp.mean(out.transmittance))
            return loss

        p = model.trainable()
        g_xla = jax.jit(jax.grad(make_loss("xla")))(p)
        g_pal = jax.jit(jax.grad(make_loss("pallas_interpret")))(p)
        for k in p:
            gx, gp = np.asarray(g_xla[k]), np.asarray(g_pal[k])
            assert np.isfinite(gp).all(), k
            scale = np.abs(gx).max() + 1e-8
            np.testing.assert_allclose(gp / scale, gx / scale, atol=2e-3,
                                       err_msg=f"grad mismatch for {k}")

    def test_background_grad(self):
        model, cam = setup_scene(n=64, width=64, height=64)

        def loss(bg, impl):
            out = render(model, cam, CFG, sh_degree=1, background=bg, impl=impl)
            return jnp.sum(out.image * jnp.arange(3.0))

        bg = jnp.array([0.2, 0.4, 0.6])
        g_x = jax.jit(jax.grad(lambda b: loss(b, "xla")))(bg)
        g_p = jax.jit(jax.grad(lambda b: loss(b, "pallas_interpret")))(bg)
        np.testing.assert_allclose(g_p, g_x, rtol=1e-4, atol=1e-4)

    def test_saturated_grads(self):
        """Early-exited tiles must still produce correct (near-equal) grads."""
        model, cam = setup_scene(n=256, width=64, height=64, opacity=0.99)
        target = jnp.zeros((64, 64, 3))

        def make_loss(impl):
            def loss(params):
                m = model.with_params(params)
                out = render(m, cam, CFG_SMALL_CHUNK, sh_degree=1,
                             background=jnp.zeros(3), impl=impl,
                             xla_max_chunks=256)
                return jnp.mean((out.image - target) ** 2)
            return loss

        p = model.trainable()
        g_xla = jax.jit(jax.grad(make_loss("xla")))(p)
        g_pal = jax.jit(jax.grad(make_loss("pallas_interpret")))(p)
        for k in p:
            gx, gp = np.asarray(g_xla[k]), np.asarray(g_pal[k])
            scale = np.abs(gx).max() + 1e-8
            np.testing.assert_allclose(gp / scale, gx / scale, atol=5e-3,
                                       err_msg=f"grad mismatch for {k}")
