"""Real-hardware correctness gate: run the Pallas kernels (packed and
unpacked) on the actual TPU and compare images AND gradients against the XLA
twin on the same chip. The interpreter-mode tests (tests/test_pallas.py)
validate the kernel math; this validates the Mosaic lowering — DMA
alignment, semaphore discipline, bit ops, early exit — which the interpreter
cannot.

    python benchmarks/verify_tpu.py            # exits nonzero on mismatch
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/gsplat_tpu_cache"),
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def check(name, got, want, atol, outlier_frac=1e-3, outlier_atol=None):
    got, want = np.asarray(got), np.asarray(want)
    d = np.abs(got - want)
    frac = float((d > atol).mean())
    cap = outlier_atol if outlier_atol is not None else 10 * atol
    ok = d.max() <= cap and frac <= outlier_frac
    print(f"  {name:34s} max|diff|={d.max():.3e} frac>{atol:g}={frac:.2e} "
          f"{'OK' if ok else 'FAIL'}")
    return ok


def main():
    from gaussiansplat_tpu.config import RasterConfig
    from gaussiansplat_tpu.models import random_model
    from gaussiansplat_tpu.ops import look_at
    from gaussiansplat_tpu.render import render
    from gaussiansplat_tpu.train.loss import photometric_loss

    backend = jax.default_backend()
    print(f"backend={backend}")
    if backend != "tpu":
        print("not a TPU — nothing to verify")
        return 0

    model = random_model(jax.random.PRNGKey(0), 20000, sh_degree=2,
                         extent=1.0, opacity=0.8, scale_range=(0.01, 0.03))
    cam = look_at(eye=(0.3, -0.2, -5.0), target=(0, 0, 0), fx=500.0, fy=500.0,
                  width=512, height=384)
    bg = jnp.array([0.2, 0.1, 0.3])
    target = jax.random.uniform(jax.random.PRNGKey(1), (384, 512, 3))
    params = model.trainable()

    # Gradient parity is gated with LINEAR cotangents (a sum loss): the
    # cotangent field is then independent of the rendered image, so the
    # comparison isolates kernel + gradient-reduction correctness. Gating
    # through the photometric loss instead measures OBJECTIVE SENSITIVITY,
    # not correctness: the two paths' images differ (bf16 payload
    # quantization on the packed path), L1's subgradient flips sign wherever
    # |img - target| < the image diff, and DSSIM's gradient has ~1/c2^2
    # curvature in flat windows — together these turn a 2.6e-3 image diff
    # into unbounded-looking grad outliers on a fraction of gaussians
    # (measured: sum-loss diffs ~4e-3 scaled while photometric diffs on the
    # SAME kernels draw up to ~1e+2 scaled — pure evaluation-point effects;
    # CPU-interpret and TPU agree).
    def run(impl, packed, exact, loss_kind="sum"):
        cfg = RasterConfig(packed=packed,
                           trans_eps=0.0 if exact else 1e-4)

        @jax.jit
        def fwd(p):
            m = model.with_params(p)
            out = render(m, cam, cfg, sh_degree=2, background=bg, impl=impl,
                         xla_max_chunks=512)
            return out.image, out.transmittance

        @jax.jit
        def grad(p):
            def loss(p):
                m = model.with_params(p)
                out = render(m, cam, cfg, sh_degree=2, background=bg,
                             impl=impl, xla_max_chunks=512)
                if loss_kind == "sum":
                    return jnp.sum(out.image * target)
                return photometric_loss(out.image, target, 0.2)
            return jax.grad(loss)(p)

        img, trans = fwd(params)
        g = grad(params)
        return (np.asarray(img), np.asarray(trans),
                {k: np.asarray(v) for k, v in g.items()})

    print("compiling/running xla twin ...")
    xi, xt, xg = run("xla", packed=False, exact=True)
    ok = True

    print("pallas UNPACKED vs xla (identical math, linear cotangents):")
    pi, pt, pg = run("pallas", packed=False, exact=True)
    ok &= check("image", pi, xi, 5e-4)
    ok &= check("transmittance", pt, xt, 5e-4)
    for k in xg:
        # Color-channel pair grads go through 16-bit Dekker-split matmuls
        # whose dropped lo*lo term is amplified by sign cancellation across
        # the 1024-pixel reduction: occasional e-2-scale outliers are the
        # expected numerical envelope, not a lowering bug.
        scale = np.abs(xg[k]).max() + 1e-8
        ok &= check(f"grad[{k}]", pg[k] / scale, xg[k] / scale, 2e-3,
                    outlier_atol=6e-2)

    print("pallas PACKED vs xla (bf16 color/opacity quantization, "
          "linear cotangents):")
    qi, qt, qg = run("pallas", packed=True, exact=True)
    ok &= check("image", qi, xi, 8e-3)
    ok &= check("transmittance", qt, xt, 8e-3)
    for k in xg:
        scale = np.abs(xg[k]).max() + 1e-8
        ok &= check(f"grad[{k}]", qg[k] / scale, xg[k] / scale, 2e-2)

    # Photometric integration smoke on the exact (unpacked) path: images
    # differ only by kernel arithmetic (~1e-5), so the loss-sensitivity
    # amplification stays bounded; gate wide and only on finiteness + bulk.
    print("pallas UNPACKED vs xla (photometric loss, sensitivity envelope):")
    _, _, pgf = run("pallas", packed=False, exact=True, loss_kind="photo")
    _, _, xgf = run("xla", packed=False, exact=True, loss_kind="photo")
    for k in xgf:
        scale = np.abs(xgf[k]).max() + 1e-8
        ok &= check(f"grad[{k}]", pgf[k] / scale, xgf[k] / scale, 2e-3,
                    outlier_frac=3e-3, outlier_atol=2e-1)
        ok &= bool(np.isfinite(pgf[k]).all())

    # Strip rendering (tile_row0/tile_rows) on hardware: the multi-chip paths
    # rasterize per-strip with these kernels; interpret mode cannot catch a
    # Mosaic lowering issue in the scalar-prefetched dynamic row offset.
    print("pallas STRIPS (packed) vs full-frame pallas:")
    from gaussiansplat_tpu.ops.binning import bin_gaussians, tile_grid
    from gaussiansplat_tpu.ops.projection import make_payload, project_gaussians
    from gaussiansplat_tpu.ops.raster_dispatch import rasterize_payload

    cfg = RasterConfig(packed=True, trans_eps=0.0)
    _, tiles_y = tile_grid(cam.width, cam.height, cfg.tile_size)
    n_strips = 4
    assert tiles_y % n_strips == 0, (tiles_y, n_strips)
    rows = tiles_y // n_strips

    @jax.jit
    def strips(p):
        m = model.with_params(p)
        proj = project_gaussians(
            m.means, m.quats, m.log_scales, m.logit_opacities, m.sh,
            cam, cfg, sh_degree=2, alive=m.alive)
        payload = make_payload(proj)
        parts = []
        for s in range(n_strips):
            binning = bin_gaussians(
                proj, cam.width, cam.height, cfg, tile_row0=jnp.int32(s * rows),
                tile_rows=rows, impl="pallas")
            out = rasterize_payload(
                payload, binning, bg, cam.width, cam.height, cfg, "pallas",
                tile_row0=jnp.int32(s * rows), tile_rows=rows)
            parts.append(out.image)
        return jnp.concatenate(parts, axis=0)[: cam.height]

    si = np.asarray(strips(params))
    ok &= check("strip image", si, qi, 1e-5)

    print("OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
