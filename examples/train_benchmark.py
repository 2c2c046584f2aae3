"""BASELINE config-2-class quality run on the bundled benchmark scene.

No external datasets exist in this environment (zero egress), so quality is
demonstrated on the bundled 150k-gaussian multi-object scene
(`data/benchmark.py`): train from a sparse noisy init through the full
densify/prune/SH schedule and report held-out PSNR/SSIM into
<out>/metrics.jsonl + preview PNGs. Results are recorded in BASELINE.md.

    python examples/train_benchmark.py --iterations 7000 --out runs/benchmark
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/gsplat_tpu_cache"),
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def main():
    from gaussiansplat_tpu.config import RasterConfig, TrainConfig
    from gaussiansplat_tpu.data.benchmark import benchmark_scene
    from gaussiansplat_tpu.train import Trainer
    from gaussiansplat_tpu.train.trainer import evaluate, make_eval_fn
    from gaussiansplat_tpu.utils import MetricLogger, export_ply

    ap = argparse.ArgumentParser()
    ap.add_argument("--iterations", type=int, default=7000)
    ap.add_argument("--size", type=int, default=800)
    ap.add_argument("--n-points", type=int, default=150_000)
    ap.add_argument("--init-points", type=int, default=20_000)
    ap.add_argument("--capacity", type=int, default=262_144)
    ap.add_argument("--sh-degree", type=int, default=3)
    ap.add_argument("--out", default="runs/benchmark")
    ap.add_argument("--impl", default=None)
    ap.add_argument("--gt-renderer", default="oracle",
                    choices=["oracle", "tiled"],
                    help="GT provenance: 'oracle' = dense matrix oracle "
                         "(independent of the rasterizer under test)")
    ap.add_argument("--densify-grad-thresh", type=float, default=1.2e-4,
                    help="absolute grad threshold (only used when "
                         "--densify-target-fraction is 0)")
    ap.add_argument("--densify-target-fraction", type=float, default=0.08,
                    help="budget-targeted density control: every densify "
                         "pass clones/splits the top fraction of visible "
                         "gaussians by avg 2D-position grad. The absolute "
                         "threshold proved scene/scale-fragile (it never "
                         "triggered on this scene: 20k init stayed ~19k); "
                         "the percentile form guarantees config-2-class "
                         "density (~20k -> ~200k over 30 passes at 0.08). "
                         "0 disables (use --densify-grad-thresh).")
    ap.add_argument("--gt-sh-degree", type=int, default=3,
                    help="SH degree of the GROUND-TRUTH gaussian set (3 = "
                         "specular lobes exercise the deg-2/3 bands)")
    ap.add_argument("--gt-cache", default=None,
                    help="npz path for the rendered GT views: loaded if it "
                         "exists AND its stored fingerprint matches the "
                         "scene parameters (else re-rendered), written "
                         "after rendering. The oracle GT pass costs ~25 min "
                         "on the chip; the cache makes reruns free.")
    args = ap.parse_args()

    import numpy as np

    # Cache provenance: a cache rendered with different scene parameters
    # would silently corrupt the headline PSNR, so the npz stores the
    # parameter fingerprint and a mismatch discards it.
    fingerprint = json.dumps(dict(
        size=args.size, n_points=args.n_points, init_points=args.init_points,
        gt_renderer=args.gt_renderer, gt_sh_degree=args.gt_sh_degree,
        seed=0, scene_version=2,   # v2: specular deg-2/3 lobes on sphere+torus
    ), sort_keys=True)
    gt_images = None
    if args.gt_cache and os.path.exists(args.gt_cache):
        z = np.load(args.gt_cache)
        stored = str(z["fingerprint"]) if "fingerprint" in z else "<none>"
        if stored == fingerprint:
            gt_images = (z["train"], z["test"])
            print(f"loaded GT cache {args.gt_cache} "
                  f"({len(z['train'])} train / {len(z['test'])} test)",
                  flush=True)
        else:
            print(f"GT cache fingerprint mismatch, re-rendering:\n"
                  f"  cache: {stored}\n  want:  {fingerprint}", flush=True)

    print(f"backend={jax.default_backend()}; building scene "
          f"(gt={args.gt_renderer}, gt_sh={args.gt_sh_degree}) ...", flush=True)
    scene, gt_model = benchmark_scene(
        n_points=args.n_points, width=args.size, height=args.size,
        init_points=args.init_points, capacity=args.capacity,
        sh_degree=args.gt_sh_degree,
        impl=args.impl, gt_renderer=args.gt_renderer, gt_images=gt_images,
    )
    if args.gt_cache and gt_images is None:
        # float16 cache: ~2e-4 quantization, invisible at the ~33 dB the
        # benchmark measures, half the bytes.
        np.savez(
            args.gt_cache,
            train=np.stack([np.asarray(im, np.float16)
                            for _, im in scene.train_views]),
            test=np.stack([np.asarray(im, np.float16)
                           for _, im in scene.test_views]),
            fingerprint=np.str_(fingerprint),
        )
        print(f"wrote GT cache {args.gt_cache}", flush=True)
    print(f"scene '{scene.name}': {len(scene.train_views)} train / "
          f"{len(scene.test_views)} test views, "
          f"init {int(scene.init_model.num_alive)} gaussians "
          f"(capacity {scene.init_model.capacity})", flush=True)

    # 3DGS proportions: density control (and its opacity resets) run for the
    # first half; the second half converges undisturbed, so the final eval
    # is not depressed by a recent reset.
    tcfg = TrainConfig(
        iterations=args.iterations,
        sh_degree=args.sh_degree,
        densify_end=min(15_000, args.iterations // 2),
        densify_grad_thresh=args.densify_grad_thresh,
        densify_target_fraction=args.densify_target_fraction or None,
        eval_every=500,
        log_every=100,
    )
    rcfg = RasterConfig()
    os.makedirs(args.out, exist_ok=True)
    logger = MetricLogger(os.path.join(args.out, "metrics.jsonl"))
    trainer = Trainer(raster_cfg=rcfg, cfg=tcfg, impl=args.impl)
    model, metrics = trainer.fit(
        scene.init_model, scene.train_views,
        log=logger.log,
        eval_views=scene.test_views,
        preview_dir=os.path.join(args.out, "previews"),
    )

    eval_fn = make_eval_fn(rcfg, tcfg, args.impl)
    final = evaluate(eval_fn, model, scene.test_views, args.sh_degree)
    n = export_ply(os.path.join(args.out, "point_cloud.ply"), model)

    # ---- per-object PSNR (VERDICT r4 item 7): does the trained model track
    # the SPECULAR objects as well as the matte ones? Masks come from an
    # oracle render of mask-colored GT geometry; the same metric on the GT
    # model itself gives the renderer-mismatch floor (GT rendered through
    # the production rasterizer vs its own oracle images).
    from gaussiansplat_tpu.data.benchmark import render_object_masks

    test_cams = [cam for cam, _ in scene.test_views]
    masks = render_object_masks(test_cams, n_points=args.n_points,
                                seed=0, cfg=rcfg)

    def masked_psnr(m, deg):
        import numpy as np
        sh_rows, mt_rows = [], []
        for (cam, gt), (shiny, matte) in zip(scene.test_views, masks):
            img, _, _ = eval_fn(m, cam, gt, deg)
            err = np.asarray((img - gt) ** 2).mean(-1)
            for sel, rows in ((shiny, sh_rows), (matte, mt_rows)):
                if sel.sum():
                    rows.append(10.0 * np.log10(1.0 / max(
                        float(err[sel].mean()), 1e-10)))
        return (sum(sh_rows) / max(len(sh_rows), 1),
                sum(mt_rows) / max(len(mt_rows), 1))

    psnr_shiny, psnr_matte = masked_psnr(model, args.sh_degree)
    gt_shiny, gt_matte = masked_psnr(gt_model, args.gt_sh_degree)

    # ---- per-band render-space value (item 7's "error, not just RMS"):
    # PSNR as a function of evaluated SH degree, for the trained model AND
    # the GT model through the same eval path. The per-band PSNR GAIN of the
    # trainee vs the GT's own gain quantifies how much of each band's
    # available signal was actually learned.
    psnr_by_deg = {}
    for deg in range(args.sh_degree + 1):
        r = evaluate(eval_fn, model, scene.test_views, deg)
        psnr_by_deg[f"psnr_deg{deg}"] = r["eval_psnr"]
    gt_by_deg = {}
    for deg in range(args.gt_sh_degree + 1):
        r = evaluate(eval_fn, gt_model, scene.test_views, deg)
        gt_by_deg[f"gt_psnr_deg{deg}"] = r["eval_psnr"]

    # Per-band SH energy of the trained model: evidence the deg-2/3
    # coefficients carry signal (GT specular lobes), not init noise.
    def _band_rms(m, prefix):
        alive = np.asarray(m.alive)
        rest = np.asarray(m.sh_rest)[alive].reshape(int(alive.sum()), -1, 3)
        out, i0 = {}, 0
        for l in range(1, m.sh_degree + 1):
            c = 2 * l + 1
            out[f"{prefix}sh_band{l}_rms"] = float(
                np.sqrt(np.mean(rest[:, i0:i0 + c, :] ** 2)))
            i0 += c
        return out

    band_rms = _band_rms(model, "")
    band_rms.update(_band_rms(gt_model, "gt_"))

    result = dict(
        scene=scene.name, iterations=args.iterations,
        resolution=f"{args.size}x{args.size}",
        gt_renderer=args.gt_renderer,
        gt_sh_degree=args.gt_sh_degree,
        densify_grad_thresh=args.densify_grad_thresh,
        densify_target_fraction=args.densify_target_fraction,
        final_gaussians=n, **final, **band_rms,
        sh_rest_init_rms=0.0,  # trainee sh_rest initializes to zero
        psnr_shiny=psnr_shiny, psnr_matte=psnr_matte,
        gt_psnr_shiny=gt_shiny, gt_psnr_matte=gt_matte,
        shiny_matte_gap_db=psnr_matte - psnr_shiny,
        gt_shiny_matte_gap_db=gt_matte - gt_shiny,
        **psnr_by_deg, **gt_by_deg,
    )
    with open(os.path.join(args.out, "result.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    logger.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
