"""Measured-vs-predicted HBM at the single-chip ceiling (VERDICT r4 item 4).

Every bench artifact records `hbm_peak_bytes: null` because the tunneled
PJRT backend does not expose `memory_stats()`. Measurement channels, in
order of preference:

  1. device.memory_stats() (in case the plugin grew support),
  2. jax.profiler.device_memory_profile() — DISABLED by default on this
     backend: the C API lacks PJRT_Executable_SizeOfGeneratedCodeInBytes
     and the client-side HeapProfile absl-FATALs the whole process
     (measured round 5, rc=134) — opt in with --pprof only on backends
     known to support it,
  3. an N-bisection OOM bracket (--bisect): probe full TRAINING steps
     (value_and_grad + Adam update, matching capacity.py's
     with_optimizer=True budget, default RasterConfig like
     max_gaussians_per_chip) in fresh SUBPROCESSES so a fatal OOM can't
     kill the driver; brackets the real single-chip ceiling around the
     predicted 8.19M.

Prints one JSON line with whatever was measurable plus the closed-form
prediction.

    python benchmarks/hbm_probe.py --config 1080p8m --out benchmarks/hbm_8m_r5.json
    python benchmarks/hbm_probe.py --bisect --probes 2 --out benchmarks/hbm_bisect_r5.json
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = {  # mirrors bench.py
    "1080p1m": (1920, 1080, 1_000_000, 2.6),
    "1080p3m": (1920, 1080, 3_000_000, 1.9),
    "4k4m": (3840, 2160, 4_000_000, 2.6),
    "1080p8m": (1920, 1080, 8_000_000, 1.6),
}


def _jax():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/gsplat_tpu_cache"),
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return jax


def _pprof_total_bytes(jax):
    """Sum live bytes from the device memory pprof profile, if supported."""
    import gzip

    raw = jax.profiler.device_memory_profile()
    try:
        raw = gzip.decompress(raw)
    except Exception:
        pass
    try:
        from tensorflow.python.profiler.pprof import profile_pb2  # noqa
        p = profile_pb2.Profile.FromString(raw)
    except Exception:
        try:
            from xprof.protobuf import profile_pb2  # noqa
            p = profile_pb2.Profile.FromString(raw)
        except Exception:
            return None, "no pprof proto parser available"
    total = sum(s.value[0] for s in p.sample)
    return int(total), None


def run_step(w, h, n, ppg=None, train=False):
    """One fused fwd+bwd step at (w, h, n); with train=True, also build Adam
    state and apply one update so the live set matches capacity.py's
    with_optimizer=True budget (ppg=None -> default RasterConfig, which is
    what max_gaussians_per_chip assumes)."""
    jax = _jax()
    import jax.numpy as jnp

    from gaussiansplat_tpu.config import RasterConfig
    from gaussiansplat_tpu.models import random_model
    from gaussiansplat_tpu.ops import look_at
    from gaussiansplat_tpu.render import render
    from gaussiansplat_tpu.train.loss import photometric_loss

    cfg = RasterConfig() if ppg is None else RasterConfig(pairs_per_gaussian=ppg)
    sh = 3
    fx = 1600.0 * w / 1920.0
    k = (1600.0 / fx) * ((w * h / n) / 2.0736) ** 0.5
    model = random_model(jax.random.PRNGKey(0), n, sh_degree=sh, extent=1.0,
                         opacity=0.8, scale_range=(0.004 * k, 0.012 * k))
    cam = look_at(eye=(0.0, 0.0, -4.0), target=(0, 0, 0), fx=fx, fy=fx,
                  width=w, height=h)
    target = jax.random.uniform(jax.random.PRNGKey(1), (h, w, 3))
    bg = jnp.zeros((3,), jnp.float32)
    params = model.trainable()
    impl = "pallas" if jax.default_backend() == "tpu" else "xla"

    def loss_fn(pp):
        m = model.with_params(pp)
        out = render(m, cam, cfg, sh_degree=sh, background=bg, impl=impl)
        return photometric_loss(out.image, target, 0.2)

    if not train:
        loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
        jax.block_until_ready(loss)
        return float(loss)

    import optax

    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s):
        loss, g = jax.value_and_grad(loss_fn)(p)
        upd, s = opt.update(g, s, p)
        return optax.apply_updates(p, upd), s, loss

    params, opt_state, loss = step(params, opt_state)
    jax.block_until_ready(loss)
    return float(loss)


def probe_subprocess(w, h, n, timeout_s=2400):
    """Probe one TRAIN step at N in a fresh process. Returns (fits, detail):
    rc 0 -> fits; OOM/abort/timeout -> does not fit (detail says which)."""
    cmd = [sys.executable, os.path.abspath(__file__),
           "--single-probe", str(n), "--width", str(w), "--height", str(h)]
    t0 = time.time()
    try:
        r = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=timeout_s, cwd=os.path.dirname(
                               os.path.dirname(os.path.abspath(__file__))))
    except subprocess.TimeoutExpired:
        return None, f"timeout after {timeout_s}s"
    dt = time.time() - t0
    tail = (r.stdout + r.stderr)[-400:]
    if r.returncode == 0:
        return True, f"fit in {dt:.0f}s"
    low = (r.stdout + r.stderr).lower()
    if "resource_exhausted" in low or "out of memory" in low or "oom" in low:
        return False, f"OOM (rc={r.returncode}, {dt:.0f}s)"
    return False, f"rc={r.returncode} ({dt:.0f}s): {tail}"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", choices=sorted(CONFIGS), default="1080p8m")
    ap.add_argument("--out", default=None)
    ap.add_argument("--pprof", action="store_true",
                    help="attempt device_memory_profile (FATALs on axon)")
    ap.add_argument("--bisect", action="store_true")
    ap.add_argument("--probes", type=int, default=2,
                    help="bisection probe budget (each is a full compile)")
    ap.add_argument("--single-probe", type=int, default=0,
                    help="internal: run one train step at N and exit")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    args = ap.parse_args()

    if args.single_probe:
        loss = run_step(args.width, args.height, args.single_probe,
                        ppg=None, train=True)
        print(json.dumps({"n": args.single_probe, "loss": loss}))
        return

    jax = _jax()
    from gaussiansplat_tpu.parallel.capacity import (
        max_gaussians_per_chip, plan_gauss_sharded)

    w, h, n, ppg = CONFIGS[args.config]

    plan = plan_gauss_sharded(n, 1, w, h, sh_degree=3, send_fraction=1.0)
    rec = dict(config=args.config, n=n, backend=jax.default_backend(),
               predicted_model_bytes=plan.total_bytes,
               predicted_with_slack_bytes=int(plan.total_bytes * 1.35))

    if args.bisect:
        ceiling = max_gaussians_per_chip(w, h)
        rec["predicted_ceiling_n"] = ceiling
        # Budgeted bracket: predicted ceiling itself (the claim "this N
        # trains on one chip"), then +15% (the claim "the model is not
        # wildly conservative"), then midpoints if budget remains.
        lo_fit, hi_oom = None, None
        results = []
        for i in range(args.probes):
            if not results:
                p = ceiling
            elif lo_fit and hi_oom:
                p = (lo_fit + hi_oom) // 2
            elif lo_fit:          # everything fit so far: step up 15%
                p = int(lo_fit * 1.15)
            else:                 # everything OOMed so far: step down 10%
                p = int(hi_oom * 0.9)
            fits, detail = probe_subprocess(w, h, p)
            results.append(dict(n=p, fits=fits, detail=detail))
            print(json.dumps(results[-1]), flush=True)
            if fits:
                lo_fit = max(lo_fit or 0, p)
            elif fits is False:
                hi_oom = min(hi_oom or 1 << 30, p)
        rec["bisect"] = results
        rec["measured_fit_n"] = lo_fit
        rec["measured_oom_n"] = hi_oom
    else:
        loss = run_step(w, h, n, ppg)
        rec["step_loss"] = loss

        stats = None
        try:
            ms = jax.devices()[0].memory_stats()
            if ms:
                stats = {k: int(v) for k, v in ms.items()
                         if isinstance(v, (int, float))}
        except Exception as e:
            rec["memory_stats_error"] = repr(e)[:200]
        rec["memory_stats"] = stats

        if args.pprof and (not stats or not stats.get("peak_bytes_in_use")):
            try:
                total, err = _pprof_total_bytes(jax)
                rec["pprof_live_bytes"] = total
                if err:
                    rec["pprof_error"] = err
            except Exception as e:
                rec["pprof_error"] = repr(e)[:200]
        elif not args.pprof:
            rec["pprof_skipped"] = (
                "device_memory_profile absl-FATALs on the axon plugin "
                "(PJRT_Executable_SizeOfGeneratedCodeInBytes unimplemented)")

        measured = (stats or {}).get("peak_bytes_in_use") or rec.get(
            "pprof_live_bytes")
        if measured:
            rec["measured_over_predicted"] = round(
                measured / plan.total_bytes, 3)

    print(json.dumps(rec))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rec, f, indent=1)
            f.write("\n")


if __name__ == "__main__":
    main()
