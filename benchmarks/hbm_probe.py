"""Measured-vs-predicted HBM at the single-chip ceiling (VERDICT r4 item 4).

Every bench artifact records `hbm_peak_bytes: null` because the tunneled
PJRT backend does not expose `memory_stats()`. This probe tries the
remaining measurement channels in order, at the 8M bench config (the
predicted ~8.19M-gaussian single-chip ceiling, parallel/capacity.py):

  1. device.memory_stats() (in case the plugin grew support),
  2. jax.profiler.device_memory_profile() — a pprof protobuf whose sample
     values sum to live bytes per allocation site,
  3. failing both, an N-bisection OOM bracket is the fallback (run with
     --bisect; each probe point compiles a full step, so this is slow and
     off by default).

Prints one JSON line with whatever was measurable plus the closed-form
prediction.

    python benchmarks/hbm_probe.py --config 1080p8m --out benchmarks/hbm_8m_r5.json
"""

import argparse
import json
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/gsplat_tpu_cache"),
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

CONFIGS = {  # mirrors bench.py
    "1080p1m": (1920, 1080, 1_000_000, 2.6),
    "1080p3m": (1920, 1080, 3_000_000, 1.9),
    "4k4m": (3840, 2160, 4_000_000, 2.6),
    "1080p8m": (1920, 1080, 8_000_000, 1.6),
}


def _pprof_total_bytes():
    """Sum live bytes from the device memory pprof profile, if supported."""
    import gzip

    raw = jax.profiler.device_memory_profile()
    try:
        raw = gzip.decompress(raw)
    except Exception:
        pass
    # pprof wire format without protobuf deps: samples are (location, value)
    # records; instead of a full parser, use the tensorboard profile proto if
    # importable, else give up gracefully.
    try:
        from tensorflow.python.profiler.pprof import profile_pb2  # noqa
        p = profile_pb2.Profile.FromString(raw)
    except Exception:
        try:
            from xprof.protobuf import profile_pb2  # noqa
            p = profile_pb2.Profile.FromString(raw)
        except Exception:
            return None, "no pprof proto parser available"
    # sample_type: usually [("space","bytes")]; sum the first value.
    total = sum(s.value[0] for s in p.sample)
    return int(total), None


def run_step(w, h, n, ppg):
    from gaussiansplat_tpu.config import RasterConfig
    from gaussiansplat_tpu.models import random_model
    from gaussiansplat_tpu.ops import look_at
    from gaussiansplat_tpu.render import render
    from gaussiansplat_tpu.train.loss import photometric_loss

    cfg = RasterConfig(pairs_per_gaussian=ppg)
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

    @jax.jit
    def fwd_bwd(p):
        def loss_fn(pp):
            m = model.with_params(pp)
            out = render(m, cam, cfg, sh_degree=sh, background=bg, impl=impl)
            return photometric_loss(out.image, target, 0.2)
        return jax.value_and_grad(loss_fn)(p)

    loss, grads = fwd_bwd(params)
    jax.block_until_ready(loss)
    return float(loss)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", choices=sorted(CONFIGS), default="1080p8m")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    w, h, n, ppg = CONFIGS[args.config]

    from gaussiansplat_tpu.parallel.capacity import plan_gauss_sharded

    plan = plan_gauss_sharded(n, 1, w, h, sh_degree=3, send_fraction=1.0)
    rec = dict(config=args.config, n=n, backend=jax.default_backend(),
               predicted_model_bytes=plan.total_bytes,
               predicted_with_slack_bytes=int(plan.total_bytes * 1.35))

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

    if not stats or not stats.get("peak_bytes_in_use"):
        try:
            total, err = _pprof_total_bytes()
            rec["pprof_live_bytes"] = total
            if err:
                rec["pprof_error"] = err
        except Exception as e:
            rec["pprof_error"] = repr(e)[:200]

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
