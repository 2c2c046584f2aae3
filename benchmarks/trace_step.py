"""Critical-path trace of the REAL fused training step (VERDICT r4 item 3).

Isolated stage timings sum to 1.3-1.8x the measured step because XLA
overlaps independent streams; this captures a jax.profiler device trace of
the fused fwd+bwd step at a bench config and reduces it to the numbers that
matter for optimization targeting:

  * per-op-category device self time (sorts, gathers, pallas kernels,
    fusions, ...), i.e. what the step is actually spending time on,
  * total device busy time vs step wall time (the overlap/bubble budget).

The raw xplane logdir stays in /tmp (tens of MB); the committed artifact is
the summary JSON.

    python benchmarks/trace_step.py --config 1080p3m \
        --out benchmarks/trace_1080p3m_r5.json
"""

import argparse
import glob
import json
import os
import sys
import time

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

# Crude-but-stable op-name -> op-class buckets. Only the LAST path
# component counts: jax op paths like `transpose(jvp())/sort` use
# "transpose" for the AUTODIFF transform, not a data transpose.
BUCKETS = [
    ("pallas_kernel", ("pallas_call", "tpu_custom_call", "custom-call")),
    ("sort", ("sort",)),
    ("gather_scatter", ("gather", "scatter", "dynamic-slice",
                        "dynamic-update-slice")),
    ("matmul", ("dot_general", "dot", "convolution")),
    ("copy_transpose", ("copy", "reshape", "bitcast", "concatenate",
                        "split", "slice", "transpose")),
    ("other", ()),
]


def bucket_of(name: str) -> str:
    low = name.lower().rsplit("/", 1)[-1]
    for b, keys in BUCKETS:
        if any(k in low for k in keys):
            return b
    return "other"


def analyze_xspace(logdir: str):
    """Reduce the captured xplane to per-op self-time rows using the
    tensorboard profile plugin's raw converters."""
    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                             recursive=True))
    if not paths:
        return None, "no xplane.pb captured"
    try:
        from xprof.convert import raw_to_tool_data as rd
    except ImportError:
        from tensorboard_plugin_profile.convert import (  # noqa: F401
            raw_to_tool_data as rd)
    data, _ = rd.xspace_to_tool_data([paths[-1]], "framework_op_stats", {})
    tables = json.loads(data) if isinstance(data, (str, bytes)) else data
    # gviz DataTable list: cols give field ids, rows carry {"c":[{"v":...}]}.
    if not isinstance(tables, list) or not tables:
        return None, f"unexpected tool data: {str(tables)[:200]}"
    table = tables[0]
    ids = [c.get("id") for c in table.get("cols", [])]
    out = []
    for row in table.get("rows", []):
        vals = [c.get("v") if isinstance(c, dict) else None
                for c in row.get("c", [])]
        out.append(dict(zip(ids, vals)))
    return out, None


def main():
    from gaussiansplat_tpu.config import RasterConfig
    from gaussiansplat_tpu.models import random_model
    from gaussiansplat_tpu.ops import look_at
    from gaussiansplat_tpu.render import render
    from gaussiansplat_tpu.train.loss import photometric_loss

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", choices=sorted(CONFIGS), default="1080p3m")
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--logdir", default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    w, h, n, ppg = CONFIGS[args.config]
    # Shape overrides for smoke tests on slow backends.
    w = int(os.environ.get("GSPLAT_TRACE_WIDTH", w))
    h = int(os.environ.get("GSPLAT_TRACE_HEIGHT", h))
    n = int(os.environ.get("GSPLAT_TRACE_N", n))
    logdir = args.logdir or f"/tmp/gsplat_drive/r5/trace_{args.config}"
    os.makedirs(logdir, exist_ok=True)

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
    def fwd_bwd(params):
        def loss_fn(p):
            m = model.with_params(p)
            out = render(m, cam, cfg, sh_degree=sh, background=bg, impl=impl)
            return photometric_loss(out.image, target, 0.2)
        return jax.value_and_grad(loss_fn)(params)

    fetch = jax.jit(lambda o: jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.sum(jnp.ravel(x)[:64].astype(jnp.float32)),
        o, jnp.float32(0)))

    for _ in range(3):
        float(fetch(fwd_bwd(params)))
    t0 = time.perf_counter()
    out = None
    for _ in range(args.steps):
        out = fwd_bwd(params)
    float(fetch(out))
    step_ms = (time.perf_counter() - t0) / args.steps * 1e3
    print(f"[trace] warm step: {step_ms:.1f} ms", flush=True)

    jax.profiler.start_trace(logdir)
    out = None
    for _ in range(args.steps):
        out = fwd_bwd(params)
    float(fetch(out))
    jax.profiler.stop_trace()
    print(f"[trace] captured to {logdir}", flush=True)

    rows, err = analyze_xspace(logdir)
    summary = dict(config=args.config, backend=jax.default_backend(),
                   step_ms_warm=round(step_ms, 2), steps_traced=args.steps,
                   logdir=logdir)
    if rows is None:
        summary["analysis_error"] = err
        print(f"[trace] analysis unavailable: {err}")
    else:
        # Rows carry operation / host_or_device / total_self_time (us) /
        # occurrences; device rows are the critical-path evidence.
        try:
            ops = []
            for r in rows:
                name = str(r.get("operation") or "")
                side = str(r.get("host_or_device") or "")
                self_us = float(r.get("total_self_time") or 0.0)
                if name and self_us > 0:
                    ops.append((name, side, self_us))
            dev = [o for o in ops if o[1].lower() == "device"]
            use = dev if dev else ops  # CPU backend traces report Host only
            summary["rows_side"] = "device" if dev else "host"
            use.sort(key=lambda x: -x[2])
            per_step = {}
            for name, _, us in use:
                b = bucket_of(name)
                per_step[b] = per_step.get(b, 0.0) + us / args.steps / 1e3
            summary["device_ms_per_step_by_bucket"] = {
                k: round(v, 2) for k, v in sorted(
                    per_step.items(), key=lambda kv: -kv[1])}
            summary["device_busy_ms_per_step"] = round(
                sum(per_step.values()), 2)
            summary["top_ops_ms_per_step"] = [
                dict(op=nm[:120], ms=round(us / args.steps / 1e3, 2))
                for nm, _, us in use[:25]]
            print(json.dumps(summary["device_ms_per_step_by_bucket"],
                             indent=1))
        except Exception as e:
            summary["analysis_error"] = repr(e)
            summary["raw_schema_sample"] = str(rows)[:2000]
            print(f"[trace] rollup failed: {e!r}")

    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)
            f.write("\n")


if __name__ == "__main__":
    main()
