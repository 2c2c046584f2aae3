"""Memory-realistic gauss-sharded TRAINING run: >= 1M gaussians over the
8-device mesh with the PLAN-DRIVEN send_cap (VERDICT r3 item 4).

Checks, at a scale 3-4 orders above the unit tests:
  * the capacity plan's send_cap carries the real exchange without overflow,
  * the sharded render matches the replicated single-device render,
  * the sharded train step runs and the loss drops,
and emits the predicted compute-vs-ICI weak-scaling table for the config-5
shape (the virtual CPU mesh cannot measure scaling — its devices share host
cores — so the predictive model in parallel/capacity.py stands in).

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python benchmarks/gauss_shard_1m.py --out benchmarks/gauss_shard_1m_cpu_r4.json
"""

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/gsplat_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def main():
    from gaussiansplat_tpu.config import RasterConfig, TrainConfig
    from gaussiansplat_tpu.models import random_model
    from gaussiansplat_tpu.ops import look_at
    from gaussiansplat_tpu.parallel import make_gauss_mesh, shard_model
    from gaussiansplat_tpu.parallel.capacity import (
        ici_bytes_per_step, plan_gauss_sharded, predicted_weak_scaling)
    from gaussiansplat_tpu.parallel.gauss_shard import make_gauss_sharded_render
    from gaussiansplat_tpu.parallel.gauss_train import (
        init_gauss_sharded_state, make_gauss_sharded_train_step)
    from gaussiansplat_tpu.render import render

    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_048_576)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    nd = jax.device_count()
    n, size = args.n, args.size
    # Bench-style scene normalization: splats sized so N of them tile the
    # screen (realistic ~2 pairs/gaussian at any N).
    k = ((size * size / n) / 2.0736) ** 0.5
    cfg = RasterConfig(pairs_per_gaussian=3.0, impl="xla")
    model = random_model(jax.random.PRNGKey(0), n, sh_degree=1, extent=1.0,
                         opacity=0.8, scale_range=(0.004 * k, 0.012 * k))
    # fx sized so the unit-extent scene fills the frame (spread 2*fx/z_eye):
    # strips then load roughly evenly, like a real captured scene.
    fx = size * 4.0 / 2.05
    cam = look_at(eye=(0.0, 0.0, -4.0), target=(0, 0, 0), fx=fx, fy=fx,
                  width=size, height=size)
    bg = jnp.zeros((3,), jnp.float32)

    plan = plan_gauss_sharded(model.capacity, nd, size, size, sh_degree=1,
                              cfg=cfg)
    print(f"devices={nd} ({jax.default_backend()})")
    print("plan:", plan.summary(), flush=True)

    mesh = make_gauss_mesh(nd)
    smodel = shard_model(model, mesh)
    srender = make_gauss_sharded_render(mesh, cfg, size, size, sh_degree=1)

    t0 = time.time()
    img_s, _, aux = jax.block_until_ready(
        srender(smodel, cam, bg, with_aux=True))
    pack_of = int(aux["pack_overflow"])
    bin_of = int(aux["overflow"]) - pack_of
    print(f"sharded render: {time.time() - t0:.1f}s "
          f"(send_cap={plan.send_cap}, pack_overflow={pack_of}, "
          f"bin_overflow={bin_of})", flush=True)

    img_r = jax.block_until_ready(
        render(model, cam, cfg, sh_degree=1, background=bg, impl="xla").image)
    parity = float(jnp.max(jnp.abs(img_s - img_r)))
    print(f"parity vs replicated render: max|diff|={parity:.2e}", flush=True)

    tcfg = TrainConfig(iterations=args.steps, sh_degree=1, eval_every=10**9)
    state, tx = init_gauss_sharded_state(model, mesh, tcfg, extent=1.0)
    step = make_gauss_sharded_train_step(
        mesh, tx, cfg, tcfg, size, size, sh_degree=1)
    # Target: the init render shifted darker, so the loss has a gradient.
    gt = jnp.clip(img_r * 0.7, 0.0, 1.0)
    losses, overflows = [], []
    for i in range(args.steps):
        t0 = time.time()
        state, metrics = jax.block_until_ready(step(state, cam, gt))
        losses.append(float(metrics["loss"]))
        overflows.append(int(metrics["overflow"]))
        print(f"step {i}: loss={losses[-1]:.5f} overflow={overflows[-1]} "
              f"({time.time() - t0:.1f}s)", flush=True)

    table = predicted_weak_scaling(
        n_per_device=3_750_000, width=1920, height=1088,
        device_counts=[1, 2, 4, 8, 16])
    print("predicted config-5-shape weak scaling (3.75M/chip, 1080p):")
    for r in table:
        print("  ", json.dumps(r))

    # ok requires: parity with the replicated render, loss decreasing, and
    # ZERO exchange drops with the planned send_cap (binning overflow is
    # reported for observability — those drops are depth-tail pairs).
    ok = (parity < 1e-4 and losses[-1] < losses[0] and pack_of == 0
          and all(o == 0 for o in overflows))
    rec = dict(
        ok=ok, devices=nd, n_gaussians=n, size=size,
        send_cap=plan.send_cap,
        local_capacity=plan.local_capacity,
        ici_bytes_per_step=ici_bytes_per_step(plan),
        parity_max_diff=parity,
        pack_overflow=pack_of, bin_overflow=bin_of,
        losses=losses, overflows=overflows,
        predicted_config5_weak_scaling=table,
        backend=jax.default_backend(),
    )
    print(json.dumps(dict(ok=ok, parity=parity, losses=losses)))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rec, f, indent=1)
            f.write("\n")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
