"""Memory-realistic gauss-sharded TRAINING run: >= 1M gaussians over the
8-device mesh with the PLAN-DRIVEN send_cap (VERDICT r3 item 4).

Checks, at a scale 3-4 orders above the unit tests:
  * the capacity plan's send_cap carries the real exchange without overflow,
  * the sharded render matches the replicated single-device render,
  * the sharded train step runs and the loss drops,
  * the compiled train step's MEASURED all-to-all volume (from its optimized
    HLO, utils/hlo_comm.py) equals the closed-form comm term the
    weak-scaling model is built on (VERDICT r4 item 6),
  * the depth-ring schedule renders the same scene with parity, its measured
    comm volume is recorded next to the strip's, and the closed-form
    crossover rule (capacity.preferred_gauss_schedule) is emitted,
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
        ici_bytes_per_step, ici_bytes_per_step_ring, plan_gauss_sharded,
        predicted_weak_scaling, preferred_gauss_schedule)
    from gaussiansplat_tpu.parallel.depth_ring import make_depth_ring_render
    from gaussiansplat_tpu.parallel.gauss_shard import make_gauss_sharded_render
    from gaussiansplat_tpu.parallel.gauss_train import (
        init_gauss_sharded_state, make_gauss_sharded_train_step)
    from gaussiansplat_tpu.render import render
    from gaussiansplat_tpu.utils.hlo_comm import collective_bytes

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

    # MEASURED comm volume of the compiled train step (VERDICT r4 item 6):
    # account every collective in the optimized HLO and assert the payload
    # exchange (fwd + reverse all_to_all) equals the closed form the
    # weak-scaling model prices. Other collectives (loss halo permutes,
    # metric psums) are reported but are image/scalar-sized, not
    # N-proportional.
    comm = collective_bytes(
        step.lower(state, cam, gt).compile().as_text(), nd)
    model_a2a = ici_bytes_per_step(plan)
    print(f"measured comm (train step, per device): {json.dumps(comm)}")
    print(f"model all_to_all bytes: {model_a2a} "
          f"(measured {comm.get('all-to-all', 0)})", flush=True)
    a2a_match = comm.get("all-to-all", 0) == model_a2a

    losses, overflows = [], []
    for i in range(args.steps):
        t0 = time.time()
        state, metrics = jax.block_until_ready(step(state, cam, gt))
        losses.append(float(metrics["loss"]))
        overflows.append(int(metrics["overflow"]))
        print(f"step {i}: loss={losses[-1]:.5f} overflow={overflows[-1]} "
              f"({time.time() - t0:.1f}s)", flush=True)

    # ---- depth-ring schedule at the same shape (VERDICT r4 weak item 5):
    # parity, measured fwd+bwd comm volume, and the closed-form crossover
    # rule that decides between the two exact schedules.
    rrender = make_depth_ring_render(mesh, cfg, size, size, sh_degree=1)

    def ring_loss(params):
        m = smodel.with_params(params)
        img, _ = rrender(m, cam, bg)
        return jnp.mean((img - gt) ** 2), img

    ring_grad = jax.jit(
        lambda p: jax.value_and_grad(ring_loss, has_aux=True)(p))
    sparams = smodel.trainable()
    ring_comm = collective_bytes(
        ring_grad.lower(sparams).compile().as_text(), nd)
    t0 = time.time()
    (_, img_ring), _ = jax.block_until_ready(ring_grad(sparams))
    ring_parity = float(jnp.max(jnp.abs(img_ring - img_r)))
    ring_model = ici_bytes_per_step_ring(n, nd, size, size)
    print(f"depth-ring fwd+bwd: {time.time() - t0:.1f}s, "
          f"parity max|diff|={ring_parity:.2e}")
    print(f"measured comm (ring fwd+bwd, per device): {json.dumps(ring_comm)}")
    print(f"ring model bytes: {ring_model} (measured total "
          f"{ring_comm.get('total', 0)})", flush=True)

    rule_here = preferred_gauss_schedule(n, nd, size, size, sh_degree=1)
    rule_cfg5 = preferred_gauss_schedule(30_000_000, 8, 1920, 1088)
    rule_8m = preferred_gauss_schedule(8_000_000, 8, 1920, 1088)
    print(f"schedule rule: here={json.dumps(rule_here)}")
    print(f"  8M/8 @1080p: {json.dumps(rule_8m)}")
    print(f"  30M/8 @1080p (config 5): {json.dumps(rule_cfg5)}", flush=True)

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
          and all(o == 0 for o in overflows) and a2a_match
          and ring_parity < 1e-4)
    rec = dict(
        ok=ok, devices=nd, n_gaussians=n, size=size,
        send_cap=plan.send_cap,
        local_capacity=plan.local_capacity,
        ici_bytes_per_step=model_a2a,
        measured_comm_bytes=comm,
        a2a_model_matches_measured=a2a_match,
        parity_max_diff=parity,
        pack_overflow=pack_of, bin_overflow=bin_of,
        losses=losses, overflows=overflows,
        ring_parity_max_diff=ring_parity,
        ring_measured_comm_bytes=ring_comm,
        ring_model_bytes=ring_model,
        schedule_rule=dict(here=rule_here, n8m_d8_1080p=rule_8m,
                           config5=rule_cfg5),
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
