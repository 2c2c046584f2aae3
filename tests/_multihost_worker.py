"""Worker program for the multi-process (multi-host analogue) test.

Launched by tests/test_multihost.py as N separate processes, each with 4
virtual CPU devices: initializes jax.distributed against the shared
coordinator, builds the global (data=N, tile=4) mesh, runs ONE sharded
train step with per-process views, and prints the loss/psnr for the parent
to compare against a single-process run of the identical problem.
"""

import json
import sys


def main() -> int:
    port, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    import jax

    from gaussiansplat_tpu.parallel import multihost as mh

    mh.initialize(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.local_device_count() == 4

    import jax.numpy as jnp

    from gaussiansplat_tpu.config import RasterConfig, TrainConfig
    from gaussiansplat_tpu.models import random_model
    from gaussiansplat_tpu.ops import look_at
    from gaussiansplat_tpu.parallel import make_sharded_train_step
    from gaussiansplat_tpu.train import init_train_state

    mesh = mh.make_global_mesh(tile=4)  # data = nproc
    assert mesh.shape["data"] == nproc

    cfg = RasterConfig(tile_size=32, chunk_size=128, impl="xla")
    tcfg = TrainConfig(iterations=10, ssim_lambda=0.2)
    w, h = 64, 128

    # Identical on every process (same seeds).
    model = random_model(jax.random.PRNGKey(0), 96, sh_degree=1, extent=1.0)
    views = []
    for i in range(nproc):
        cam = look_at(eye=(0.5 - 0.3 * i, 0.3, -6.0), target=(0, 0, 0),
                      fx=220.0, fy=220.0, width=w, height=h)
        gt = jax.random.uniform(jax.random.PRNGKey(100 + i), (h, w, 3))
        views.append((cam, gt))

    state, tx = init_train_state(model, tcfg, extent=1.0)
    step = make_sharded_train_step(mesh, tx, cfg, tcfg, w, h, sh_degree=1)

    # Per-process data feeding: this process materializes ONLY its view.
    local = mh.process_views(views, batch=1, step=0)
    cams, gts = mh.global_batch(mesh, local, h, cfg.tile_size)
    gstate = mh.replicate(mesh, state)

    new_state, metrics = step(gstate, cams, gts)
    out = dict(
        pid=pid,
        loss=float(metrics["loss"]),
        psnr=float(metrics["psnr"]),
        step=int(new_state.step),
        processes=jax.process_count(),
    )
    print("RESULT " + json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
