"""Multi-host entry point test (SURVEY §2.4 DP row: psum over DCN across
hosts): a REAL 2-process jax.distributed CPU cluster runs one sharded train
step with per-process data feeding, and its loss must match the identical
problem run single-process on a local 8-device mesh."""

import json
import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _worker_env() -> dict:
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # keep the TPU plugin out
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_PLATFORM_NAME"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    flags = " ".join(
        f for f in flags.split() if "host_platform_device_count" not in f
    )
    env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=4").strip()
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/gsplat_jax_cache"
    return env


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_two_process_train_step_matches_single_process():
    port = _free_port()
    nproc = 2
    script = os.path.join(REPO, "tests", "_multihost_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, script, str(port), str(pid), str(nproc)],
            env=_worker_env(), stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True,
        )
        for pid in range(nproc)
    ]
    results = {}
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        for line in out.splitlines():
            if line.startswith("RESULT "):
                r = json.loads(line[len("RESULT "):])
                results[r["pid"]] = r
    assert set(results) == {0, 1}
    for r in results.values():
        assert r["processes"] == 2
        assert r["step"] == 1
        assert np.isfinite(r["loss"])
    # Replicated outputs must agree bit-for-bit across processes.
    assert results[0]["loss"] == results[1]["loss"]
    assert results[0]["psnr"] == results[1]["psnr"]

    # Single-process reference on the in-test 8-device mesh: same scene,
    # same (data=2, tile=4) layout — the DCN-spanning psums must reproduce
    # the intra-process result.
    from gaussiansplat_tpu.config import RasterConfig, TrainConfig
    from gaussiansplat_tpu.models import random_model
    from gaussiansplat_tpu.ops import look_at
    from gaussiansplat_tpu.parallel import (
        make_mesh, make_sharded_train_step, pad_targets, stack_cameras,
    )
    from gaussiansplat_tpu.train import init_train_state

    cfg = RasterConfig(tile_size=32, chunk_size=128, impl="xla")
    tcfg = TrainConfig(iterations=10, ssim_lambda=0.2)
    w, h = 64, 128
    model = random_model(jax.random.PRNGKey(0), 96, sh_degree=1, extent=1.0)
    views = []
    for i in range(nproc):
        cam = look_at(eye=(0.5 - 0.3 * i, 0.3, -6.0), target=(0, 0, 0),
                      fx=220.0, fy=220.0, width=w, height=h)
        gt = jax.random.uniform(jax.random.PRNGKey(100 + i), (h, w, 3))
        views.append((cam, gt))
    state, tx = init_train_state(model, tcfg, extent=1.0)
    mesh = make_mesh(data=2, tile=4)
    step = make_sharded_train_step(mesh, tx, cfg, tcfg, w, h, sh_degree=1)
    cams = stack_cameras([c for c, _ in views])
    gts = pad_targets(jnp.stack([g for _, g in views]), h, cfg.tile_size, 4)
    _, metrics = step(state, cams, gts)
    np.testing.assert_allclose(
        results[0]["loss"], float(metrics["loss"]), atol=1e-6)
    np.testing.assert_allclose(
        results[0]["psnr"], float(metrics["psnr"]), atol=1e-3)
