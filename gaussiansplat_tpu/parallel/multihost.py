"""Multi-host (multi-process) entry point: jax.distributed wiring, global
mesh construction, and per-host view feeding for the data axis.

The reference is strictly single-GPU (SURVEY §2.4: no NCCL/MPI anywhere);
this module is the SPMD pod story. Every process runs the same program:

    from gaussiansplat_tpu.parallel import multihost as mh

    mh.initialize()                     # env-driven on TPU pods; explicit
                                        # coordinator for CPU/GPU clusters
    mesh = mh.make_global_mesh(data=jax.process_count(), tile=...)
    step = make_sharded_train_step(mesh, ...)
    cams, gts = mh.global_batch(mesh, my_host_views)   # per-host shards
    state, metrics = step(state, cams, gts)            # grads psum over DCN

Launch recipe (one command per host):

    # TPU pod slice: the runtime provides coordinator/process env, so
    # initialize() takes no arguments.
    python train_script.py

    # CPU/GPU cluster (and the multi-process CPU test):
    JAX_COORDINATOR=host0:1234 JAX_NUM_PROCESSES=4 JAX_PROCESS_ID=$i \
        python train_script.py

Design notes (TPU-first):
  * The DATA axis spans processes (gradient psum rides DCN once per step);
    the TILE/gauss axes stay within a host's ICI domain. `make_global_mesh`
    lays devices out so axis order preserves that locality: jax.devices()
    enumerates process-major, so reshaping (num_processes * local, ...) to
    (data, tile) with data = k * process_count keeps tile groups intra-host.
  * Per-host data feeding uses jax.make_array_from_process_local_data: each
    process materializes ONLY its own views; the global (B, ...) batch is
    assembled logically, never gathered to any single host.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.camera import Camera
from .mesh import DATA_AXIS, TILE_AXIS


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> None:
    """Bring up the jax.distributed runtime (idempotent).

    On TPU pods all arguments resolve from the runtime environment. On
    CPU/GPU clusters, pass them explicitly or via JAX_COORDINATOR /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID.
    """
    # NB: no jax.devices()/process_count() probes here — touching the
    # backend before jax.distributed.initialize() is an error.
    if _already_initialized():
        return
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    if local_device_ids is not None:
        kwargs.update(local_device_ids=list(local_device_ids))
    jax.distributed.initialize(**kwargs)


def _already_initialized() -> bool:
    try:
        state = jax.distributed.global_state
        return state.client is not None
    except AttributeError:  # pragma: no cover - old jax layout
        return False


def make_global_mesh(data: Optional[int] = None, tile: int = 1) -> Mesh:
    """Mesh over ALL global devices: (data, tile), data spanning processes.

    Defaults to data = global_device_count / tile. Requires tile to divide
    the per-process device count so each view's strip group stays inside one
    host's ICI domain (the tile axis carries per-gaussian grad psums every
    step; the data axis syncs once, over DCN).
    """
    devices = jax.devices()  # process-major enumeration
    n = len(devices)
    if data is None:
        if n % tile:
            raise ValueError(f"tile={tile} must divide device count {n}")
        data = n // tile
    if data * tile != n:
        raise ValueError(
            f"mesh {data}x{tile} != global device count {n}"
        )
    local = jax.local_device_count()
    if tile > local or local % tile:
        raise ValueError(
            f"tile={tile} must divide local device count {local} so strip "
            "psums stay intra-host"
        )
    arr = np.asarray(devices).reshape(data, tile)
    return Mesh(arr, (DATA_AXIS, TILE_AXIS))


def process_views(
    views: Sequence, batch: int, step: int
) -> List:
    """The views THIS process feeds for a global step: round-robin by
    process index. `batch` is this process's share of the global data axis
    (data_axis_size / process_count)."""
    pc, pid = jax.process_count(), jax.process_index()
    out = []
    for b in range(batch):
        g = step * batch * pc + pid * batch + b  # global sample index
        out.append(views[g % len(views)])
    return out


def global_batch(
    mesh: Mesh,
    local_views: Sequence[Tuple[Camera, jax.Array]],
    height: int,
    tile_size: int,
) -> Tuple[Camera, jax.Array]:
    """Assemble the global (B, ...) camera/target batch from per-process
    views without gathering images to any host. B = data axis size;
    len(local_views) must be B / process_count. Targets are padded to the
    strip-aligned height expected by make_sharded_train_step."""
    from .train import pad_targets, stack_cameras

    ntile = mesh.shape[TILE_AXIS]
    cams = stack_cameras([c for c, _ in local_views])
    gts = pad_targets(
        jnp.stack([g for _, g in local_views]), height, tile_size, ntile
    )
    cam_sharding = NamedSharding(mesh, P(DATA_AXIS))
    gt_sharding = NamedSharding(mesh, P(DATA_AXIS, TILE_AXIS))

    def globalize(x, sharding):
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    gcams = jax.tree_util.tree_map(lambda x: globalize(x, cam_sharding), cams)
    ggts = globalize(gts, gt_sharding)
    return gcams, ggts


def replicate(mesh: Mesh, tree):
    """Replicate a host-synchronized pytree (model/optimizer state) onto the
    global mesh. All processes must hold identical values (same seed or a
    restored checkpoint)."""
    sharding = NamedSharding(mesh, P())

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])

    return jax.tree_util.tree_map(put, tree)
