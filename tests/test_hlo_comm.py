"""HLO collective-bytes accounting (utils/hlo_comm.py) against known
lowerings on the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from gaussiansplat_tpu.utils.hlo_comm import (
    collective_bytes,
    compiled_collective_bytes,
)


def _mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device mesh")
    return Mesh(np.asarray(devs[:8]), ("x",))


def test_all_to_all_bytes():
    mesh = _mesh()

    @jax.jit
    @jax.tree_util.Partial(
        shard_map, mesh=mesh, in_specs=P("x"), out_specs=P("x"))
    def f(x):
        return jax.lax.all_to_all(
            x, "x", split_axis=0, concat_axis=0, tiled=True)

    x = jnp.zeros((64, 128, 16), jnp.float32)  # local (8, 128, 16)
    got, _ = compiled_collective_bytes(lambda y: f(y), 8, x)
    want = int(7 / 8 * 8 * 128 * 16 * 4)
    assert got.get("all-to-all", 0) == want
    assert got["total"] == want


def test_psum_and_ppermute_bytes():
    mesh = _mesh()

    @jax.jit
    @jax.tree_util.Partial(
        shard_map, mesh=mesh, in_specs=P("x", None), out_specs=P("x", None))
    def f(x):
        s = jax.lax.psum(x, "x")
        perm = [(i, (i + 1) % 8) for i in range(8)]
        return jax.lax.ppermute(s, "x", perm)

    x = jnp.zeros((8, 1024), jnp.float32)  # local (1, 1024)
    got, _ = compiled_collective_bytes(lambda y: f(y), 8, x)
    b = 1024 * 4
    assert got.get("all-reduce", 0) == int(2 * 7 / 8 * b)
    assert got.get("collective-permute", 0) == b


def test_text_parser_units():
    text = """
  %a2a = f32[8,100,16]{2,1,0} all-to-all(f32[8,100,16]{2,1,0} %p), dims={0}
  %ar = bf16[256]{0} all-reduce(bf16[256]{0} %q), to_apply=%add
  %cp.1 = (f32[64]{0}, f32[64]{0}) collective-permute(f32[64]{0} %r, f32[64]{0} %s)
  %done = f32[8,100,16]{2,1,0} all-to-all-done(f32[8,100,16]{2,1,0} %a2a2)
  %use = f32[4]{0} add(f32[4]{0} %all-to-all.3, f32[4]{0} %x)
"""
    got = collective_bytes(text, 4)
    assert got["all-to-all"] == int(3 / 4 * 8 * 100 * 16 * 4)
    assert got["all-reduce"] == int(2 * 3 / 4 * 256 * 2)
    assert got["collective-permute"] == 2 * 64 * 4
    # -done and operand-name mentions must not be double counted.
    assert got["total"] == (got["all-to-all"] + got["all-reduce"]
                            + got["collective-permute"])
