"""The kernel ablation variants (speed-of-light decomposition probes) must
stay semantically tied to the production kernels: each drops EXACTLY its
component. Otherwise the priced components drift from what production runs
and the bench floors become fiction."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussiansplat_tpu.config import RasterConfig
from gaussiansplat_tpu.models import random_model
from gaussiansplat_tpu.ops import look_at
from gaussiansplat_tpu.ops.binning import bin_gaussians
from gaussiansplat_tpu.ops.pallas.backward import rasterize_backward
from gaussiansplat_tpu.ops.pallas.common import (
    NCH_PACKED,
    OUT_STOP,
    pack_payload_rows,
    unpack_grad_chunk,
)
from gaussiansplat_tpu.ops.pallas.forward import rasterize_forward
from gaussiansplat_tpu.ops.pallas.rasterize import _image_cotangents
from gaussiansplat_tpu.ops.projection import make_payload, project_gaussians
from gaussiansplat_tpu.ops.pallas.segreduce import segment_reduce_pairs
from gaussiansplat_tpu.ops.pallas.common import pack_grad_chunk


@pytest.fixture(scope="module")
def bwd_setup():
    w = h = 64
    cfg = RasterConfig(tile_size=16, chunk_size=128, pairs_per_gaussian=8.0)
    m = random_model(jax.random.PRNGKey(0), 512, sh_degree=1, extent=1.0,
                     opacity=0.8)
    cam = look_at(eye=(0, 0, -4.0), target=(0, 0, 0), fx=100.0, fy=100.0,
                  width=w, height=h)
    proj = project_gaussians(m.means, m.quats, m.log_scales,
                             m.logit_opacities, m.sh, cam, cfg,
                             sh_degree=1, alive=m.alive)
    b = bin_gaussians(proj, w, h, cfg, impl="pallas_interpret")
    payload = make_payload(proj)
    pt = jnp.concatenate(
        [pack_payload_rows(payload)[b.depth_order][b.sorted_ranks].T,
         jnp.zeros((NCH_PACKED, cfg.chunk_size), jnp.float32)], axis=1)
    ot = rasterize_forward(pt, b.tile_starts, w, h, cfg, interpret=True,
                           packed=True)
    stops = jnp.asarray(ot[:, OUT_STOP, 0], jnp.int32)
    dimg = jax.random.normal(jax.random.PRNGKey(3), (h, w, 3)) * 1e-3
    ct = _image_cotangents((dimg, jnp.zeros((h, w))), ot,
                           jnp.zeros((3,)), 16)[0]

    def run(ablate):
        out = rasterize_backward(pt, b.tile_starts, stops, ct, ot, w, h,
                                 cfg, interpret=True, packed=True,
                                 ablate=ablate)
        p = pt.shape[1] - cfg.chunk_size
        valid = jnp.arange(p, dtype=jnp.int32) < b.tile_starts[-1]
        d16 = unpack_grad_chunk(out[:, :p])
        return np.asarray(jnp.where(valid[None, :], d16, 0.0))

    return run


def test_nogeom_keeps_direct_rows(bwd_setup):
    full = bwd_setup("")
    nogeom = bwd_setup("nogeom")
    # geometry rows (0..5) zeroed, linear-channel rows preserved exactly
    assert np.all(nogeom[:6] == 0.0)
    np.testing.assert_allclose(nogeom[6:], full[6:], rtol=0, atol=1e-6)
    assert np.any(full[:6] != 0.0)


def test_nodirect_keeps_geom_rows(bwd_setup):
    full = bwd_setup("")
    nodirect = bwd_setup("nodirect")
    np.testing.assert_allclose(nodirect[:6], full[:6], rtol=0, atol=1e-6)
    assert np.all(nodirect[6:9] == 0.0)
    assert np.any(full[6:9] != 0.0)


def test_dmaonly_zeroes_everything(bwd_setup):
    assert np.all(bwd_setup("dmaonly") == 0.0)


def test_segreduce_ablates_vs_production():
    n, p = 1500, 4000
    key = jax.random.PRNGKey(0)
    bounds = jnp.sort(jax.random.randint(key, (n - 1,), 0, p))
    seg = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                           bounds.astype(jnp.int32),
                           jnp.full((1,), p, jnp.int32)])
    d8 = pack_grad_chunk(
        jax.random.normal(jax.random.PRNGKey(1), (16, p), jnp.float32))
    ref = segment_reduce_pairs(d8, seg, n, interpret=True, packed=True)
    # stacked is a production alias; split1 is lossy but close; constoh is
    # a timing-only probe and must NOT silently equal production.
    stacked = segment_reduce_pairs(d8, seg, n, interpret=True, packed=True,
                                   ablate="stacked")
    np.testing.assert_allclose(np.asarray(stacked), np.asarray(ref),
                               rtol=0, atol=1e-6)
    split1 = segment_reduce_pairs(d8, seg, n, interpret=True, packed=True,
                                  ablate="split1")
    err = float(jnp.max(jnp.abs(split1 - ref)))
    assert 1e-6 < err < 0.2
