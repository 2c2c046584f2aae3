"""Image comparison with an alpha-gate flip budget.

The rasterizers gate each splat at alpha >= alpha_min and q <= sigma^2
(ops/pallas/common.chunk_alpha; ops/tile_raster._chunk_alpha). When two
DIFFERENT q/alpha formulations are compared (fused Pallas kernels vs the
XLA twin — which computes q in factored form while the kernels use the
expanded-polynomial MXU form), a splat sitting within a few f32 ULPs of a
gate can legitimately pass on one side and fail on the other, changing a
handful of pixels by up to ~alpha_min each. A strict allclose is therefore
knife-edge flaky under ANY formulation change; this helper asserts a tight
bulk tolerance plus a small budget of gate-flip-scale outliers — the same
scheme the hardware gate uses (benchmarks/verify_tpu.check).
"""

import numpy as np


def assert_images_close(got, want, atol=1e-4, flip_atol=2.5 / 255.0,
                        max_flip_channels=24):
    """Bulk |diff| <= atol except for at most `max_flip_channels` channel
    entries, which must stay under `flip_atol` (a flipped splat contributes
    at most ~alpha_min ~= 1/255 of its color difference per channel)."""
    d = np.abs(np.asarray(got, np.float64) - np.asarray(want, np.float64))
    n_out = int((d > atol).sum())
    assert n_out <= max_flip_channels, (
        f"{n_out} channel entries exceed atol={atol} "
        f"(budget {max_flip_channels}); max|diff|={d.max():.3e}"
    )
    assert d.max() <= flip_atol, (
        f"max|diff|={d.max():.3e} exceeds the gate-flip envelope {flip_atol}"
    )
