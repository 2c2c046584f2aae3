"""Capacity math (parallel/capacity.py): the closed-form byte budgets must
match the arrays the implementation actually allocates, and the config-4/5
placement answers must be consistent with the measured single-chip runs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussiansplat_tpu.config import RasterConfig
from gaussiansplat_tpu.models import random_model
from gaussiansplat_tpu.parallel import (
    max_gaussians_per_chip,
    min_devices_for,
    plan_gauss_sharded,
)


class TestCapacityPlan:
    def test_params_bytes_match_real_model(self):
        """The plan's parameter-shard bytes equal the real pytree's nbytes
        at the same local capacity (the plan rounds capacity to 128)."""
        plan = plan_gauss_sharded(100_000, 8, 1920, 1080, sh_degree=3)
        model = random_model(jax.random.PRNGKey(0), plan.local_capacity,
                             sh_degree=3)
        real = sum(
            np.asarray(x).nbytes
            for x in (model.means, model.quats, model.log_scales,
                      model.logit_opacities, model.sh_dc, model.sh_rest,
                      model.alive)
        )
        assert plan.params_bytes == real

    def test_optimizer_is_two_param_mirrors(self):
        plan = plan_gauss_sharded(100_000, 8, 1920, 1080, sh_degree=2)
        # Adam m+v mirror every f32 parameter channel (not the alive bytes).
        assert plan.optimizer_bytes == 2 * (plan.params_bytes
                                            - plan.local_capacity)

    def test_sharding_divides_param_memory(self):
        one = plan_gauss_sharded(8_000_000, 1, 1920, 1080, send_fraction=1.0)
        eight = plan_gauss_sharded(8_000_000, 8, 1920, 1080)
        assert 7.5 < one.params_bytes / eight.params_bytes < 8.5
        assert eight.total_bytes < one.total_bytes

    def test_single_chip_ceiling_brackets_measured_configs(self):
        """The measured on-chip runs bound the closed-form ceiling: the 4M
        4K config trains on one 16 GiB chip (BASELINE.md), so the ceiling
        must exceed 4M; a 64M config cannot hold its own parameters."""
        ceiling = max_gaussians_per_chip(3840, 2160, sh_degree=3)
        assert ceiling > 4_000_000
        assert ceiling < 64_000_000

    def test_config5_needs_multiple_chips_and_fits_a_pod_slice(self):
        """BASELINE config 5: 30M gaussians at 1080p cannot fit one chip but
        must place on a modest gauss mesh (<= 32 chips of 16 GiB)."""
        one = plan_gauss_sharded(30_000_000, 1, 1920, 1080,
                                 send_fraction=1.0)
        assert not one.fits()
        d = min_devices_for(30_000_000, 1920, 1080)
        assert 2 <= d <= 32
        assert plan_gauss_sharded(30_000_000, d, 1920, 1080).fits()

    def test_summary_mentions_key_quantities(self):
        plan = plan_gauss_sharded(30_000_000, 8, 1920, 1080)
        s = plan.summary()
        assert "30.0M" in s and "8 chips" in s and "GiB" in s

    def test_pair_capacity_follows_raster_config(self):
        tight = plan_gauss_sharded(
            1_000_000, 8, 1920, 1080,
            cfg=RasterConfig(pairs_per_gaussian=2.0))
        roomy = plan_gauss_sharded(
            1_000_000, 8, 1920, 1080,
            cfg=RasterConfig(pairs_per_gaussian=4.0))
        assert roomy.raster_bytes > tight.raster_bytes


class TestWeakScalingPredictor:
    """Compute-vs-ICI predictive model (parallel/capacity.py): the virtual
    CPU mesh cannot measure scaling (its devices share host cores), so the
    north star's >= 80% weak-scaling criterion is backed by this byte-level
    model calibrated from the measured single-chip step."""

    def test_comm_volume_matches_plan(self):
        from gaussiansplat_tpu.parallel.capacity import (
            ici_bytes_per_step, plan_gauss_sharded)

        plan = plan_gauss_sharded(30_000_000, 8, 1920, 1088)
        # fwd + bwd reverse all_to_all, off-diagonal slices only.
        expected = 2 * 7 * plan.send_cap * 16 * 4
        assert ici_bytes_per_step(plan) == expected

    def test_config5_predicts_above_criterion(self):
        from gaussiansplat_tpu.parallel.capacity import predicted_weak_scaling

        rows = predicted_weak_scaling(
            3_750_000, 1920, 1088, device_counts=[1, 2, 4, 8, 16])
        effs = [r["predicted_efficiency"] for r in rows]
        assert effs[0] == 1.0
        # monotone non-increasing in device count, still >= 0.8 at 16 chips
        assert all(a >= b for a, b in zip(effs, effs[1:]))
        assert effs[-1] >= 0.8

    def test_efficiency_degrades_with_slow_ici(self):
        from gaussiansplat_tpu.parallel.capacity import predicted_weak_scaling

        fast = predicted_weak_scaling(
            3_750_000, 1920, 1088, device_counts=[8], ici_gbps=100.0)
        slow = predicted_weak_scaling(
            3_750_000, 1920, 1088, device_counts=[8], ici_gbps=1.0)
        assert slow[0]["predicted_efficiency"] < fast[0]["predicted_efficiency"]
