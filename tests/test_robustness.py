"""Hostile-input / config-corner robustness of the full pipeline.

The reference crashes or silently misbehaves on several of these (no
validation beyond parameter ranges, `Advantra_plugin.cpp:2426-2731`
assumes a well-formed stack); the rebuild must degrade gracefully:
no exception, structurally valid (possibly empty) output.
"""

import dataclasses

import numpy as np
import pytest

from pnr_tpu.config import PNRConfig
from pnr_tpu.pipeline import reconstruction_func

FAST = PNRConfig(
    sigmas=(2.0,), somaradius=0, tolerance=10.0, znccth=0.5, kappa=2.0,
    step=2, ni=8, np=8, zdist=2.0, nodepervol=4, vol=9, wave_size=8,
)


def _check_result(res):
    """Structural invariants that hold for ANY input."""
    n = len(res.tree)
    assert n >= 1  # dummy node always present
    for i in range(1, n):
        for nb in res.tree.nbr[i]:
            assert 0 < nb < n
    assert res.trace_count >= 0
    assert np.all(np.isfinite(res.tree.x[1:] if n > 1 else []))


class TestDegenerateVolumes:
    def test_all_zero(self):
        res = reconstruction_func(np.zeros((8, 24, 24), np.uint8), FAST, verbose=False)
        _check_result(res)
        assert len(res.tree) == 1  # nothing to trace

    def test_all_saturated(self):
        """A constant 255 volume: one global plateau touching every
        border — MaximumFinder rejects it (faithful ImageJ semantics)."""
        res = reconstruction_func(
            np.full((8, 24, 24), 255, np.uint8), FAST, verbose=False
        )
        _check_result(res)
        assert len(res.tree) == 1

    def test_single_bright_voxel(self):
        vol = np.zeros((8, 24, 24), np.uint8)
        vol[4, 12, 12] = 255
        res = reconstruction_func(vol, FAST, verbose=False)
        _check_result(res)

    def test_two_level_quantized_noise(self):
        """Plateau-heavy tie-rich uint8 noise (the device seed-flood
        divergence battery's hostile class) through the FULL pipeline."""
        rng = np.random.default_rng(3)
        vol = (rng.integers(0, 2, (8, 24, 24)) * 200).astype(np.uint8)
        res = reconstruction_func(vol, FAST, verbose=False)
        _check_result(res)

    def test_min_depth_3d(self):
        """Z=2: the thinnest volume that is still 3-D."""
        rng = np.random.default_rng(4)
        z, y, x = np.meshgrid(*[np.arange(s) for s in (2, 24, 48)], indexing="ij")
        vol = np.clip(
            200.0 * np.exp(-((y - 12) ** 2) / 8.0) * (0.7 + 0.3 * np.sin(x / 4.0))
            + rng.normal(0, 5, (2, 24, 48)),
            0, 255,
        ).astype(np.uint8)
        res = reconstruction_func(vol, FAST, verbose=False)
        _check_result(res)

    def test_volume_smaller_than_template_reach(self):
        """Template reach (3*sigma_max ~ 18 vox at sigma 6) exceeds the
        volume: every sample clamps; must not crash."""
        rng = np.random.default_rng(5)
        vol = np.clip(
            rng.normal(80, 40, (4, 12, 12)), 0, 255
        ).astype(np.uint8)
        cfg = dataclasses.replace(FAST, sigmas=(2.0, 6.0))
        res = reconstruction_func(vol, cfg, verbose=False)
        _check_result(res)


class TestConfigCorners:
    @pytest.mark.parametrize("vol_param", [1, 5, 9, 11, 19, 27])
    def test_every_suppression_volume(self, vol_param):
        rng = np.random.default_rng(6)
        z, y, x = np.meshgrid(*[np.arange(s) for s in (8, 24, 48)], indexing="ij")
        img = np.clip(
            200.0 * np.exp(-((y - 12) ** 2 + ((z - 4) * 2.0) ** 2) / 8.0)
            * (0.7 + 0.3 * np.sin(x / 4.0))
            + rng.normal(0, 5, (8, 24, 48)),
            0, 255,
        ).astype(np.uint8)
        cfg = dataclasses.replace(FAST, vol=vol_param)
        res = reconstruction_func(img, cfg, verbose=False)
        _check_result(res)

    def test_minimal_particles_and_iterations(self):
        rng = np.random.default_rng(7)
        z, y, x = np.meshgrid(*[np.arange(s) for s in (8, 24, 48)], indexing="ij")
        img = np.clip(
            200.0 * np.exp(-((y - 12) ** 2 + ((z - 4) * 2.0) ** 2) / 8.0)
            * (0.7 + 0.3 * np.sin(x / 4.0))
            + rng.normal(0, 5, (8, 24, 48)),
            0, 255,
        ).astype(np.uint8)
        cfg = dataclasses.replace(FAST, ni=2, np=2, wave_size=4)
        res = reconstruction_func(img, cfg, verbose=False)
        _check_result(res)

    def test_step_larger_than_volume(self):
        """step=10 on a 24-voxel-wide stack: particles leave the volume
        in one hop; traces stop early rather than crash."""
        rng = np.random.default_rng(8)
        z, y, x = np.meshgrid(*[np.arange(s) for s in (8, 24, 24)], indexing="ij")
        img = np.clip(
            200.0 * np.exp(-((y - 12) ** 2 + ((z - 4) * 2.0) ** 2) / 8.0)
            * (0.7 + 0.3 * np.sin(x / 4.0))
            + rng.normal(0, 5, (8, 24, 24)),
            0, 255,
        ).astype(np.uint8)
        cfg = dataclasses.replace(FAST, step=10)
        res = reconstruction_func(img, cfg, verbose=False)
        _check_result(res)

    def test_soma_radius_larger_than_volume(self):
        """Erosion radius beyond every dimension: the soma stage finds
        nothing (or everything) but the pipeline completes."""
        rng = np.random.default_rng(9)
        vol = np.clip(
            rng.normal(120, 30, (8, 24, 24)), 0, 255
        ).astype(np.uint8)
        cfg = dataclasses.replace(FAST, somaradius=30)
        res = reconstruction_func(vol, cfg, verbose=False)
        _check_result(res)


class TestDtypeAndShapeValidation:
    def test_non_uint8_input_handled(self):
        """float / uint16 inputs are normalized, not rejected: the
        reference plugin accepts only V3D uint8 but a framework-level
        API should coerce deterministically."""
        rng = np.random.default_rng(10)
        z, y, x = np.meshgrid(*[np.arange(s) for s in (8, 24, 48)], indexing="ij")
        base = 200.0 * np.exp(
            -((y - 12) ** 2 + ((z - 4) * 2.0) ** 2) / 8.0
        ) * (0.7 + 0.3 * np.sin(x / 4.0)) + rng.normal(0, 5, (8, 24, 48))
        u8 = np.clip(base, 0, 255).astype(np.uint8)
        res8 = reconstruction_func(u8, FAST, verbose=False)
        res16 = reconstruction_func(
            (u8.astype(np.uint16) * 257), FAST, verbose=False
        )
        resf = reconstruction_func(u8.astype(np.float32) / 255.0, FAST, verbose=False)
        # same structure traced from every dtype encoding
        assert abs(len(res16.tree) - len(res8.tree)) <= max(3, len(res8.tree) // 3)
        assert abs(len(resf.tree) - len(res8.tree)) <= max(3, len(res8.tree) // 3)


class TestNaNRejection:
    def test_nan_volume_raises(self):
        vol = np.full((4, 16, 16), 0.5, np.float32)
        vol[2, 8, 8] = np.nan
        with pytest.raises(ValueError, match="NaN"):
            reconstruction_func(vol, FAST, verbose=False)

    def test_inf_volume_raises(self):
        vol = np.full((4, 16, 16), 0.5, np.float32)
        vol[2, 8, 8] = np.inf
        with pytest.raises(ValueError, match="infinite"):
            reconstruction_func(vol, FAST, verbose=False)
