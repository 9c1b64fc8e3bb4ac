"""Fused-Frangi kernel vs the XLA composition (interpret mode on CPU).

The fused Pallas kernel (ops/frangi_fused.py) must reproduce
`frangi3d` (itself oracle-verified against the compiled reference in
test_reference_parity.py). On structured signal the two agree to fp
noise; on weak/noise voxels the vesselness eigen-ratios are chaotic in
the last float bits, so noise-volume comparisons bound J8 levels and
signal-voxel directions instead of raw maxima.
"""

import numpy as np
import pytest

from pnr_tpu.ops.frangi import frangi3d, normalize_to_u8
from pnr_tpu.ops.frangi_fused import (
    _frangi3d_fused_impl,
    fits_fused,
    frangi3d_fused,
)

ZDIST = 2.0


def tube(shape, noise=0):
    rng = np.random.default_rng(3)
    z, y, x = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    d2 = (y - shape[1] / 2) ** 2 + ((z - shape[0] / 2) * ZDIST) ** 2
    v = 200.0 * np.exp(-d2 / (2 * 9.0))
    if noise:
        v = v + rng.integers(0, noise, shape)
    return np.clip(v, 0, 255).astype(np.uint8)


def run_fused(vol, sigmas, bz=8, by=16, **kw):
    return _frangi3d_fused_impl(
        vol, tuple(sigmas), ZDIST, 0.5, 0.5, 500.0, kw.get("blackwhite", False),
        bz, by, True,
    )


def dirs_aligned(j0, jmax0, v0, v1):
    m = np.asarray(j0) > 0.2 * float(jmax0)

    def dec(a):
        return np.asarray(a).astype(np.float32) / 255.0 * 2.0 - 1.0

    dot = sum(dec(a)[m] * dec(b)[m] for a, b in zip(v0, v1))
    return np.median(np.abs(dot)), (np.abs(dot) > 0.9).mean()


class TestFusedFrangi:
    def test_clean_tube_parity(self):
        vol = tube((16, 48, 72))
        sig = (2.0, 3.0)
        j0, jmin0, jmax0, *v0 = frangi3d(vol, sig, ZDIST)
        j1, jmin1, jmax1, *v1 = run_fused(vol, sig)
        scale = max(float(jmax0), 1e-12)
        assert np.abs(np.asarray(j0) - np.asarray(j1)).max() / scale < 1e-4
        assert abs(float(jmin0) - float(jmin1)) / scale < 1e-4
        assert abs(float(jmax0) - float(jmax1)) / scale < 1e-4
        med, frac = dirs_aligned(j0, jmax0, v0, v1)
        assert med > 0.99 and frac == 1.0

    def test_ragged_tiles_and_noise(self):
        # Z, Y not tile multiples; X not a lane multiple; noisy volume.
        vol = tube((20, 40, 100), noise=40)
        sig = (2.0, 3.0)
        j0, jmin0, jmax0, *v0 = frangi3d(vol, sig, ZDIST)
        j1, jmin1, jmax1, *v1 = run_fused(vol, sig)
        assert np.asarray(j1).shape == vol.shape
        j8a = np.asarray(normalize_to_u8(j0, jmin0, jmax0)).astype(int)
        j8b = np.asarray(normalize_to_u8(j1, jmin1, jmax1)).astype(int)
        # weak-voxel eigen chaos moves a few quantization levels at a
        # tiny fraction of voxels; structured response is identical
        assert np.abs(j8a - j8b).max() <= 8
        assert (j8a != j8b).mean() < 0.01
        med, frac = dirs_aligned(j0, jmax0, v0, v1)
        assert med > 0.99 and frac > 0.95

    def test_mixed_sigma_ring_depth(self):
        """Regression: sigmas with different z half-widths (hz < HZ)
        share one per-plane processing front; each sigma's ring must
        retain the front planes until ITS z-window needs them, tiles
        later. The old bz + 2*hz + 4 ring sizing gated those stores out
        and served one-lap-stale planes instead — up to ~59% error on
        bright volumes spanning several z-tiles. Bright-everywhere
        signal + small bz + spread hz (2 vs 9 at sigmas (2,6)/zdist 2)
        maximizes exposure; parity must hold to fp noise."""
        rng = np.random.default_rng(1)
        shape = (24, 40, 72)
        z, y, x = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
        d2 = (y - 20) ** 2 + ((z - 12) * ZDIST) ** 2
        vol = np.clip(
            200.0 * np.exp(-d2 / 18.0) * (0.7 + 0.3 * np.sin(x / 4.0))
            + rng.normal(0, 20, shape) + 40.0,
            0, 255,
        ).astype(np.uint8)
        for sig in [(2.0, 6.0), (2.0, 4.0, 6.0)]:
            j0, jmin0, jmax0, *v0 = frangi3d(vol, sig, ZDIST)
            j0 = np.asarray(j0)
            scale = max(float(jmax0), 1e-12)
            strong = j0 > 0.1 * scale
            for bz, by in [(4, 16), (8, 16)]:
                j1, jmin1, jmax1, *v1 = run_fused(vol, sig, bz=bz, by=by)
                j1 = np.asarray(j1)
                # structured response to fp noise (weak/border voxels
                # can flip the lambda-sign gate — see module docstring);
                # the stale-ring bug scored 0.30-0.59 here
                err = np.abs(j0[strong] - j1[strong]).max() / scale
                assert err < 1e-4, (sig, bz, by, err)
                j8a = np.asarray(normalize_to_u8(j0, jmin0, jmax0)).astype(int)
                j8b = np.asarray(normalize_to_u8(j1, jmin1, jmax1)).astype(int)
                assert np.abs(j8a - j8b).max() <= 8, (sig, bz, by)
                assert (j8a != j8b).mean() < 0.01, (sig, bz, by)

    def test_blackwhite_and_single_sigma(self):
        vol = 255 - tube((16, 32, 72))  # dark ridge on bright bg
        j0, jmin0, jmax0, *_ = frangi3d(
            vol, (2.0,), ZDIST, blackwhite=True
        )
        j1, jmin1, jmax1, *_ = run_fused(vol, (2.0,), blackwhite=True)
        scale = max(float(jmax0), 1e-12)
        assert np.abs(np.asarray(j0) - np.asarray(j1)).max() / scale < 1e-4

    def test_fallback_paths(self):
        vol = tube((16, 32, 72))
        # 2-D and tiny volumes fall back to the XLA path
        assert not fits_fused((1, 32, 72), (2.0,), ZDIST)
        assert not fits_fused((4, 32, 72), (2.0,), ZDIST, bz=8)
        out = frangi3d_fused(vol[:4], (2.0,), ZDIST)
        ref = frangi3d(vol[:4], (2.0,), ZDIST)
        np.testing.assert_allclose(
            np.asarray(out[0]), np.asarray(ref[0]), rtol=0, atol=0
        )

    def test_vmem_gate(self):
        # huge sigma at zdist 1 must be rejected, not crash
        assert not fits_fused((64, 512, 512), (2.0, 12.0, 24.0), 1.0)
