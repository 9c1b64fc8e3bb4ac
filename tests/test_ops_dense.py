"""Dense-op unit tests against NumPy/SciPy oracles (SURVEY.md §4 test plan)."""

import numpy as np
import pytest
import scipy.ndimage as ndi

import jax.numpy as jnp

from pnr_tpu.ops.gaussian import conv1d_along_axis, gaussian_kernel, imgaussian3d
from pnr_tpu.ops.hessian import hessian3d
from pnr_tpu.ops.eig3 import eigh3x3_vessel
from pnr_tpu.ops.frangi import frangi3d, normalize_to_u8
from pnr_tpu.ops.morphology import imdilate_xy, imerode_xy, imerode_xyz
from pnr_tpu.ops.thresholds import intermodes_th, maxentropy_th, otsu_th
from pnr_tpu.ops.interp import trilinear


def _ref_gaussian3d(vol_u8, sigma, zdist):
    """Oracle mirroring frangi.cpp:647-784 via scipy 1-D correlations."""
    kxy = gaussian_kernel(sigma).astype(np.float64)
    kz = gaussian_kernel(sigma / zdist).astype(np.float64)
    f = vol_u8.astype(np.float64)
    f = ndi.correlate1d(f, kxy, axis=2, mode="nearest")
    f = ndi.correlate1d(f, kxy, axis=1, mode="nearest")
    f = ndi.correlate1d(f, kz, axis=0, mode="nearest")
    return f


class TestGaussian:
    def test_kernel_normalized(self):
        k = gaussian_kernel(2.0)
        assert k.shape == (2 * 6 + 1,)
        np.testing.assert_allclose(k.sum(), 1.0, rtol=1e-6)

    def test_conv1d_matches_scipy(self, rng):
        x = rng.random((4, 9, 17)).astype(np.float32)
        k = gaussian_kernel(1.5)
        got = np.asarray(conv1d_along_axis(jnp.asarray(x), jnp.asarray(k), axis=2))
        want = ndi.correlate1d(x, k, axis=2, mode="nearest")
        np.testing.assert_allclose(got, want, atol=1e-5)

    @pytest.mark.parametrize("sigma", [1.0, 2.0, 3.0])
    def test_imgaussian3d(self, rng, sigma):
        vol = (rng.random((8, 24, 32)) * 255).astype(np.uint8)
        got = np.asarray(imgaussian3d(jnp.asarray(vol), sigma, 2.0))
        want = _ref_gaussian3d(vol, sigma, 2.0)
        np.testing.assert_allclose(got, want, atol=2e-3)

    def test_imgaussian3d_single_slice_skips_z(self, rng):
        vol = (rng.random((1, 16, 16)) * 255).astype(np.uint8)
        got = np.asarray(imgaussian3d(jnp.asarray(vol), 2.0, 2.0))
        kxy = gaussian_kernel(2.0).astype(np.float64)
        want = ndi.correlate1d(vol[0].astype(np.float64), kxy, axis=1, mode="nearest")
        want = ndi.correlate1d(want, kxy, axis=0, mode="nearest")
        np.testing.assert_allclose(got[0], want, atol=2e-3)


class TestHessian:
    def test_second_derivative_matches_gradient_oracle(self, rng):
        vol = (rng.random((6, 20, 28)) * 255).astype(np.uint8)
        sigma, zdist = 2.0, 2.0
        dzz, dyy, dyz, dxx, dxy, dxz = [
            np.asarray(a) for a in hessian3d(jnp.asarray(vol), sigma, zdist)
        ]
        f = _ref_gaussian3d(vol, sigma, zdist)
        s2 = sigma * sigma
        dz = np.gradient(f, axis=0)
        dy = np.gradient(f, axis=1)
        dx = np.gradient(f, axis=2)
        np.testing.assert_allclose(dzz, np.gradient(dz, axis=0) * s2, atol=1e-2)
        np.testing.assert_allclose(dyy, np.gradient(dy, axis=1) * s2, atol=1e-2)
        np.testing.assert_allclose(dyz, np.gradient(dy, axis=0) * s2, atol=1e-2)
        np.testing.assert_allclose(dxx, np.gradient(dx, axis=2) * s2, atol=1e-2)
        np.testing.assert_allclose(dxy, np.gradient(dx, axis=1) * s2, atol=1e-2)
        np.testing.assert_allclose(dxz, np.gradient(dx, axis=0) * s2, atol=1e-2)


class TestEig3:
    def _random_sym(self, rng, n):
        a = rng.normal(size=(n, 3, 3)) * 10
        return (a + np.swapaxes(a, 1, 2)) / 2

    def test_eigenvalues_match_eigh(self, rng):
        m = self._random_sym(rng, 2000).astype(np.float32)
        lam1, lam2, lam3, vx, vy, vz = [
            np.asarray(o)
            for o in eigh3x3_vessel(
                jnp.asarray(m[:, 0, 0]),
                jnp.asarray(m[:, 1, 1]),
                jnp.asarray(m[:, 2, 2]),
                jnp.asarray(m[:, 0, 1]),
                jnp.asarray(m[:, 0, 2]),
                jnp.asarray(m[:, 1, 2]),
            )
        ]
        w = np.linalg.eigvalsh(m.astype(np.float64))
        order = np.argsort(np.abs(w), axis=1)
        w_sorted = np.take_along_axis(w, order, axis=1)
        scale = np.maximum(np.abs(w_sorted).max(axis=1), 1.0)
        np.testing.assert_allclose(lam1 / scale, w_sorted[:, 0] / scale, atol=5e-5)
        np.testing.assert_allclose(lam2 / scale, w_sorted[:, 1] / scale, atol=5e-5)
        np.testing.assert_allclose(lam3 / scale, w_sorted[:, 2] / scale, atol=5e-5)

    def test_eigenvector_is_eigenvector(self, rng):
        m = self._random_sym(rng, 500).astype(np.float32)
        lam1, _, _, vx, vy, vz = [
            np.asarray(o)
            for o in eigh3x3_vessel(
                jnp.asarray(m[:, 0, 0]),
                jnp.asarray(m[:, 1, 1]),
                jnp.asarray(m[:, 2, 2]),
                jnp.asarray(m[:, 0, 1]),
                jnp.asarray(m[:, 0, 2]),
                jnp.asarray(m[:, 1, 2]),
            )
        ]
        v = np.stack([vx, vy, vz], axis=-1)
        np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-4)
        av = np.einsum("nij,nj->ni", m.astype(np.float64), v)
        resid = np.linalg.norm(av - lam1[:, None] * v, axis=1)
        scale = np.maximum(np.abs(m).reshape(len(m), -1).max(axis=1), 1.0)
        assert np.quantile(resid / scale, 0.99) < 1e-3

    def test_diagonal_and_degenerate(self):
        a11 = jnp.asarray([2.0, 1.0, 0.0])
        a22 = jnp.asarray([-5.0, 1.0, 0.0])
        a33 = jnp.asarray([1.0, 1.0, 0.0])
        zero = jnp.zeros(3)
        lam1, lam2, lam3, vx, vy, vz = eigh3x3_vessel(a11, a22, a33, zero, zero, zero)
        np.testing.assert_allclose(np.asarray(lam1)[0], 1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(lam2)[0], 2.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(lam3)[0], -5.0, atol=1e-5)
        # identity / zero matrices: no NaNs, unit vector out
        v = np.stack([vx, vy, vz], axis=-1)
        assert np.all(np.isfinite(v))
        np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-5)


def make_tube_volume(shape=(16, 64, 64), radius=3.0, zdist=2.0):
    """Synthetic bright tube along x at the volume centre."""
    z, y, x = np.meshgrid(
        np.arange(shape[0]), np.arange(shape[1]), np.arange(shape[2]), indexing="ij"
    )
    cy, cz = shape[1] / 2.0, shape[0] / 2.0
    d2 = (y - cy) ** 2 + ((z - cz) * zdist) ** 2
    vol = 200.0 * np.exp(-d2 / (2 * radius**2))
    return np.clip(vol, 0, 255).astype(np.uint8)


class TestFrangi:
    def test_tube_response_peaks_on_axis(self):
        vol = make_tube_volume()
        j, jmin, jmax, vx, vy, vz = frangi3d(jnp.asarray(vol), (2.0, 3.0), 2.0)
        j = np.asarray(j)
        assert np.isfinite(j).all()
        # response on the tube axis dominates off-axis response
        axis_resp = j[8, 32, 20:44].mean()
        off_resp = j[2, 8, 20:44].mean()
        assert axis_resp > 10 * max(off_resp, 1e-9)
        # direction on the axis is +-x
        vxa = (np.asarray(vx)[8, 32, 30] / 255.0) * 2 - 1
        vya = (np.asarray(vy)[8, 32, 30] / 255.0) * 2 - 1
        vza = (np.asarray(vz)[8, 32, 30] / 255.0) * 2 - 1
        assert abs(vxa) > 0.95
        assert abs(vya) < 0.2 and abs(vza) < 0.2

    def test_normalize_to_u8(self):
        j = jnp.asarray([[0.0, 0.5, 1.0]])
        out = np.asarray(normalize_to_u8(j, jnp.float32(0.0), jnp.float32(1.0)))
        np.testing.assert_array_equal(out, [[0, 128, 255]])
        flat = np.asarray(normalize_to_u8(j, jnp.float32(0.5), jnp.float32(0.5)))
        np.testing.assert_array_equal(flat, [[0, 0, 0]])


class TestMorphology:
    def test_erode_dilate_match_scipy(self, rng):
        vol = (rng.random((3, 20, 20)) * 255).astype(np.uint8)
        rad = 2.0
        size = 2 * int(np.ceil(rad)) + 1
        got_e = np.asarray(imerode_xy(jnp.asarray(vol), rad))
        want_e = np.stack(
            [ndi.grey_erosion(s, size=(size, size), mode="nearest") for s in vol]
        )
        np.testing.assert_array_equal(got_e, want_e)

        got_d = np.asarray(imdilate_xy(jnp.asarray(vol), rad))
        want_d = np.stack(
            [ndi.grey_dilation(s, size=(size, size), mode="nearest") for s in vol]
        )
        np.testing.assert_array_equal(got_d, want_d)

    def test_erode_xyz_z_radius_scaled(self, rng):
        vol = (rng.random((8, 10, 10)) * 255).astype(np.uint8)
        rad, zdist = 2.0, 2.0
        got = np.asarray(imerode_xyz(jnp.asarray(vol), rad, zdist))
        sxy = 2 * int(np.ceil(rad)) + 1
        sz = 2 * int(np.ceil(rad / zdist)) + 1
        want = ndi.grey_erosion(vol, size=(sz, sxy, sxy), mode="nearest")
        np.testing.assert_array_equal(got, want)


class TestThresholds:
    def _bimodal_img(self, rng):
        a = rng.normal(50, 8, size=4000)
        b = rng.normal(180, 12, size=2000)
        return np.clip(np.concatenate([a, b]), 0, 255).astype(np.uint8)

    def test_maxentropy_oracle(self, rng):
        img = self._bimodal_img(rng)
        th = maxentropy_th(img)
        want = _maxentropy_reference(img)
        assert abs(th - want) <= 1

    def test_otsu_separates_modes(self, rng):
        img = self._bimodal_img(rng)
        th = otsu_th(img)
        assert 70 < th < 170

    def test_intermodes(self, rng):
        img = self._bimodal_img(rng)
        th = intermodes_th(img)
        assert 70 < th < 170


def _maxentropy_reference(img):
    """Direct scalar port of the Kapur criterion for oracle comparison."""
    hist, _ = np.histogram(img, bins=256, range=(0, 256))
    p = hist / hist.sum()
    pt = np.cumsum(p)
    best_t, best_j = 0, -np.inf
    for t in range(256):
        hb = 0.0
        if pt[t] > 1e-38:
            for i in range(t + 1):
                if p[i] > 1e-38:
                    hb -= p[i] / pt[t] * np.log(p[i] / pt[t])
        hw = 0.0
        ptw = 1 - pt[t]
        if ptw > 1e-38:
            for i in range(t + 1, 256):
                if p[i] > 1e-38:
                    hw -= p[i] / ptw * np.log(p[i] / ptw)
        if hb + hw > best_j:
            best_j, best_t = hb + hw, t
    return best_t


class TestTrilinear:
    def test_matches_direct_formula(self, rng):
        vol = (rng.random((5, 7, 9)) * 255).astype(np.uint8)
        xs = rng.uniform(-1, 10, size=50)
        ys = rng.uniform(-1, 8, size=50)
        zs = rng.uniform(-1, 6, size=50)
        got = np.asarray(trilinear(jnp.asarray(vol), jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(zs)))
        want = np.array([_interp_ref(vol, x, y, z) for x, y, z in zip(xs, ys, zs)])
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_2d_volume_ignores_z(self, rng):
        vol = (rng.random((1, 7, 9)) * 255).astype(np.uint8)
        got = np.asarray(trilinear(jnp.asarray(vol), jnp.asarray([2.5]), jnp.asarray([3.25]), jnp.asarray([99.0])))
        want = _interp_ref_2d(vol[0], 2.5, 3.25)
        np.testing.assert_allclose(got[0], want, atol=1e-4)


def _interp_ref(img, x, y, z):
    """Scalar oracle of Tracker::interp (tracker.cpp:2138-2215)."""
    l, h, w = img.shape
    xc = min(max(x, 0.0), w - 1.001)
    x1 = int(xc)
    xf = xc - x1
    yc = min(max(y, 0.0), h - 1.001)
    y1 = int(yc)
    yf = yc - y1
    zc = min(max(z, 0.0), l - 1.001)
    z1 = int(zc)
    zf = zc - z1
    i = img.astype(np.float64)
    p1 = (1 - yf) * ((1 - xf) * i[z1, y1, x1] + xf * i[z1, y1, x1 + 1]) + yf * (
        (1 - xf) * i[z1, y1 + 1, x1] + xf * i[z1, y1 + 1, x1 + 1]
    )
    p2 = (1 - yf) * ((1 - xf) * i[z1 + 1, y1, x1] + xf * i[z1 + 1, y1, x1 + 1]) + yf * (
        (1 - xf) * i[z1 + 1, y1 + 1, x1] + xf * i[z1 + 1, y1 + 1, x1 + 1]
    )
    return (1 - zf) * p1 + zf * p2


def _interp_ref_2d(img, x, y):
    h, w = img.shape
    xc = min(max(x, 0.0), w - 1.001)
    x1 = int(xc)
    xf = xc - x1
    yc = min(max(y, 0.0), h - 1.001)
    y1 = int(yc)
    yf = yc - y1
    i = img.astype(np.float64)
    return (1 - yf) * ((1 - xf) * i[y1, x1] + xf * i[y1, x1 + 1]) + yf * (
        (1 - xf) * i[y1 + 1, x1] + xf * i[y1 + 1, x1 + 1]
    )


class TestPallasConv:
    @pytest.mark.skipif(
        jnp.zeros(1).devices().pop().platform == "cpu",
        reason="Mosaic kernel requires TPU",
    )
    def test_matches_xla_conv(self, rng):
        import jax

        from pnr_tpu.ops.pallas_conv import pallas_conv1d_along_axis

        vol = jnp.asarray((rng.random((16, 64, 128)) * 255).astype(np.uint8))
        k = gaussian_kernel(3.0)
        for axis in (0, 1, 2):
            got = np.asarray(jax.jit(
                lambda v, a=axis: pallas_conv1d_along_axis(v, k, a)
            )(vol))
            want = np.asarray(conv1d_along_axis(vol.astype(jnp.float32), jnp.asarray(k), axis))
            np.testing.assert_allclose(got, want, atol=1e-4)


class TestFrangiBlocked:
    def test_matches_unblocked(self, rng):
        from pnr_tpu.ops.frangi_blocked import frangi3d_blocked

        # deep enough for 3 tiles + the true-border thin-slab fix;
        # 46 not divisible by block_z
        vol = make_tube_volume(shape=(46, 40, 48))
        vol = np.clip(
            vol.astype(np.int16) + rng.normal(0, 4, vol.shape), 0, 255
        ).astype(np.uint8)
        sigmas = (2.0, 3.0)
        j_ref, jmin_r, jmax_r, vx_r, vy_r, vz_r = frangi3d(jnp.asarray(vol), sigmas, 2.0)
        j, jmin, jmax, vx, vy, vz = frangi3d_blocked(
            jnp.asarray(vol), sigmas, 2.0, block_z=16
        )
        # BITWISE equal incl. the global border slices (the tiles'
        # padded-edge gradient semantics are corrected by the exact
        # thin-slab pass — same border story as the sharded aligned halo)
        np.testing.assert_array_equal(np.asarray(j), np.asarray(j_ref))
        np.testing.assert_array_equal(np.asarray(vx), np.asarray(vx_r))
        np.testing.assert_array_equal(np.asarray(vy), np.asarray(vy_r))
        np.testing.assert_array_equal(np.asarray(vz), np.asarray(vz_r))
        # Jmin reduces the FIRST-scale response (reference running-min
        # semantics) — bitwise, so J8 normalization matches exactly
        assert float(jmin) == float(jmin_r)
        np.testing.assert_allclose(float(jmax), float(jmax_r), rtol=1e-6)

    def test_shallow_volume_exact(self, rng):
        """Below the tiling depth the blocked API degrades to the
        monolithic path — still exact."""
        from pnr_tpu.ops.frangi_blocked import frangi3d_blocked

        vol = (rng.random((20, 16, 24)) * 255).astype(np.uint8)
        j_ref = np.asarray(frangi3d(jnp.asarray(vol), (2.0, 3.0), 2.0)[0])
        j = np.asarray(frangi3d_blocked(jnp.asarray(vol), (2.0, 3.0), 2.0, block_z=8)[0])
        np.testing.assert_array_equal(j, j_ref)

    def test_tiled_2d_matches_unblocked(self, rng):
        """2-axis aligned-window tiling (the pod-shard-plane variant) is
        BITWISE frangi3d including every border and corner: windows
        shift inside the volume, so a tile edge is the true border
        exactly when the kept region needs one-sided semantics there —
        no padding, no recompute strips."""
        from pnr_tpu.ops.frangi_blocked import frangi3d_tiled

        vol = make_tube_volume(shape=(48, 64, 48))
        vol = np.clip(
            vol.astype(np.int16) + rng.normal(0, 4, vol.shape), 0, 255
        ).astype(np.uint8)
        sigmas = (2.0, 3.0)
        ref = frangi3d(jnp.asarray(vol), sigmas, 2.0)
        # 16 | 48 and 16 | 64 (exact grid) AND a non-dividing block_y
        # (tail tiles clamp their kept start — overlap rows recompute
        # identical values)
        for bz, by in ((16, 16), (16, 24)):
            got = frangi3d_tiled(
                jnp.asarray(vol), sigmas, 2.0, block_z=bz, block_y=by
            )
            for g, r in zip(
                (got[0], got[3], got[4], got[5]),
                (ref[0], ref[3], ref[4], ref[5]),
            ):
                np.testing.assert_array_equal(np.asarray(g), np.asarray(r))
            assert float(got[1]) == float(ref[1])  # first-scale Jmin, bitwise
            np.testing.assert_allclose(float(got[2]), float(ref[2]), rtol=1e-6)

    def test_frangi2d_tiled_matches_unblocked(self, rng):
        """The gigapixel-slide 2-D tiler is bitwise frangi2d, borders
        and non-dividing tails included (the reference's first-class
        P == 1 path at whole-slide scale)."""
        from pnr_tpu.ops.frangi import frangi2d
        from pnr_tpu.ops.frangi_blocked import frangi2d_tiled

        y, x = np.meshgrid(np.arange(96), np.arange(112), indexing="ij")
        img = np.clip(
            200.0 * np.exp(-((y - 48) ** 2) / (2 * 2.5**2))
            * (0.7 + 0.3 * np.sin(x / 4.0)) * (x > 6) * (x < 100)
            + rng.normal(0, 5, (96, 112)),
            0, 255,
        ).astype(np.uint8)
        sigmas = (2.0, 3.0)
        ref = frangi2d(jnp.asarray(img), sigmas)
        for by, bx in ((32, 48), (40, 33)):  # dividing and tail cases
            got = frangi2d_tiled(
                jnp.asarray(img), sigmas, block_y=by, block_x=bx
            )
            np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(ref[0]))
            np.testing.assert_array_equal(np.asarray(got[3]), np.asarray(ref[3]))
            np.testing.assert_array_equal(np.asarray(got[4]), np.asarray(ref[4]))
            assert float(got[1]) == float(ref[1])  # first-scale Jmin, bitwise
            np.testing.assert_allclose(float(got[2]), float(ref[2]), rtol=1e-6)

    def test_pick_blocks_bounds(self):
        from pnr_tpu.ops.frangi_blocked import (
            frangi_halo_y,
            frangi_halo_z,
            pick_blocks,
        )

        sig = (2.0, 4.0, 6.0)
        for shape in ((150, 2048, 2048), (128, 1024, 1024), (256, 768, 768),
                      (534, 1024, 1024)):
            blocks = pick_blocks(shape, sig, 2.0)
            assert blocks is not None, shape
            bz, by = blocks
            assert 1 <= bz <= shape[0] and 8 <= by <= shape[1]
            tile = (min(bz, shape[0]) + 2 * frangi_halo_z(sig, 2.0)) * (
                min(by, shape[1]) + 2 * frangi_halo_y(sig)
            ) * shape[2]
            assert tile <= 32 * 1024 * 1024 * 1.5, (shape, blocks, tile)


class TestPallasConvInterpret:
    """CPU (interpret-mode) coverage of the Mosaic conv kernels' logic —
    the same kernel bodies the TPU path compiles (the TPU-only class
    above additionally validates the real Mosaic lowering)."""

    def test_axis_passes_match_xla(self, rng):
        from pnr_tpu.ops.pallas_conv import _pallas_conv

        vol = jnp.asarray((rng.random((6, 40, 136)) * 255).astype(np.uint8))
        k = gaussian_kernel(2.0)
        for axis in (0, 1, 2):
            got = np.asarray(
                _pallas_conv(
                    vol, tuple(float(t) for t in k), axis, False, interpret=True
                )
            )
            want = np.asarray(
                conv1d_along_axis(vol.astype(jnp.float32), jnp.asarray(k), axis)
            )
            np.testing.assert_allclose(got, want, atol=1e-3)

    def test_grad_border_matches_gradient(self, rng):
        from pnr_tpu.ops.pallas_conv import _pallas_conv

        vol = jnp.asarray(rng.random((6, 24, 136)).astype(np.float32))
        diff = (0.5, 0.0, -0.5)
        for axis in (0, 1, 2):
            got = np.asarray(_pallas_conv(vol, diff, axis, True, interpret=True))
            want = -np.gradient(np.asarray(vol), axis=axis)
            np.testing.assert_allclose(got, want, atol=1e-5)

    def test_fused_yx_matches_two_passes(self, rng):
        from pnr_tpu.ops.pallas_conv import _pallas_conv_yx

        vol = jnp.asarray((rng.random((4, 48, 136)) * 255).astype(np.uint8))
        ky = gaussian_kernel(2.0)
        kx = gaussian_kernel(1.5)
        got = np.asarray(
            _pallas_conv_yx(
                vol,
                tuple(float(t) for t in ky),
                tuple(float(t) for t in kx),
                interpret=True,
            )
        )
        want = conv1d_along_axis(vol.astype(jnp.float32), jnp.asarray(kx), axis=2)
        want = np.asarray(conv1d_along_axis(want, jnp.asarray(ky), axis=1))
        np.testing.assert_allclose(got, want, atol=1e-3)
