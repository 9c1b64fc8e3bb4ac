"""ZNCC tests: exact template correlation and the fast tube approximation."""

import numpy as np
import pytest

import jax.numpy as jnp

from pnr_tpu.ops.zncc import ZnccTemplates, make_zncc_fn
from pnr_tpu.ops.zncc_fast import TubeZnccModel, build_tube_maps, make_tube_zncc_fn


def make_noisy_tube(shape=(16, 48, 96), radius=2.5, zdist=2.0, seed=3):
    rng = np.random.default_rng(seed)
    z, y, x = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    cy, cz = shape[1] / 2.0, shape[0] / 2.0
    d2 = (y - cy) ** 2 + ((z - cz) * zdist) ** 2
    vol = 200.0 * np.exp(-d2 / (2 * radius**2)) + rng.normal(0, 4, shape)
    return np.clip(vol, 0, 255).astype(np.uint8)


def _exact_scalar_zncc(img, pos, direction, sigmas):
    """Scalar oracle of znccBBB (tracker.cpp:1891-1964)."""
    from pnr_tpu.ops.zncc import _frac_range

    vx, vy, vz = direction
    nrm = np.sqrt(vx * vx + vy * vy)
    if nrm > 1e-4:
        sg = -1.0 if vy < 0 else 1.0
        ux, uy, uz = sg * vy / nrm, -sg * vx / nrm, 0.0
    else:
        ux, uy, uz = 1.0, 0.0, 0.0
    wx = uy * vz - uz * vy
    wy = -ux * vz + uz * vx
    wz = ux * vy - uy * vx

    l, h, w = img.shape

    def interp(x, y, z):
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

    best = -np.inf
    best_sig = 1.0
    for sig in sigmas:
        v2 = int(round(sig))
        u2 = int(round(3 * sig))
        pitch = max(1.0, 3 * sig / 12.0)
        vv = _frac_range(v2, pitch)
        uu = _frac_range(u2, pitch)
        vals, wgts = [], []
        for a in vv:
            for b in uu:
                for c in uu:
                    x = pos[0] + a * (-vx) + b * ux + c * wx
                    y = pos[1] + a * (-vy) + b * uy + c * wy
                    z = pos[2] + a * (-vz) + b * uz + c * wz
                    vals.append(interp(x, y, z))
                    wgts.append(np.exp(-(b * b + c * c) / (2 * sig * sig)))
        vals = np.asarray(vals)
        wgts = np.asarray(wgts)
        ag = vals.mean()
        aw = wgts.mean()
        corra = np.sum((vals - ag) * (wgts - aw))
        corrb = np.sum((vals - ag) ** 2)
        corrc = np.sum((wgts - aw) ** 2)
        corr = corra / np.sqrt(corrb * corrc) if corrb * corrc > 1e-38 else 0.0
        if corr > best:
            best, best_sig = corr, sig
    return best, best_sig


class TestExactZncc:
    def test_matches_scalar_oracle(self):
        img = make_noisy_tube()
        sigmas = (2.0, 3.0)
        tpl = ZnccTemplates(sigmas, is2d=False)
        fn = make_zncc_fn(tpl)
        queries = [
            ((48.0, 24.0, 8.0), (1.0, 0.0, 0.0)),
            ((48.0, 24.0, 8.0), (0.0, 1.0, 0.0)),
            ((20.5, 25.5, 8.5), (0.8, 0.6, 0.0)),
            ((10.0, 5.0, 2.0), (0.0, 0.0, 1.0)),
        ]
        pos = jnp.asarray([q[0] for q in queries], jnp.float32)
        dirs = jnp.asarray([q[1] for q in queries], jnp.float32)
        corr, sig = fn(jnp.asarray(img), pos, dirs)
        for i, (p, d) in enumerate(queries):
            want_corr, want_sig = _exact_scalar_zncc(img, p, d, sigmas)
            np.testing.assert_allclose(float(corr[i]), want_corr, atol=2e-3)
            assert float(sig[i]) == want_sig

    def test_on_axis_beats_off_axis(self):
        img = make_noisy_tube()
        tpl = ZnccTemplates((2.0, 3.0), is2d=False)
        fn = make_zncc_fn(tpl)
        pos = jnp.asarray([[48.0, 24.0, 8.0], [48.0, 10.0, 3.0]], jnp.float32)
        dirs = jnp.asarray([[1.0, 0, 0], [1.0, 0, 0]], jnp.float32)
        corr, _ = fn(jnp.asarray(img), pos, dirs)
        assert float(corr[0]) > 0.7
        assert float(corr[0]) > float(corr[1]) + 0.3


class TestTubeZncc:
    @pytest.fixture(scope="class")
    def setup(self):
        img = make_noisy_tube()
        sigmas = (2.0, 3.0)
        model = TubeZnccModel(sigmas, is2d=False)
        maps = build_tube_maps(jnp.asarray(img), model)
        tube_fn = make_tube_zncc_fn(model)
        exact_fn = make_zncc_fn(ZnccTemplates(sigmas, is2d=False))
        return img, maps, tube_fn, exact_fn

    def _grid_queries(self, img, rng, n=200):
        l, h, w = img.shape
        pos = np.stack(
            [
                rng.uniform(5, w - 5, n),
                rng.uniform(3, h - 3, n),
                rng.uniform(2, l - 2, n),
            ],
            axis=-1,
        ).astype(np.float32)
        d = rng.normal(size=(n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        return pos, d

    def test_tracks_exact_zncc(self, setup, rng):
        img, maps, tube_fn, exact_fn = setup
        pos, dirs = self._grid_queries(img, rng)
        c_tube, _ = tube_fn(maps, jnp.asarray(pos), jnp.asarray(dirs))
        c_exact, _ = exact_fn(jnp.asarray(img), jnp.asarray(pos), jnp.asarray(dirs))
        c_tube = np.asarray(c_tube)
        c_exact = np.asarray(c_exact)
        # strong rank agreement and bounded absolute deviation in the
        # decision-relevant region (corr above ~0.3)
        r = np.corrcoef(c_tube, c_exact)[0, 1]
        assert r > 0.9, f"correlation with exact zncc too low: {r}"
        hi = c_exact > 0.3
        if hi.any():
            mad = np.abs(c_tube[hi] - c_exact[hi]).mean()
            assert mad < 0.15, f"mean abs deviation too high: {mad}"

    def test_on_axis_high_and_directional(self, setup):
        img, maps, tube_fn, _ = setup
        pos = jnp.asarray(
            [[48.0, 24.0, 8.0], [48.0, 24.0, 8.0], [48.0, 6.0, 2.0]], jnp.float32
        )
        dirs = jnp.asarray([[1, 0, 0], [0, 1, 0], [1, 0, 0]], jnp.float32)
        corr, sig = tube_fn(maps, pos, dirs)
        assert float(corr[0]) > 0.6  # on-axis, aligned
        assert float(corr[0]) > float(corr[2]) + 0.3  # background is worse
        # radius estimate picks a sensible sigma on the tube
        assert float(sig[0]) in (2.0, 3.0)

    def test_affine_invariance(self, setup, rng):
        img, maps, tube_fn, _ = setup
        pos, dirs = self._grid_queries(img, rng, n=50)
        c1, _ = tube_fn(maps, jnp.asarray(pos), jnp.asarray(dirs))
        img2 = np.clip(img.astype(np.float32) * 0.5 + 40, 0, 255).astype(np.uint8)
        model = TubeZnccModel((2.0, 3.0), is2d=False)
        maps2 = build_tube_maps(jnp.asarray(img2), model)
        c2, _ = tube_fn(maps2, jnp.asarray(pos), jnp.asarray(dirs))
        # uint8 rounding of the transformed image perturbs slightly
        np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=0.08)


class TestTubeFieldScaleLever:
    """The Z-streamed / bfloat16 map field (VERDICT r4 item 2): the
    blocked f32 build must be BITWISE the monolithic build, and the
    bf16 field must stay inside the engine's reference-agreement
    envelope (calibrated on v5e: 1.8e-3 max corr err, 0.13% flips)."""

    def test_blocked_f32_build_ulp_exact(self):
        """Same values, same taps, same halo-complete inputs — the only
        divergence from the monolithic build is XLA's FMA grouping in
        the different graph context (measured max rel 3.5e-7)."""
        from pnr_tpu.ops.zncc_fast import (
            TubeZnccModel,
            build_tube_maps_packed,
            build_tube_maps_packed_blocked,
        )

        img = make_noisy_tube(shape=(40, 48, 96))
        model = TubeZnccModel((2.0, 3.0), is2d=False)
        mono = np.asarray(build_tube_maps_packed(jnp.asarray(img), model))
        for bz in (16, 24):  # dividing and tail-clamped
            blk = np.asarray(
                build_tube_maps_packed_blocked(
                    jnp.asarray(img), model, block_z=bz
                )
            )
            rel = np.abs(blk - mono) / np.maximum(np.abs(mono), 1.0)
            assert rel.max() < 2e-6, rel.max()

    def test_bf16_field_engine_parity(self, rng):
        from pnr_tpu.config import PNRConfig
        from pnr_tpu.smc.tracker import BatchedTracker

        img = make_noisy_tube(shape=(40, 48, 96))
        n = 150
        pos = np.stack(
            [rng.uniform(8, 88, n), rng.uniform(6, 42, n),
             rng.uniform(3, 37, n)], -1,
        ).astype(np.float32)
        d = rng.normal(size=(n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        corrs = {}
        for dt in ("f32", "bf16"):
            cfg = PNRConfig(
                sigmas=(2.0, 3.0), znccth=0.3, kappa=3.0, step=2, ni=8,
                np=10, zdist=2.0, nodepervol=4, vol=9, zncc_mode="tube",
                tube_map_dtype=dt,
            )
            tracker = BatchedTracker(cfg, is2d=False)
            field = tracker.prepare_field(jnp.asarray(img))
            assert field.dtype == (
                jnp.bfloat16 if dt == "bf16" else jnp.float32
            )
            c, s = tracker._patch_engine.eval_fused(
                field, jnp.asarray(pos)[:, None, :], jnp.asarray(d)[:, None, :]
            )
            corrs[dt] = (np.asarray(c)[:, 0], np.asarray(s)[:, 0])
        err = np.abs(corrs["bf16"][0] - corrs["f32"][0])
        flips = (corrs["bf16"][1] != corrs["f32"][1]).mean()
        assert err.max() < 8e-3, err.max()
        assert flips < 0.03, flips

    def test_bf16_field_e2e_same_class(self):
        """Forced-bf16 full pipeline lands on the phantom axis with a
        same-class tree as f32."""
        from pnr_tpu.config import PNRConfig
        from pnr_tpu.pipeline import reconstruction_func

        rng = np.random.default_rng(9)
        z, y, x = np.meshgrid(*[np.arange(s) for s in (24, 64, 96)], indexing="ij")
        d2 = (y - 32) ** 2 + ((z - 12) * 2.0) ** 2
        img = np.clip(
            200.0 * np.exp(-d2 / (2 * 3.0**2)) * (0.7 + 0.3 * np.sin(x / 4.0))
            * (x > 8) * (x < 88)  # interior end caps: edge-touching
            # plateaus are rejected by the MaximumFinder (seed.cpp:700)
            + rng.normal(0, 5, x.shape),
            0, 255,
        ).astype(np.uint8)
        trees = {}
        for dt in ("f32", "bf16"):
            cfg = PNRConfig(
                sigmas=(2.0, 3.0), tolerance=10.0, znccth=0.5, kappa=3.0,
                step=2, ni=40, np=10, zdist=2.0, nodepervol=4, vol=9,
                zncc_mode="tube", tube_map_dtype=dt, wave_size=32,
            )
            res = reconstruction_func(img, cfg, verbose=False)
            trees[dt] = res.tree
        n_f32, n_bf16 = len(trees["f32"]), len(trees["bf16"])
        assert n_bf16 > 5
        assert abs(n_bf16 - n_f32) <= max(5, int(0.3 * n_f32)), (n_f32, n_bf16)
        ys = np.asarray(trees["bf16"].y[1:])
        med_f32 = np.median(np.asarray(trees["f32"].y[1:]))
        assert abs(np.median(ys) - med_f32) < 2.0


class TestTubeZncc2D:
    def test_2d_maps_and_correlation(self, rng):
        """Tube mode on a single-slice volume: bilinear map sampling."""
        shape = (1, 48, 96)
        y, x = np.meshgrid(np.arange(48), np.arange(96), indexing="ij")
        img2 = 200.0 * np.exp(-((y - 24) ** 2) / (2 * 2.5**2)) + rng.normal(0, 4, (48, 96))
        vol = np.clip(img2, 0, 255).astype(np.uint8)[None]
        model = TubeZnccModel((2.0, 3.0), is2d=True)
        maps = build_tube_maps(jnp.asarray(vol), model)
        fn = make_tube_zncc_fn(model)
        pos = jnp.asarray([[48.0, 24.0, 0.0], [48.0, 8.0, 0.0]], jnp.float32)
        dirs = jnp.asarray([[1.0, 0, 0], [1.0, 0, 0]], jnp.float32)
        corr, sig = fn(maps, pos, dirs)
        assert float(corr[0]) > 0.5  # on the 2-D ridge, aligned
        assert float(corr[0]) > float(corr[1]) + 0.2  # background lower
        assert np.isfinite(np.asarray(corr)).all()


class TestTubePatchEngine:
    """Per-trace-patch engine (make_tube_patch_engine) vs the global
    gather formulation: identical math, different evaluation."""

    @pytest.fixture(scope="class")
    def setup(self):
        img = make_noisy_tube(shape=(24, 64, 96))
        sigmas = (2.0, 3.0)
        model = TubeZnccModel(sigmas, is2d=False)
        maps = build_tube_maps(jnp.asarray(img), model)
        gfn = make_tube_zncc_fn(model)
        from pnr_tpu.ops.zncc_fast import (
            build_tube_maps_packed,
            make_tube_patch_engine,
        )

        packed = build_tube_maps_packed(jnp.asarray(img), model)
        engine = make_tube_patch_engine(model, step=2.0)
        extract, corr = engine.extract, engine.corr
        return img, maps, packed, gfn, extract, corr

    def test_packed_maps_interleave(self, setup):
        """packed[s, z, y, 3x+c] == planar[3s+c, z, y, x]."""
        img, maps, packed, gfn, extract, corr = setup
        s3, l, h, w = maps.shape
        m = np.asarray(maps).reshape(s3 // 3, 3, l, h, w)
        want = np.moveaxis(m, 1, -1).reshape(s3 // 3, l, h, 3 * w)
        np.testing.assert_array_equal(np.asarray(packed), want)

    def test_matches_global_tube_zncc(self, setup, rng):
        img, maps, packed, gfn, extract, corr = setup
        t, n = 6, 15
        centers = np.stack(
            [rng.uniform(15, 80, t), rng.uniform(15, 48, t), rng.uniform(6, 18, t)],
            -1,
        ).astype(np.float32)
        pos = centers[:, None, :] + rng.uniform(-4, 4, (t, n, 3)).astype(np.float32)
        d = rng.normal(size=(t, n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        c_ref, s_ref = gfn(maps, jnp.asarray(pos.reshape(-1, 3)), jnp.asarray(d.reshape(-1, 3)))
        patches, corner = extract(packed, jnp.asarray(centers))
        c_new, s_new = corr(
            img.shape, patches, corner, jnp.asarray(pos), jnp.asarray(d)
        )
        np.testing.assert_allclose(
            np.asarray(c_new), np.asarray(c_ref).reshape(t, n), atol=2e-5
        )
        assert (np.asarray(s_new) == np.asarray(s_ref).reshape(t, n)).mean() > 0.99

    def test_reuse_windows_match_gather(self, setup, rng):
        """reuse>1 widens the windows; in-window samples stay exact."""
        img, maps, packed, gfn, extract, corr = setup
        from pnr_tpu.ops.zncc_fast import TubeZnccModel, make_tube_patch_engine

        model = TubeZnccModel((2.0, 3.0), is2d=False)
        eng = make_tube_patch_engine(model, step=2.0, reuse=3)
        t, n = 4, 9
        centers = np.stack(
            [rng.uniform(15, 80, t), rng.uniform(15, 48, t), rng.uniform(6, 18, t)],
            -1,
        ).astype(np.float32)
        pos = centers[:, None, :] + rng.uniform(-4, 4, (t, n, 3)).astype(np.float32)
        d = rng.normal(size=(t, n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        c_ref, _ = gfn(maps, jnp.asarray(pos.reshape(-1, 3)), jnp.asarray(d.reshape(-1, 3)))
        patches, corner = eng.extract(packed, jnp.asarray(centers))
        c_new, _ = eng.corr(img.shape, patches, corner, jnp.asarray(pos), jnp.asarray(d))
        np.testing.assert_allclose(
            np.asarray(c_new), np.asarray(c_ref).reshape(t, n), atol=2e-5
        )

    def test_edge_clamping_matches(self, setup, rng):
        """Points near the volume edge: both paths clamp to the bounds."""
        img, maps, packed, gfn, extract, corr = setup
        centers = np.asarray([[2.0, 2.0, 1.0], [94.0, 62.0, 22.0]], np.float32)
        pos = centers[:, None, :] + rng.uniform(-2, 2, (2, 8, 3)).astype(np.float32)
        d = rng.normal(size=(2, 8, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        c_ref, _ = gfn(maps, jnp.asarray(pos.reshape(-1, 3)), jnp.asarray(d.reshape(-1, 3)))
        patches, corner = extract(packed, jnp.asarray(centers))
        c_new, _ = corr(
            img.shape, patches, corner, jnp.asarray(pos), jnp.asarray(d)
        )
        np.testing.assert_allclose(
            np.asarray(c_new), np.asarray(c_ref).reshape(2, 8), atol=2e-5
        )


from conftest import cpu_numerics_marker

cpu_numerics = cpu_numerics_marker()


class TestHatSamplePallas:
    @cpu_numerics
    def test_interpret_matches_trilinear(self, rng):
        """The Pallas sampling kernel (interpret mode) == clamped trilinear."""
        from pnr_tpu.ops.pallas_sample import hat_sample_pallas, _roundup
        from pnr_tpu.ops.interp import trilinear

        t, s, pz, py, px, m = 2, 2, 8, 16, 24, 11
        pat = rng.normal(size=(t, s, 3, pz, py, px)).astype(np.float32)
        # x-major channel-packed lanes: 3*x + c (build_tube_maps_packed)
        packed = np.moveaxis(pat, 2, -1).reshape(t, s, pz, py, 3 * px)
        mpad = _roundup(m, 8)
        rel = np.zeros((t, s, mpad, 4), np.float32)
        rel[:, :, :m, 0] = rng.uniform(0, pz - 1.001, (t, s, m))
        rel[:, :, :m, 1] = rng.uniform(0, py - 1.001, (t, s, m))
        rel[:, :, :m, 2] = rng.uniform(0, px - 1.001, (t, s, m))
        out = np.asarray(
            hat_sample_pallas(jnp.asarray(packed), jnp.asarray(rel), interpret=True)
        )
        for ti in range(t):
            for si in range(s):
                for c in range(3):
                    ref = trilinear(
                        jnp.asarray(pat[ti, si, c]),
                        jnp.asarray(rel[ti, si, :m, 2]),
                        jnp.asarray(rel[ti, si, :m, 1]),
                        jnp.asarray(rel[ti, si, :m, 0]),
                    )
                    # bf16x3 hi/lo dots: ~2^-22 relative accuracy
                    np.testing.assert_allclose(
                        out[ti, si, :m, c], np.asarray(ref), atol=5e-5
                    )

    @cpu_numerics
    def test_fused_dma_variant_matches(self, rng):
        """hat_sample_fused (in-kernel DMA slicing) == hat_sample_pallas
        on the equivalent pre-extracted patches (interpret mode)."""
        from pnr_tpu.ops.pallas_sample import (
            hat_sample_fused,
            hat_sample_pallas,
            _roundup,
        )
        import jax

        t, s, pz, py, px, m = 3, 2, 8, 16, 24, 11
        l, h, w = 20, 40, 64
        maps = rng.normal(size=(3 * s, l, h, w)).astype(np.float32)
        # packed layout (S, l, h, 3w), lane 3*x + c
        maps_p = np.moveaxis(maps.reshape(s, 3, l, h, w), 1, -1).reshape(
            s, l, h, 3 * w
        )
        corners = np.stack(
            [
                rng.integers(0, l - pz, t),
                rng.integers(0, h - py, t),
                rng.integers(0, w - px, t),
            ],
            -1,
        ).astype(np.int32)
        mpad = _roundup(m, 8)
        rel = np.zeros((t, s, mpad, 4), np.float32)
        rel[:, :, :m, 0] = rng.uniform(0, pz - 1.001, (t, s, m))
        rel[:, :, :m, 1] = rng.uniform(0, py - 1.001, (t, s, m))
        rel[:, :, :m, 2] = rng.uniform(0, px - 1.001, (t, s, m))

        out_f = np.asarray(
            hat_sample_fused(
                jnp.asarray(maps_p),
                jnp.asarray(corners),
                jnp.asarray(rel.reshape(t, s * mpad, 4)),
                (pz, py, px),
                interpret=True,
            )
        ).reshape(t, s, mpad, 4)

        patches = np.stack(
            [
                maps_p[:, cz : cz + pz, cy : cy + py, 3 * cx : 3 * (cx + px)]
                for cz, cy, cx in corners
            ]
        )  # (t, s, pz, py, 3px) packed
        out_p = np.asarray(
            hat_sample_pallas(jnp.asarray(patches), jnp.asarray(rel), interpret=True)
        )
        np.testing.assert_allclose(
            out_f[:, :, :m, :3], out_p[:, :, :m, :3], atol=5e-5
        )
