"""Host one-shot engine vs the device pipeline.

Layered parity gates:
1. threefry PRNG — BITWISE vs jax.random (the host tracer replays the
   device tracer's random streams exactly).
2. dense filters — f32-ulp-class agreement vs ops.frangi on the same
   volume; J8 within one quantization level.
3. tube zncc — close agreement vs the device gather formulation given
   IDENTICAL maps.
4. e2e — host tree lands on the phantom axis; seed sets match the
   device pipeline's (same flood, near-identical J8).
"""

from __future__ import annotations

import numpy as np
import pytest

from pnr_tpu.config import PNRConfig


def _tube_volume(shape=(24, 64, 96), seed=7):
    rng = np.random.default_rng(seed)
    z, y, x = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    d2 = (y - shape[1] // 2) ** 2 + ((z - shape[0] // 2) * 2.0) ** 2
    vol = np.clip(
        200.0 * np.exp(-d2 / (2 * 3.0**2)) * (0.7 + 0.3 * np.sin(x / 4.0))
        + rng.normal(0, 5, x.shape),
        0, 255,
    ).astype(np.uint8)
    return vol


class TestThreefryBitwise:
    def test_fold_in_and_uniform_match_jax(self):
        import jax

        from pnr_tpu.hostpath import threefry as tf

        base = jax.random.key(0)
        base_np = tf.key_from_seed(0)
        for tid in [0, 1, 7, 12345, 2**31, 2**32 - 1]:
            kj = jax.random.fold_in(base, np.uint32(tid))
            kn = tf.fold_in(base_np, tid)
            assert np.array_equal(np.asarray(jax.random.key_data(kj)), kn)
            for step in [0, 1, 2, 99]:
                uj = np.asarray(
                    jax.random.uniform(jax.random.fold_in(kj, step), (20,))
                )
                un = tf.uniform(tf.fold_in(kn, step), 20)
                assert np.array_equal(uj, un), (tid, step)

    def test_batched_streams_match_tracker_draws(self):
        """uniforms_per_trace == the device tracer's vmapped
        fold_in+uniform, bitwise, for a batch of trace keys."""
        import jax

        from pnr_tpu.hostpath import threefry as tf

        base = jax.random.key(3)
        ids = np.array([0, 1, 5, 17, 1002], np.uint32)
        keys_j = jax.vmap(lambda i: jax.random.fold_in(base, i))(ids)
        keys_n = np.stack([tf.fold_in(tf.key_from_seed(3), int(i)) for i in ids])
        assert np.array_equal(
            np.asarray(jax.random.key_data(keys_j)), keys_n
        )
        for step, n in [(0, 1), (1, 1), (4, 20), (5, 1), (198, 20)]:
            uj = np.asarray(
                jax.vmap(
                    lambda k: jax.random.uniform(jax.random.fold_in(k, step), (n,))
                )(keys_j)
            )
            un = tf.uniforms_per_trace(keys_n, step, n)
            assert np.array_equal(uj, un), (step, n)

    def test_scalar_uniform_equals_length1(self):
        """The tracer draws shape-() uniforms; partitionable bits for
        shape () and (1,) share counter 0."""
        import jax

        from pnr_tpu.hostpath import threefry as tf

        kj = jax.random.fold_in(jax.random.key(0), np.uint32(9))
        u_scalar = float(jax.random.uniform(kj, ()))
        kn = tf.fold_in(tf.key_from_seed(0), 9)
        assert u_scalar == float(tf.uniform(kn, 1)[0])


class TestHostFilters:
    def test_frangi3d_close_to_device(self):
        import jax.numpy as jnp

        from pnr_tpu.hostpath import filters as hf
        from pnr_tpu.ops.frangi import frangi3d, normalize_to_u8

        vol = _tube_volume((16, 48, 64))
        sig = (2.0, 3.0)
        jh, jmin_h, jmax_h, vxh, vyh, vzh = hf.frangi3d(vol, sig, 2.0)
        jd, jmin_d, jmax_d, vxd, vyd, vzd = (
            np.asarray(a) for a in frangi3d(jnp.asarray(vol), sig, 2.0)
        )
        # strong voxels agree to f32 accumulation ulps
        strong = jd > 0.1 * jd.max()
        rel = np.abs(jh[strong] - jd[strong]) / np.maximum(jd[strong], 1e-6)
        assert rel.max() < 3e-3, rel.max()
        # J8 within one quantization level almost everywhere
        j8h = hf.normalize_to_u8(jh, jmin_h, jmax_h)
        j8d = np.asarray(
            normalize_to_u8(jnp.asarray(jd), jnp.float32(jmin_d), jnp.float32(jmax_d))
        )
        diff = np.abs(j8h.astype(int) - j8d.astype(int))
        assert (diff > 1).mean() < 1e-3, (diff.max(), (diff > 1).mean())
        # direction quantization identical on strong voxels up to ties
        assert (vxh[strong] == vxd[strong]).mean() > 0.97

    def test_eig3_port_matches_device_bitwise_math(self):
        import jax.numpy as jnp

        from pnr_tpu.hostpath import filters as hf
        from pnr_tpu.ops.eig3 import eigh3x3_vessel

        rng = np.random.default_rng(0)
        comps = [rng.normal(size=5000).astype(np.float32) for _ in range(6)]
        got = hf.eigh3x3_vessel(*comps)
        want = [np.asarray(a) for a in eigh3x3_vessel(*map(jnp.asarray, comps))]
        for g, w in zip(got, want):
            np.testing.assert_allclose(g, w, rtol=2e-5, atol=2e-6)


class TestHostTube:
    def test_maps_and_queries_close_to_device(self):
        import jax.numpy as jnp

        from pnr_tpu.hostpath import tube as ht
        from pnr_tpu.ops.zncc_fast import (
            TubeZnccModel,
            build_tube_maps,
            make_tube_zncc_fn,
        )

        vol = _tube_volume((16, 48, 64))
        model = TubeZnccModel((2.0, 3.0), False)
        maps_h = ht.build_tube_maps(vol, model)
        maps_d = np.asarray(build_tube_maps(jnp.asarray(vol), model))
        np.testing.assert_allclose(maps_h, maps_d, rtol=2e-4, atol=2e-2)

        rng = np.random.default_rng(1)
        n = 200
        pos = np.stack(
            [rng.uniform(4, 60, n), rng.uniform(4, 44, n), rng.uniform(2, 13, n)],
            axis=-1,
        ).astype(np.float32)
        d = rng.normal(size=(n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        ch, sh = ht.make_tube_zncc_fn(model)(maps_h, pos, d)
        cd, sd = make_tube_zncc_fn(model)(jnp.asarray(maps_d), jnp.asarray(pos), jnp.asarray(d))
        np.testing.assert_allclose(ch, np.asarray(cd), atol=2e-3)
        assert (sh == np.asarray(sd)).mean() > 0.97


class TestNativeExactZncc:
    def test_native_matches_numpy_fallback(self):
        from pnr_tpu import native
        from pnr_tpu.hostpath.pipeline import _make_exact_zncc_host
        from pnr_tpu.ops.zncc_model import ZnccTemplates

        if not native.have_native():
            pytest.skip("native runtime unavailable")
        vol = _tube_volume((16, 48, 64))
        tpl = ZnccTemplates((2.0, 3.0), False)
        rng = np.random.default_rng(2)
        n = 300
        pos = np.stack(
            [rng.uniform(2, 62, n), rng.uniform(2, 46, n), rng.uniform(1, 14, n)],
            axis=-1,
        ).astype(np.float32)
        d = rng.normal(size=(n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        c_nat, s_nat = native.zncc_exact_queries(
            vol.astype(np.float32), tpl, pos, d
        )
        import pnr_tpu.native as _n

        orig = _n.zncc_exact_queries
        _n.zncc_exact_queries = None
        try:
            fn = _make_exact_zncc_host(vol, tpl)
        finally:
            _n.zncc_exact_queries = orig
        c_np, s_np = fn(pos, d)
        np.testing.assert_allclose(c_nat, c_np, atol=5e-6)
        assert (s_nat == s_np).all()

    def test_native_matches_device_zncc(self):
        import jax.numpy as jnp

        from pnr_tpu import native
        from pnr_tpu.ops.zncc import ZnccTemplates, make_zncc_fn

        if not native.have_native():
            pytest.skip("native runtime unavailable")
        vol = _tube_volume((16, 48, 64))
        tpl = ZnccTemplates((2.0, 3.0), False)
        rng = np.random.default_rng(3)
        n = 128
        pos = np.stack(
            [rng.uniform(4, 60, n), rng.uniform(4, 44, n), rng.uniform(2, 13, n)],
            axis=-1,
        ).astype(np.float32)
        d = rng.normal(size=(n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        c_nat, s_nat = native.zncc_exact_queries(vol.astype(np.float32), tpl, pos, d)
        cd, sd = make_zncc_fn(tpl)(jnp.asarray(vol), jnp.asarray(pos), jnp.asarray(d))
        np.testing.assert_allclose(c_nat, np.asarray(cd), atol=3e-4)
        assert (s_nat == np.asarray(sd)).mean() > 0.97


class TestHostPipelineE2E:
    @pytest.mark.parametrize("mode", ["tube", "exact"])
    def test_phantom_axis(self, mode):
        from pnr_tpu.hostpath import host_reconstruction_func

        vol = _tube_volume((24, 64, 96))
        cfg = PNRConfig(
            sigmas=(2.0, 3.0), tolerance=10.0, znccth=0.5, kappa=3.0, step=2,
            ni=100, np=20, zdist=2.0, nodepervol=4, vol=9, zncc_mode=mode,
        )
        res = host_reconstruction_func(vol, cfg, verbose=False)
        assert len(res.tree) > 10
        ys = np.asarray(res.tree.y[1:])
        zs = np.asarray(res.tree.z[1:])
        assert abs(np.median(ys) - 32) < 2.5
        assert abs(np.median(zs) - 12) < 2.5

    def test_seed_sets_match_device_pipeline(self):
        from pnr_tpu.hostpath import host_reconstruction_func
        from pnr_tpu.pipeline import reconstruction_func

        vol = _tube_volume((24, 64, 96))
        cfg = PNRConfig(
            sigmas=(2.0, 3.0), tolerance=10.0, znccth=0.5, kappa=3.0, step=2,
            ni=40, np=20, zdist=2.0, nodepervol=4, vol=9, zncc_mode="tube",
        )
        rh = host_reconstruction_func(vol, cfg, verbose=False)
        rd = reconstruction_func(vol, cfg, verbose=False)
        # identical flood on near-identical J8: seed sets should agree
        # almost everywhere
        sh = {tuple(p) for p in rh.seeds_pos.astype(int).tolist()}
        sd = {tuple(p) for p in rd.seeds_pos.astype(int).tolist()}
        inter = len(sh & sd)
        assert inter >= 0.9 * max(len(sh), len(sd), 1), (len(sh), len(sd), inter)
        # trees land in the same place
        assert abs(np.median(np.asarray(rh.tree.y[1:])) -
                   np.median(np.asarray(rd.tree.y[1:]))) < 2.0

    def test_2d_host_path(self):
        """Single-slice (P == 1) images are first-class in the reference
        (Advantra_plugin.cpp:2339); the host engine runs them through
        frangi2d + the 2-D tube model."""
        from pnr_tpu.hostpath import host_reconstruction_func

        rng = np.random.default_rng(5)
        y, x = np.meshgrid(np.arange(96), np.arange(128), indexing="ij")
        img = np.clip(
            200.0 * np.exp(-((y - 48) ** 2) / (2 * 2.5**2))
            * (0.7 + 0.3 * np.sin(x / 4.0)) * (x > 8) * (x < 120)
            + rng.normal(0, 5, (96, 128)),
            0, 255,
        ).astype(np.uint8)[None]
        cfg = PNRConfig(
            sigmas=(2.0, 3.0), tolerance=10.0, znccth=0.4, kappa=3.0, step=2,
            ni=60, np=20, zdist=2.0, nodepervol=4, vol=9, zncc_mode="tube",
        )
        res = host_reconstruction_func(img, cfg, verbose=False)
        assert len(res.tree) > 5
        ys = np.asarray(res.tree.y[1:])
        assert abs(np.median(ys) - 48) < 2.5

    def test_soma_host_path(self):
        """somaradius > 0 exercises the host soma extraction."""
        from pnr_tpu.hostpath import host_reconstruction_func

        vol = _tube_volume((24, 64, 96)).astype(np.int16)
        z, y, x = np.meshgrid(*[np.arange(s) for s in (24, 64, 96)], indexing="ij")
        soma = 255.0 * np.exp(
            -(((x - 20) ** 2 + (y - 32) ** 2) / (2 * 6.0**2)
              + ((z - 12) ** 2) / (2 * 3.0**2))
        )
        vol = np.clip(vol + soma, 0, 255).astype(np.uint8)
        cfg = PNRConfig(
            sigmas=(2.0, 3.0), somaradius=5.0, tolerance=10.0, znccth=0.5,
            kappa=3.0, step=2, ni=40, np=20, zdist=2.0, nodepervol=4, vol=9,
            zncc_mode="tube",
        )
        res = host_reconstruction_func(vol, cfg, verbose=False)
        from pnr_tpu.graph.nodes import SOMA

        assert any(t == SOMA for t in res.tree.type[1:]) or len(res.tree) > 5


class TestHostTracerVsDevice:
    def test_same_maps_same_first_steps(self):
        """Feed the HOST tube maps to both tracers: the host wave's
        early estimates track the device wave's (same PRNG streams,
        same math — divergence only from f32 reassociation ulps
        compounding through the particle weights)."""
        import jax
        import jax.numpy as jnp

        from pnr_tpu.hostpath import tube as ht
        from pnr_tpu.hostpath.tracer import HostWaveTracer
        from pnr_tpu.hostpath import threefry as tf
        from pnr_tpu.ops.zncc_fast import TubeZnccModel
        from pnr_tpu.smc.tracker import BatchedTracker

        vol = _tube_volume((16, 48, 64), seed=11)
        cfg = PNRConfig(
            sigmas=(2.0, 3.0), znccth=0.3, kappa=3.0, step=2, ni=8, np=20,
            zdist=2.0, nodepervol=4, vol=9, zncc_mode="tube",
        )
        model = TubeZnccModel(cfg.sigmas, False)
        maps_h = ht.build_tube_maps(vol, model)
        zfn = ht.make_tube_zncc_fn(model)

        host = HostWaveTracer(cfg, False, lambda p, d: zfn(maps_h, p, d), vol.shape)
        sp = np.array([[10.0, 24.0, 8.0], [30.0, 24.0, 8.0]], np.float32)
        sd = np.array([[1.0, 0, 0], [1.0, 0, 0]], np.float32)
        keys_h = np.stack([tf.fold_in(tf.key_from_seed(0), i) for i in (0, 1)])
        carry, est0_h = host.trace_init(sp, sd, keys_h)
        _, packed_h = host.trace_stage(keys_h, carry, range(1, 8))

        # device tracker fed the SAME host-built maps (packed layout)
        dev = BatchedTracker(cfg, is2d=False)
        s_, z_, y_, x_ = len(cfg.sigmas), *vol.shape
        planar = maps_h.reshape(s_, 3, z_, y_, x_)
        packed_maps = jnp.asarray(
            np.stack([planar[i].transpose(1, 2, 3, 0).reshape(z_, y_, 3 * x_)
                      for i in range(s_)])
        )
        keys_d = jax.vmap(
            lambda i: jax.random.fold_in(jax.random.key(0), i)
        )(jnp.arange(2, dtype=jnp.uint32))
        carry_d, est0_d = dev._trace_init(
            packed_maps, jnp.asarray(sp), jnp.asarray(sd), keys_d
        )
        _, packed_d = dev._trace_stage(
            packed_maps, keys_d, carry_d, jnp.arange(1, 8),
            jnp.zeros(2, jnp.bool_),
        )
        est0_d = np.asarray(est0_d)
        packed_d = np.asarray(packed_d)

        # iteration-0 estimates: same systematic draw, same prior rows
        np.testing.assert_allclose(est0_h[:, :3], est0_d[:, :3], atol=0.35)
        # early iterations stay on the same path (chaotic later)
        np.testing.assert_allclose(
            packed_h[:, :2, :3], packed_d[:, :2, :3], atol=0.75
        )
