"""Exact-template patch engine (ops/zncc_exact.py) vs the global
gather evaluation (ops/zncc.py) — the znccBBB parity spec."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnr_tpu.ops.zncc import ZnccTemplates, make_zncc_fn
from pnr_tpu.ops.zncc_exact import (
    build_exact_bank,
    make_exact_patch_engine,
)


from conftest import cpu_numerics_marker

cpu_numerics = cpu_numerics_marker()


def _queries(rng, t, b, lo, hi, zhi):
    pos = np.stack(
        [
            rng.uniform(lo, hi, (t, b)),
            rng.uniform(lo, hi, (t, b)),
            rng.uniform(2, zhi, (t, b)),
        ],
        -1,
    ).astype(np.float32)
    d = rng.normal(size=(t, b, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return pos, d


class TestExactEngine:
    def test_bank_covers_all_samples(self):
        tmpl = ZnccTemplates((2.0, 3.0), is2d=False)
        bank = build_exact_bank(tmpl)
        total = sum(int(t[:, 4, :].sum()) for t in bank.tables)
        assert total == int(tmpl.cnt.sum())
        # every weight accounted for
        wsum = sum(float(t[:, 3, :].sum()) for t in bank.tables)
        assert np.isclose(wsum, float(tmpl.wgt.sum()), rtol=1e-5)

    @pytest.mark.parametrize(
        "mode,atol",
        [
            ("xla", 2e-5),
            # hi_lo kernel: float-grade (two bf16 weight passes)
            pytest.param("interpret_hilo", 2e-5, marks=cpu_numerics),
            # default single-pass kernel: measured corr error <= 2.4e-4
            # on noisy volumes (see make_exact_patch_engine docstring)
            ("interpret_fast", 1e-3),
        ],
    )
    def test_matches_global_znccbbb(self, rng, mode, atol):
        """Patch covering the whole volume -> engine == global."""
        vol = rng.integers(0, 256, (20, 48, 48), dtype=np.uint8)
        tmpl = ZnccTemplates((2.0, 3.0), is2d=False)
        gfn = make_zncc_fn(tmpl)
        pos, d = _queries(rng, 3, 5, 10, 38, 16)
        gc, gs = gfn(
            jnp.asarray(vol),
            jnp.asarray(pos.reshape(-1, 3)),
            jnp.asarray(d.reshape(-1, 3)),
        )
        eng = make_exact_patch_engine(
            tmpl, step=3, force_xla=(mode == "xla"),
            interpret=mode.startswith("interpret"),
            hi_lo=(mode == "interpret_hilo"),
        )
        ec, es = eng.eval_fused(
            jnp.asarray(vol)[None], jnp.asarray(pos), jnp.asarray(d)
        )
        np.testing.assert_allclose(
            np.asarray(ec).ravel(), np.asarray(gc), atol=atol
        )
        assert (np.asarray(es).ravel() == np.asarray(gs)).all()

    @cpu_numerics
    def test_matches_global_2d(self, rng):
        vol = rng.integers(0, 256, (1, 48, 48), dtype=np.uint8)
        tmpl = ZnccTemplates((2.0, 3.0), is2d=True)
        gfn = make_zncc_fn(tmpl)
        pos, d = _queries(rng, 2, 4, 10, 38, 3)
        pos[..., 2] = 0.0
        d[..., 2] = 0.0
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        gc, gs = gfn(
            jnp.asarray(vol),
            jnp.asarray(pos.reshape(-1, 3)),
            jnp.asarray(d.reshape(-1, 3)),
        )
        eng = make_exact_patch_engine(tmpl, step=3, interpret=True, hi_lo=True)
        ec, es = eng.eval_fused(
            jnp.asarray(vol)[None], jnp.asarray(pos), jnp.asarray(d)
        )
        np.testing.assert_allclose(
            np.asarray(ec).ravel(), np.asarray(gc), atol=2e-5
        )
        assert (np.asarray(es).ravel() == np.asarray(gs)).all()

    @cpu_numerics
    def test_kernel_matches_fallback_on_large_volume(self, rng):
        """When the patch is smaller than the volume, the Pallas kernel's
        z-windowed evaluation must still agree with the whole-patch XLA
        fallback (i.e., no sample escapes its block's z-window)."""
        vol = rng.integers(0, 256, (64, 96, 96), dtype=np.uint8)
        tmpl = ZnccTemplates((2.0, 3.0), is2d=False)
        pos, d = _queries(rng, 4, 6, 20, 76, 50)
        # cluster the particles like a trace cloud so the patch centring
        # matches real use
        pos[:, 1:] = pos[:, :1] + rng.uniform(-4, 4, pos[:, 1:].shape).astype(
            np.float32
        )
        f = jnp.asarray(vol)[None]
        eng_k = make_exact_patch_engine(tmpl, step=3, interpret=True, hi_lo=True)
        eng_x = make_exact_patch_engine(tmpl, step=3, force_xla=True)
        kc, ks = eng_k.eval_fused(f, jnp.asarray(pos), jnp.asarray(d))
        xc, xs = eng_x.eval_fused(f, jnp.asarray(pos), jnp.asarray(d))
        np.testing.assert_allclose(np.asarray(kc), np.asarray(xc), atol=2e-5)
        assert (np.asarray(ks) == np.asarray(xs)).all()

    @cpu_numerics
    def test_volume_edge_clamping(self, rng):
        """Queries at the volume boundary reproduce the reference's
        edge-clamped interp semantics (tracker.cpp:2142-2150)."""
        vol = rng.integers(0, 256, (16, 40, 40), dtype=np.uint8)
        tmpl = ZnccTemplates((2.0,), is2d=False)
        gfn = make_zncc_fn(tmpl)
        t, b = 2, 3
        pos = np.array(
            [[[1.0, 1.0, 1.0], [38.0, 2.0, 14.0], [2.0, 38.0, 0.5]],
             [[39.0, 39.0, 15.0], [0.0, 20.0, 8.0], [20.0, 0.0, 0.0]]],
            np.float32,
        )
        d = rng.normal(size=(t, b, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        gc, gs = gfn(
            jnp.asarray(vol),
            jnp.asarray(pos.reshape(-1, 3)),
            jnp.asarray(d.reshape(-1, 3)),
        )
        eng = make_exact_patch_engine(tmpl, step=3, interpret=True, hi_lo=True)
        ec, es = eng.eval_fused(
            jnp.asarray(vol)[None], jnp.asarray(pos), jnp.asarray(d)
        )
        np.testing.assert_allclose(
            np.asarray(ec).ravel(), np.asarray(gc), atol=2e-5
        )
        assert (np.asarray(es).ravel() == np.asarray(gs)).all()
