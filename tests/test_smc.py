"""SMC tracer tests: prior tables, sampling statistics, tube tracking."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pnr_tpu.config import PNRConfig
from pnr_tpu.smc.directions import generate_directions, nearest_direction
from pnr_tpu.smc.priors import build_prior_tables
from pnr_tpu.smc.tracker import BatchedTracker, _systematic_indices


def make_noisy_tube(shape=(16, 48, 96), radius=2.5, zdist=2.0, seed=3):
    rng = np.random.default_rng(seed)
    z, y, x = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    cy, cz = shape[1] / 2.0, shape[0] / 2.0
    d2 = (y - cy) ** 2 + ((z - cz) * zdist) ** 2
    vol = 200.0 * np.exp(-d2 / (2 * radius**2)) + rng.normal(0, 4, shape)
    return np.clip(vol, 0, 255).astype(np.uint8)


class TestDirections:
    def test_codebooks_unit_norm(self):
        for is2d in (True, False):
            v = generate_directions(is2d)
            np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-5)

    def test_counts(self):
        assert generate_directions(True).shape == (30, 3)
        assert generate_directions(False).shape == (50, 3)

    def test_nearest_direction_matches_bruteforce(self, rng):
        v = jnp.asarray(generate_directions(False))
        q = rng.normal(size=(40, 3)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        got = np.asarray(nearest_direction(jnp.asarray(q), v))
        want = np.argmax(q @ np.asarray(v).T, axis=1)
        np.testing.assert_array_equal(got, want)


class TestPriors:
    def test_tables_shapes_and_normalization(self):
        t = build_prior_tables(step=3, kappa=2.0, zdist=2.0, is2d=False)
        s = t.p.shape[0]
        assert t.u.shape == (s, 3)
        np.testing.assert_allclose(t.w0.sum(), 1.0, rtol=1e-5)
        np.testing.assert_allclose(t.w.sum(axis=1), 1.0, rtol=1e-5)
        np.testing.assert_allclose(t.w0_cws[-1], 1.0, rtol=1e-5)
        np.testing.assert_allclose(t.w_cws[:, -1], 1.0, rtol=1e-5)
        # offsets cover the ball of radius 2*step (unscaled) minus origin
        assert not np.any(np.all(t.p == 0, axis=1))
        # z offsets are scaled down by zdist: max |dz_applied| = 2*step/zdist
        assert np.max(np.abs(t.p[:, 2])) == pytest.approx(2 * 3 / 2.0)

    def test_directional_prior_prefers_forward(self):
        t = build_prior_tables(step=3, kappa=2.0, zdist=1.0, is2d=False)
        # for the codebook direction closest to +x, mass ahead should exceed mass behind
        vi = int(np.argmax(t.v @ np.array([1.0, 0, 0])))
        ahead = t.w[vi][t.p[:, 0] > 0].sum()
        behind = t.w[vi][t.p[:, 0] < 0].sum()
        assert ahead > 3 * behind

    def test_2d_tables_have_no_z(self):
        t = build_prior_tables(step=3, kappa=2.0, zdist=2.0, is2d=True)
        assert np.all(t.p[:, 2] == 0)
        assert np.all(t.v[:, 2] == 0)


class TestSystematicSampling:
    def test_frequencies_proportional_to_weights(self, rng):
        w = np.array([0.1, 0.4, 0.2, 0.3], np.float32)
        csw = jnp.asarray(np.cumsum(w))
        counts = np.zeros(4)
        n = 100
        for trial in range(200):
            idx = np.asarray(_systematic_indices(csw, jnp.float32(rng.random()), n))
            counts += np.bincount(idx, minlength=4)
        freqs = counts / counts.sum()
        np.testing.assert_allclose(freqs, w, atol=0.02)


class TestBatchedTracker:
    @pytest.fixture(scope="class")
    def cfg(self):
        return PNRConfig(
            sigmas=(2.0, 3.0), znccth=0.4, kappa=2.0, step=2, ni=30, np=16,
            zdist=2.0, nodepervol=4, vol=9, tolerance=10.0,
        )

    @pytest.fixture(scope="class")
    def tracker(self, cfg):
        return BatchedTracker(cfg, is2d=False)

    def test_traces_follow_tube(self, tracker):
        vol = make_noisy_tube()
        img = jnp.asarray(vol)
        # seeds on the tube axis, pointing +x and -x
        seed_pos = np.array([[20.0, 24.0, 8.0], [70.0, 24.0, 8.0]], np.float32)
        seed_dir = np.array([[1.0, 0, 0], [-1.0, 0, 0]], np.float32)
        res = tracker.trace_wave(img, seed_pos, seed_dir, jax.random.key(0), np.array([0, 1]))

        assert res.valid.shape == (2, 30)
        n_valid = res.valid.sum(axis=1)
        assert (n_valid > 10).all(), f"traces died early: {n_valid}"
        # Positive-direction trace advances toward +x and stays near the
        # axis. Note: the raw particle filter may eventually turn around
        # and retrace (the reference relies on the density map to cut the
        # retrace at commit time, tracker.cpp:870-882), so we assert reach,
        # not monotonicity.
        v0 = res.valid[0]
        xs = res.pos[0, v0, 0]
        ys = res.pos[0, v0, 1]
        zs = res.pos[0, v0, 2]
        assert xs.max() > xs[0] + 10
        assert np.all(np.abs(ys - 24.0) < 4.0)
        assert np.all(np.abs(zs - 8.0) < 4.0)
        # negative-direction trace advances toward -x
        v1 = res.valid[1]
        assert res.pos[1, v1, 0].min() < res.pos[1, v1, 0][0] - 10
        # correlations along the tube are strong
        assert res.corr[0, v0].mean() > 0.6

    def test_empty_wave_returns_empty_result(self, tracker):
        """A wave with zero seeds (every seed filtered out upstream)
        must return an empty TraceResult, not crash in np.concatenate."""
        vol = make_noisy_tube()
        res = tracker.trace_wave(
            jnp.asarray(vol),
            np.zeros((0, 3), np.float32),
            np.zeros((0, 3), np.float32),
            jax.random.key(0),
            np.zeros(0, np.int64),
        )
        assert res.pos.shape == (0, tracker.cfg.ni, 3)
        assert res.valid.shape == (0, tracker.cfg.ni)

    def test_reproducible_with_same_key(self, tracker):
        vol = make_noisy_tube()
        img = jnp.asarray(vol)
        sp = np.array([[30.0, 24.0, 8.0]], np.float32)
        sd = np.array([[1.0, 0, 0]], np.float32)
        r1 = tracker.trace_wave(img, sp, sd, jax.random.key(7), np.array([5]))
        r2 = tracker.trace_wave(img, sp, sd, jax.random.key(7), np.array([5]))
        np.testing.assert_array_equal(r1.pos, r2.pos)
        np.testing.assert_array_equal(r1.valid, r2.valid)

    def test_trace_dies_in_background(self, tracker):
        vol = make_noisy_tube()
        img = jnp.asarray(vol)
        sp = np.array([[10.0, 5.0, 2.0]], np.float32)  # dark corner
        sd = np.array([[0.0, 1.0, 0.0]], np.float32)
        res = tracker.trace_wave(img, sp, sd, jax.random.key(0), np.array([9]))
        assert res.valid[0].sum() < 5

    def test_validity_is_prefix(self, tracker):
        vol = make_noisy_tube()
        img = jnp.asarray(vol)
        sp = np.array([[20.0, 24.0, 8.0], [90.0, 40.0, 14.0]], np.float32)
        sd = np.array([[1.0, 0, 0], [0, 1.0, 0]], np.float32)
        res = tracker.trace_wave(img, sp, sd, jax.random.key(1), np.array([0, 1]))
        for t in range(2):
            v = res.valid[t]
            if v.any():
                last = np.max(np.nonzero(v))
                assert v[: last + 1].all(), "validity must be a prefix (masked termination)"


class TestPriorSamplingStatistics:
    def test_iter0_offsets_follow_w0(self, rng):
        """Systematic samples from the isotropic prior reproduce w0."""
        from pnr_tpu.smc.priors import build_prior_tables
        from pnr_tpu.smc.tracker import _systematic_indices

        t = build_prior_tables(step=2, kappa=2.0, zdist=2.0, is2d=False)
        counts = np.zeros(len(t.w0))
        csw = jnp.asarray(t.w0_cws)
        n = 64
        for _ in range(400):
            idx = np.asarray(_systematic_indices(csw, jnp.float32(rng.random()), n))
            counts += np.bincount(idx, minlength=len(t.w0))
        freqs = counts / counts.sum()
        # total-variation distance to the target distribution is small
        tv = 0.5 * np.abs(freqs - t.w0).sum()
        assert tv < 0.02, f"TV distance {tv}"

    def test_directional_prior_mean_points_forward(self, rng):
        """Offsets drawn from a directional row average along that direction."""
        from pnr_tpu.smc.priors import build_prior_tables

        t = build_prior_tables(step=3, kappa=2.0, zdist=1.0, is2d=False)
        vi = int(np.argmax(t.v @ np.array([0.0, 1.0, 0.0])))
        # expectation under the row directly (no sampling noise)
        mean_off = t.w[vi] @ t.p
        norm = mean_off / np.linalg.norm(mean_off)
        assert norm @ t.v[vi] > 0.95
