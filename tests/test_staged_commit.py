"""The staged trace/commit seam: incremental API equivalence, trace cap,
kill-back semantics."""

import numpy as np
import pytest

from pnr_tpu.config import PNRConfig
from pnr_tpu.graph.build import TraceCommitter
from pnr_tpu.graph.nodes import NodeList
from pnr_tpu.pipeline import reconstruction_func

from tests.test_pipeline import tube_phantom


def straight_trace(n, x0=5.0, y=8.0, z=4.0, step=2.0):
    pos = np.stack(
        [x0 + step * np.arange(n), np.full(n, y), np.full(n, z)], axis=-1
    ).astype(np.float32)
    dirs = np.tile(np.array([1.0, 0, 0], np.float32), (n, 1))
    sig = np.full(n, 2.0, np.float32)
    corr = np.full(n, 0.9, np.float32)
    valid = np.ones(n, bool)
    return pos, dirs, sig, corr, valid


class TestIncrementalCommitApi:
    @pytest.mark.parametrize("cut", [1, 3, 7, 9])
    def test_staged_equals_monolithic(self, cut):
        args = straight_trace(10)
        args[4][8:] = False  # trace dies at iteration 8

        nodes_a = NodeList()
        ca = TraceCommitter((16, 32, 64), vol=9, nodepervol=4, nodes=nodes_a)
        added_a = ca.commit_trace(*args)

        nodes_b = NodeList()
        cb = TraceCommitter((16, 32, 64), vol=9, nodepervol=4, nodes=nodes_b)
        cur = cb.begin_trace()
        cb.commit_steps(cur, *args, upto=cut)
        cb.commit_steps(cur, *args, upto=10)
        added_b = cb.finish_trace(cur)

        assert added_a == added_b
        assert nodes_a.x == nodes_b.x
        assert nodes_a.type == nodes_b.type
        assert nodes_a.nbr == nodes_b.nbr
        np.testing.assert_array_equal(ca.npervol, cb.npervol)
        np.testing.assert_array_equal(ca.nidx, cb.nidx)

    def test_native_commit_equals_python_oracle(self, monkeypatch, rng):
        """The native inner loop (commit_steps_native) must be
        step-for-step identical to the Python loop: randomized traces
        with stops (invalid tails, saturation collisions, soma hits),
        identical nodes/links/types and BITWISE-equal maps."""
        from pnr_tpu import native

        if not native.have_native():
            pytest.skip("native runtime unavailable")
        shape = (12, 40, 48)
        smap = np.zeros(shape, np.int32)
        smap[6, 20, 40] = 3  # a soma voxel some traces walk into

        def run(use_native):
            if not use_native:
                monkeypatch.setattr(
                    "pnr_tpu.native.have_native", lambda: False
                )
            nodes = NodeList()
            nodes.add(40, 20, 6, ntype=1)  # soma nodes 1..3
            nodes.add(1, 1, 1, ntype=1)
            nodes.add(2, 2, 2, ntype=1)
            c = TraceCommitter(shape, vol=19, nodepervol=2, nodes=nodes,
                               smap=smap)
            r = np.random.default_rng(7)
            # coordinates AT and within an f32 ulp of the x.5 rounding
            # boundary: the native loop must round in double like the
            # Python loop (an f32 v + 0.5f add flips these voxels)
            half_edge = np.array(
                [10.5, np.nextafter(np.float32(10.5), np.float32(10.0)),
                 np.nextafter(np.float32(10.5), np.float32(11.0))],
                np.float32,
            )
            pos_h = np.stack(
                [half_edge, np.full(3, 8.5, np.float32),
                 np.full(3, 4.4999995, np.float32)], axis=-1,
            )
            ones3 = np.ones(3, np.float32)
            cur = c.begin_trace()
            c.commit_steps(
                cur, pos_h, np.tile([[1.0, 0, 0]], (3, 1)).astype(np.float32),
                2 * ones3, 0.5 * ones3, ones3, 3,
            )
            c.finish_trace(cur)
            for t in range(60):
                n = int(r.integers(3, 14))
                x0 = r.uniform(2, 30)
                y0 = r.uniform(2, 36)
                z0 = r.uniform(1, 10)
                d = r.normal(0, 1, 3)
                d /= np.linalg.norm(d)
                pos = (np.array([x0, y0, z0]) + np.arange(n)[:, None] * 1.5 * d)
                pos = np.clip(pos, 0.6, [46.4, 38.4, 10.4]).astype(np.float32)
                dirs = np.tile(d.astype(np.float32), (n, 1))
                sig = np.full(n, 2.0, np.float32)
                corr = r.random(n).astype(np.float32)
                valid = (r.random(n) > 0.1).astype(np.float32)  # float, like
                # the pipeline's packed estimate column
                cur = c.begin_trace()
                for cut in sorted(set([int(r.integers(1, n + 1)), n])):
                    c.commit_steps(cur, pos, dirs, sig, corr, valid, cut)
                c.finish_trace(cur)
            monkeypatch.undo()
            return nodes, c

        na, ca = run(use_native=True)
        nb, cb = run(use_native=False)
        assert na.x == nb.x and na.y == nb.y and na.z == nb.z
        assert na.type == nb.type
        assert na.nbr == nb.nbr
        assert na.corr == nb.corr and na.sig == nb.sig
        np.testing.assert_array_equal(ca.npervol, cb.npervol)
        np.testing.assert_array_equal(ca.nidx, cb.nidx)

    def test_finish_without_steps_is_empty(self):
        nodes = NodeList()
        c = TraceCommitter((8, 8, 8), vol=1, nodepervol=4, nodes=nodes)
        cur = c.begin_trace()
        assert c.finish_trace(cur) == 0
        assert len(nodes) == 1


class TestTraceCap:
    def test_cap_completes_started_seed(self):
        """A seed started at the cap still commits BOTH directions
        (Advantra_plugin.cpp:2702 breaks after trackPos+trackNeg)."""
        cfg = PNRConfig(
            sigmas=(2.0, 3.0), tolerance=10.0, znccth=0.5, kappa=2.0, step=2,
            ni=25, np=12, zdist=2.0, nodepervol=4, vol=9, wave_size=8,
            zncc_mode="tube", max_trace_count=2,
        )
        res = reconstruction_func(tube_phantom(), cfg, verbose=False)
        # cap = 2 -> seeds 1..3 start (count becomes 3 > 2 at the third);
        # the third started seed must still finish: trace_count reports
        # every started seed
        assert res.trace_count == 3
        # both directions of each started seed commit: END-typed nodes exist
        from pnr_tpu.graph.nodes import END

        assert any(t == END for t in res.n0.type)

    def test_cap_equals_uncapped_prefix(self):
        """Capped run's n0 is a prefix of the uncapped run's n0."""
        base = PNRConfig(
            sigmas=(2.0, 3.0), tolerance=10.0, znccth=0.5, kappa=2.0, step=2,
            ni=25, np=12, zdist=2.0, nodepervol=4, vol=9, wave_size=8,
            zncc_mode="tube",
        )
        import dataclasses

        capped = dataclasses.replace(base, max_trace_count=1)
        r_full = reconstruction_func(tube_phantom(), base, verbose=False)
        r_cap = reconstruction_func(tube_phantom(), capped, verbose=False)
        n = len(r_cap.n0)
        assert n <= len(r_full.n0)
        assert r_cap.n0.x == r_full.n0.x[:n]
        assert r_cap.n0.y == r_full.n0.y[:n]


class TestStageSizeInvariance:
    def test_output_independent_of_stage_iters(self):
        """Committed graphs must be identical for any STAGE_ITERS (the
        PRNG keys on absolute iterations; the commit wavefront replays
        the same estimates). Regression: a leftover `return commit_ptr`
        in advance_commits aborted waves whenever the wavefront was
        mid-wave at a stage boundary."""
        import pnr_tpu.smc.tracker as T

        baseline = None
        orig = T.BatchedTracker.STAGE_ITERS
        try:
            for stage in (4, 16, 64):
                T.BatchedTracker.STAGE_ITERS = stage
                res = reconstruction_func(tube_phantom(), CFG_INV, verbose=False)
                state = (len(res.n0), res.trace_count, tuple(res.n0.x), tuple(res.n0.type))
                if baseline is None:
                    baseline = state
                else:
                    assert state == baseline, f"STAGE_ITERS={stage} diverged"
        finally:
            T.BatchedTracker.STAGE_ITERS = orig


CFG_INV = PNRConfig(
    sigmas=(2.0, 3.0), tolerance=10.0, znccth=0.5, kappa=2.0, step=2, ni=25,
    np=12, zdist=2.0, nodepervol=4, vol=9, wave_size=8, zncc_mode="tube",
)
