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
