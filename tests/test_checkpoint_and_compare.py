"""Checkpoint/resume determinism and the SWC comparison harness."""

import numpy as np
import pytest

from pnr_tpu.config import PNRConfig
from pnr_tpu.io.swc import read_swc, save_nodelist
from pnr_tpu.pipeline import reconstruction_func
from pnr_tpu.pipeline.checkpoint import load_checkpoint, save_checkpoint
from pnr_tpu.graph.build import TraceCommitter
from pnr_tpu.graph.nodes import NodeList
from pnr_tpu.utils.swc_compare import compare_swc

from tests.test_pipeline import tube_phantom


CFG = PNRConfig(
    sigmas=(2.0, 3.0), tolerance=10.0, znccth=0.5, kappa=2.0, step=2, ni=25,
    np=12, zdist=2.0, nodepervol=4, vol=9, wave_size=4, zncc_mode="tube",
)


class TestCheckpoint:
    def test_roundtrip_state(self, tmp_path):
        nodes = NodeList()
        nodes.add(1, 2, 3, 0.5, 0.5, 0, corr=0.7, sig=2.0, ntype=2)
        nodes.add(4, 5, 6, corr=0.8, sig=1.5, ntype=6)
        nodes.link(1, 2)
        c = TraceCommitter((4, 8, 8), vol=9, nodepervol=3, nodes=nodes)
        c.npervol[1, 2, 3] = 2
        c.nidx[1, 2, 3] = 1
        p = str(tmp_path / "ck.npz")
        save_checkpoint(p, c, seed_cursor=7, trace_count=3, pending=[5, 6], nseeds=40)
        c2, cursor, count, pending, nseeds = load_checkpoint(p)
        assert cursor == 7 and count == 3
        assert pending == [5, 6] and nseeds == 40
        assert len(c2.nodes) == 3
        assert c2.nodes.nbr[1] == [2] and c2.nodes.nbr[2] == [1]
        assert c2.npervol[1, 2, 3] == 2 and c2.nidx[1, 2, 3] == 1
        assert c2.vol == 9 and c2.nodepervol == 3
        # atomic write: no temp file left behind
        import os

        assert not os.path.exists(p + ".tmp.npz")

    def test_resume_missing_file_raises(self, tmp_path):
        vol = tube_phantom()
        with pytest.raises(FileNotFoundError):
            reconstruction_func(
                vol, CFG, verbose=False,
                checkpoint_path=str(tmp_path / "nope.npz"), resume=True,
            )

    def test_resume_wrong_volume_raises(self, tmp_path):
        """A snapshot from a different-shaped volume must be rejected,
        not silently mixed into the new run."""
        nodes = NodeList()
        c = TraceCommitter((4, 8, 8), vol=9, nodepervol=3, nodes=nodes)
        p = str(tmp_path / "ck.npz")
        save_checkpoint(p, c, seed_cursor=0, trace_count=0)
        vol = tube_phantom()
        with pytest.raises(ValueError, match="volume"):
            reconstruction_func(
                vol, CFG, verbose=False, checkpoint_path=p, resume=True
            )

    def test_resume_after_midwave_cap(self, tmp_path):
        """The trace cap can fire INSIDE a wave: seeds already selected
        (and idx-advanced past) but never started must be carried in the
        checkpoint's pending list — a resume with the cap lifted must be
        node-identical to an uninterrupted run, not skip them."""
        import dataclasses

        vol = tube_phantom()
        full = reconstruction_func(vol, CFG, verbose=False)
        assert full.trace_count > 2
        # wave_size 4, cap 1: the wave starts seeds 0,1 then caps with
        # seeds 2,3 selected-but-unstarted (cursor already past them)
        cut = dataclasses.replace(CFG, max_trace_count=1)
        ck = str(tmp_path / "cap.npz")
        part = reconstruction_func(
            vol, cut, verbose=False, checkpoint_path=ck
        )
        assert 0 < part.trace_count < full.trace_count
        d = np.load(ck)
        assert d["pending"].size > 0, "cap did not cut mid-wave; test is inert"
        resumed = reconstruction_func(
            vol, CFG, verbose=False, checkpoint_path=ck, resume=True
        )
        assert resumed.trace_count == full.trace_count
        assert len(resumed.n0) == len(full.n0)
        np.testing.assert_array_equal(
            np.asarray(resumed.n0.x), np.asarray(full.n0.x)
        )

    def test_resume_matches_uninterrupted_run(self, tmp_path):
        vol = tube_phantom()
        ck = str(tmp_path / "run.npz")
        # full run with checkpointing enabled
        full = reconstruction_func(vol, CFG, verbose=False, checkpoint_path=ck)
        # resumed run: continues from the final checkpoint -> no new work,
        # but the post-processing from the same state must match
        resumed = reconstruction_func(
            vol, CFG, verbose=False, checkpoint_path=ck, resume=True
        )
        np.testing.assert_array_equal(
            np.asarray(full.n0.x), np.asarray(resumed.n0.x)
        )
        np.testing.assert_array_equal(
            np.asarray(full.tree.x), np.asarray(resumed.tree.x)
        )


class TestSwcCompare:
    def test_identical_swc_scores_perfect(self, tmp_path):
        vol = tube_phantom()
        res = reconstruction_func(vol, CFG, verbose=False)
        p = str(tmp_path / "a.swc")
        save_nodelist(res.tree, p)
        rows = read_swc(p)
        s = compare_swc(rows, rows, dist=2.0)
        assert s.precision == 1.0 and s.recall == 1.0 and s.f1 == 1.0
        assert s.topology == 1.0

    def test_jittered_swc_high_score(self, tmp_path, rng):
        vol = tube_phantom()
        res = reconstruction_func(vol, CFG, verbose=False)
        p = str(tmp_path / "a.swc")
        save_nodelist(res.tree, p)
        rows = read_swc(p)
        jit = rows.copy()
        jit[:, 2:5] += rng.normal(0, 0.5, (len(rows), 3))
        s = compare_swc(jit, rows, dist=4.0)
        assert s.f1 > 0.95

    def test_duplicated_id_bidirectional_swc(self):
        """The reference plugin and io/swc.save_nodelist emit ONE ROW PER
        LINK (ids repeat; bidirectional links appear in both directions).
        resample_swc must treat those as one undirected graph — not
        parent 2-cycles (empty output, compare_swc crash) or
        doubled-back chains."""
        from pnr_tpu.utils.swc_compare import resample_swc

        # 3-node straight path, every link emitted in both directions
        dup = np.array(
            [
                [1, 2, 0, 0, 0, 1, 2],
                [2, 2, 2, 0, 0, 1, 1],
                [2, 2, 2, 0, 0, 1, 3],
                [3, 2, 4, 0, 0, 1, 2],
            ],
            np.float64,
        )
        r = resample_swc(dup, 1.0)
        assert r.shape[1] == 7 and len(r) == 5  # 0,1,2,3,4 along x
        xs = np.sort(r[:, 2])
        np.testing.assert_allclose(xs, [0, 1, 2, 3, 4])
        # single-parent form of the same path scores 1.0 against it
        single = np.array(
            [[1, 2, 0, 0, 0, 1, -1], [2, 2, 2, 0, 0, 1, 1], [3, 2, 4, 0, 0, 1, 2]],
            np.float64,
        )
        s = compare_swc(dup, single, dist=0.5, resample=1.0)
        assert s.precision == 1.0 and s.recall == 1.0
        # 2-node bidirectional component: previously resampled to shape
        # (0,) and crashed compare_swc
        two = np.array(
            [[1, 2, 0, 0, 0, 1, 2], [2, 2, 1, 0, 0, 1, 1]], np.float64
        )
        r2 = resample_swc(two, 1.0)
        assert len(r2) == 2

    def test_disjoint_swc_scores_zero(self):
        a = np.array([[1, 2, 0, 0, 0, 1, -1]], np.float64)
        b = np.array([[1, 2, 100, 100, 100, 1, -1]], np.float64)
        s = compare_swc(a, b, dist=4.0)
        assert s.f1 == 0.0


def test_resample_swc_fuzz_invariants():
    """Property fuzz over random forests with duplicated link rows and
    injected pure cycles: resample output always has unique ids,
    resolvable parents, no self-loops; a morphology self-compares to
    F1 = 1 under resampled matching."""
    from pnr_tpu.utils.swc_compare import compare_swc, resample_swc

    rng = np.random.default_rng(1)
    for trial in range(30):
        n = int(rng.integers(2, 80))
        pos = rng.uniform(0, 50, (n, 3))
        ids = np.arange(1, n + 1)
        rows = []
        for i in range(n):
            par = -1 if i == 0 or rng.random() < 0.1 else int(ids[rng.integers(0, i)])
            rows.append([ids[i], 2, *pos[i], 1.0, par])
            if par > 0 and rng.random() < 0.5:  # duplicated reverse row
                rows.append([par, 2, *pos[par - 1], 1.0, ids[i]])
        if rng.random() < 0.3 and n >= 4:  # pure-cycle component
            base, k = n + 1, int(rng.integers(3, 8))
            cpos = rng.uniform(60, 80, (k, 3))
            for j in range(k):
                rows.append([base + j, 2, *cpos[j], 1.0, base + (j + 1) % k])
        swc = np.asarray(rows, np.float64)
        out = resample_swc(swc, spacing=float(rng.uniform(0.5, 3.0)))
        assert out.ndim == 2 and out.shape[1] == 7 and len(out) > 0
        pid = out[:, 0].astype(int)
        par = out[:, 6].astype(int)
        assert len(np.unique(pid)) == len(pid)
        assert (np.isin(par, pid) | (par == -1)).all()
        assert not (par == pid).any()
        s = compare_swc(swc, swc.copy(), dist=1.0, resample=1.0)
        assert s.f1 > 0.999, f"self-compare f1 {s.f1} at trial {trial}"
