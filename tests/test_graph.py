"""Graph layer tests: commit semantics, refinement, grouping, trees, SWC."""

import numpy as np
import pytest

from pnr_tpu.graph.build import TraceCommitter, vol_neighbourhood
from pnr_tpu.graph.nodes import AXON, END, SOMA, UNDEFINED, NodeList
from pnr_tpu.graph.refine import (
    group1,
    interpolate_nodelist,
    non_blurring,
    non_blurring_reference,
)
from pnr_tpu.graph.trees import (
    bfs_forest,
    extract_largest_tree,
    extract_trees,
    interpolate_treelist,
    remove_tails,
)
from pnr_tpu.io.swc import read_swc, save_nodelist


def straight_trace(n, x0=5.0, y=8.0, z=4.0, step=2.0):
    pos = np.stack(
        [x0 + step * np.arange(n), np.full(n, y), np.full(n, z)], axis=-1
    ).astype(np.float32)
    dirs = np.tile(np.array([1.0, 0, 0], np.float32), (n, 1))
    sig = np.full(n, 2.0, np.float32)
    corr = np.full(n, 0.9, np.float32)
    valid = np.ones(n, bool)
    return pos, dirs, sig, corr, valid


class TestVolNeighbourhood:
    @pytest.mark.parametrize("vol,count", [(1, 0), (5, 4), (9, 8), (11, 10), (19, 18), (27, 26)])
    def test_counts(self, vol, count):
        assert len(vol_neighbourhood(vol)) == count


class TestTraceCommitter:
    def test_chain_nodes_and_end_type(self):
        nodes = NodeList()
        c = TraceCommitter((16, 32, 64), vol=9, nodepervol=4, nodes=nodes)
        pos, dirs, sig, corr, valid = straight_trace(10)
        added = c.commit_trace(pos, dirs, sig, corr, valid)
        assert added == 10
        assert len(nodes) == 11
        assert nodes.type[1] == UNDEFINED
        assert nodes.type[5] == AXON
        assert nodes.type[10] == END
        # chain links are bidirectional
        assert nodes.is_bidirectional()
        assert nodes.nbr[2] == [1, 3]

    def test_truncates_at_invalid(self):
        nodes = NodeList()
        c = TraceCommitter((16, 32, 64), vol=9, nodepervol=4, nodes=nodes)
        pos, dirs, sig, corr, valid = straight_trace(10)
        valid[4:] = False
        added = c.commit_trace(pos, dirs, sig, corr, valid)
        assert added == 4

    def test_density_suppression_links_and_stops(self):
        nodes = NodeList()
        c = TraceCommitter((16, 32, 64), vol=9, nodepervol=1, nodes=nodes)
        pos, dirs, sig, corr, valid = straight_trace(5)
        c.commit_trace(pos, dirs, sig, corr, valid)
        n_after_first = len(nodes)
        # identical second trace: first voxel saturated -> no new nodes
        added = c.commit_trace(pos, dirs, sig, corr, valid)
        assert added == 0
        assert len(nodes) == n_after_first
        # a trace entering the saturated corridor from outside links to it
        pos2, dirs2, sig2, corr2, valid2 = straight_trace(5, x0=5.0, y=14.0)
        pos2[:, 1] = [14.0, 11.0, 8.0, 8.0, 8.0]  # moves into the corridor at i=2
        added2 = c.commit_trace(pos2, dirs2, sig2, corr2, valid2)
        assert 0 < added2 < 5
        assert nodes.is_bidirectional()

    def test_soma_link_stops_trace(self):
        nodes = NodeList()
        soma_id = nodes.add(2, 8, 4, sig=3.0, ntype=SOMA)
        smap = np.zeros((16, 32, 64), np.int32)
        smap[4, 8, :4] = soma_id
        c = TraceCommitter((16, 32, 64), vol=9, nodepervol=4, nodes=nodes, smap=smap)
        pos, dirs, sig, corr, valid = straight_trace(5, x0=9.0, step=-2.0)  # walks into soma
        added = c.commit_trace(pos, dirs, sig, corr, valid)
        assert added == 3  # x = 9, 7, 5 added; x=3 hits smap
        assert soma_id in nodes.nbr[len(nodes) - 1]

    def test_seed_allowed_reflects_density(self):
        nodes = NodeList()
        c = TraceCommitter((16, 32, 64), vol=9, nodepervol=1, nodes=nodes)
        assert c.seed_allowed((5.0, 8.0, 4.0))
        pos, dirs, sig, corr, valid = straight_trace(3)
        c.commit_trace(pos, dirs, sig, corr, valid)
        assert not c.seed_allowed((5.0, 8.0, 4.0))


class TestInterpolate:
    def test_links_shorter_than_step(self):
        nodes = NodeList()
        a = nodes.add(0, 0, 0, sig=1, corr=0.5)
        b = nodes.add(5, 0, 0, sig=2, corr=0.9)
        nodes.link(a, b)
        interpolate_nodelist(nodes, 1.0)
        assert nodes.is_bidirectional()
        # every link <= 1.0 long
        for i in range(1, len(nodes)):
            for j in nodes.nbr[i]:
                d = np.hypot(nodes.x[i] - nodes.x[j], nodes.y[i] - nodes.y[j])
                assert d <= 1.0 + 1e-5
        assert len(nodes) == 2 + 4 + 1  # dummy + 2 ends + 4 interpolated

    def test_interpolated_values_lerp(self):
        nodes = NodeList()
        a = nodes.add(0, 0, 0, sig=1, corr=0.0)
        b = nodes.add(4, 0, 0, sig=3, corr=1.0)
        nodes.link(a, b)
        interpolate_nodelist(nodes, 1.0)
        xs = np.asarray(nodes.x[3:])
        sigs = np.asarray(nodes.sig[3:])
        order = np.argsort(xs)
        np.testing.assert_allclose(xs[order], [1, 2, 3])
        np.testing.assert_allclose(sigs[order], [1.5, 2.0, 2.5])


class TestMeanShift:
    def test_matches_scalar_reference(self, rng):
        nodes = NodeList()
        for _ in range(60):
            p = rng.normal(0, 3, 3)
            nodes.add(20 + p[0], 20 + p[1], 8 + p[2], sig=2.0, corr=rng.random())
        got = non_blurring(nodes, 1.5, 4, 1e-4)
        want = non_blurring_reference(nodes, 1.5, 4, 1e-4)
        np.testing.assert_allclose(got.x[1:], want.x[1:], atol=2e-3)
        np.testing.assert_allclose(got.y[1:], want.y[1:], atol=2e-3)
        np.testing.assert_allclose(got.z[1:], want.z[1:], atol=2e-3)

    def test_far_offset_cloud_no_origin_collapse(self, rng):
        """Gigapixel-extent regression: at coordinates ~12000 the MXU
        |c|^2+|p|^2-2cp expansion used to cancel catastrophically
        (ulp(|p|^2) ~ 32 vs kernel radius^2 ~ 16), giving some nodes an
        empty mask and teleporting them to the origin — 343k spurious
        interpolated tree nodes on a 151-Mpix slide. Centroid centering
        + hold-position-on-empty-mask must keep the refine translation-
        consistent with the near-origin cloud."""
        base = NodeList()
        far = NodeList()
        off = np.array([12000.0, 11000.0, 0.0])
        for _ in range(300):
            p = rng.normal(0, 2.5, 3) + np.array([20.0, 20.0, 8.0])
            base.add(p[0], p[1], p[2], sig=2.0, corr=0.5)
            far.add(p[0] + off[0], p[1] + off[1], p[2] + off[2], sig=2.0, corr=0.5)
        rb = non_blurring(base, 1.5, 4, 1e-4)
        rf = non_blurring(far, 1.5, 4, 1e-4)
        fx = np.asarray(rf.x[1:])
        fy = np.asarray(rf.y[1:])
        # no node may leave the cloud's neighbourhood (the old bug sent
        # empty-mask nodes to (0, 0, 0))
        assert fx.min() > 11900 and fy.min() > 10900, (fx.min(), fy.min())
        # translation consistency with the near-origin result (f32
        # rounding differs at offset coordinates; 0.1 px is far below
        # any downstream grouping radius)
        np.testing.assert_allclose(fx - off[0], np.asarray(rb.x[1:]), atol=0.1)
        np.testing.assert_allclose(fy - off[1], np.asarray(rb.y[1:]), atol=0.1)

    def test_grid_engine_matches_scalar_reference(self, rng):
        """The native grid-binned engine (the 100k+-node cutover path)
        shares the scalar oracle's double-precision interior: agreement
        at small N is ulp-class, not just tolerance-class."""
        from pnr_tpu import native

        if not native.have_native():
            import pytest

            pytest.skip("native runtime unavailable")
        nodes = NodeList()
        for _ in range(120):
            p = rng.normal(0, 3, 3)
            nodes.add(20 + p[0], 20 + p[1], 8 + p[2], sig=2.0 + rng.random(),
                      corr=rng.random())
        want = non_blurring_reference(nodes, 1.5, 4, 1e-4)
        p4 = np.stack(
            [np.asarray(nodes.x[1:], np.float32),
             np.asarray(nodes.y[1:], np.float32),
             np.asarray(nodes.z[1:], np.float32),
             np.asarray(nodes.sig[1:], np.float32)], axis=-1,
        )
        conv = native.mean_shift_grid(p4, 1.5, 4, 1e-4)
        np.testing.assert_allclose(conv[:, 0], want.x[1:], atol=1e-4)
        np.testing.assert_allclose(conv[:, 1], want.y[1:], atol=1e-4)
        np.testing.assert_allclose(conv[:, 2], want.z[1:], atol=1e-4)
        np.testing.assert_allclose(conv[:, 3], want.sig[1:], atol=1e-4)

    def test_grid_engine_far_offset_no_collapse(self, rng):
        """The 12000-px regression holds on the grid engine too (it is
        structurally immune: plain double differences, no expansion)."""
        from pnr_tpu import native

        if not native.have_native():
            import pytest

            pytest.skip("native runtime unavailable")
        import os

        base = NodeList()
        far = NodeList()
        off = np.array([12000.0, 11000.0, 0.0])
        for _ in range(300):
            p = rng.normal(0, 2.5, 3) + np.array([20.0, 20.0, 8.0])
            base.add(p[0], p[1], p[2], sig=2.0, corr=0.5)
            far.add(p[0] + off[0], p[1] + off[1], p[2] + off[2], sig=2.0, corr=0.5)
        os.environ["PNR_TPU_REFINE_GRID_N"] = "10"  # force grid engine
        try:
            rb = non_blurring(base, 1.5, 4, 1e-4)
            rf = non_blurring(far, 1.5, 4, 1e-4)
        finally:
            del os.environ["PNR_TPU_REFINE_GRID_N"]
        fx = np.asarray(rf.x[1:])
        fy = np.asarray(rf.y[1:])
        assert fx.min() > 11900 and fy.min() > 10900, (fx.min(), fy.min())
        np.testing.assert_allclose(fx - off[0], np.asarray(rb.x[1:]), atol=0.05)
        np.testing.assert_allclose(fy - off[1], np.asarray(rb.y[1:]), atol=0.05)

    def test_grid_engine_large_n_fast(self, rng):
        """300k nodes (the gigapixel regime) refine in seconds, not the
        O(N^2) blocked path's minutes — the r4 next-wall item."""
        from pnr_tpu import native

        if not native.have_native():
            import pytest

            pytest.skip("native runtime unavailable")
        import time

        n = 300_000
        # a long noisy tube: realistic density (grouping radius scale)
        p4 = np.stack(
            [rng.uniform(0, 12000, n),
             1000 + rng.normal(0, 2.0, n),
             8 + rng.normal(0, 1.0, n),
             np.full(n, 2.0)], axis=-1,
        ).astype(np.float32)
        t0 = time.perf_counter()
        conv = native.mean_shift_grid(p4, 1.5, 4, 1e-4)
        dt = time.perf_counter() - t0
        assert conv.shape == (n, 4)
        assert np.isfinite(conv).all()
        # contraction toward the centerline happened
        assert np.std(conv[:, 1]) < np.std(p4[:, 1]) * 0.9
        assert dt < 120, dt  # single-core CI bound; ~seconds on real hosts

    def test_contracts_toward_centerline(self, rng):
        nodes = NodeList()
        xs = np.linspace(0, 40, 80)
        for x in xs:
            nodes.add(x, 10 + rng.normal(0, 0.8), 5.0, sig=2.0, corr=0.8)
        ref = non_blurring(nodes, 1.5, 4, 1e-4)
        spread_before = np.std(np.asarray(nodes.y[1:]))
        spread_after = np.std(np.asarray(ref.y[1:]))
        assert spread_after < spread_before * 0.8


class TestGroup:
    def test_groups_merge_close_nodes(self):
        nodes = NodeList()
        a = nodes.add(10, 10, 5, sig=2, corr=0.9)
        b = nodes.add(10.5, 10, 5, sig=2, corr=0.5)  # within radius 2 of a
        c = nodes.add(20, 10, 5, sig=2, corr=0.8)
        nodes.link(a, c)
        nodes.link(b, c)
        out = group1(nodes, 2.0)
        assert len(out) == 3  # dummy + merged(ab) + c
        assert out.is_bidirectional()
        # merged group position is the running average
        got = sorted((round(out.x[i], 2) for i in range(1, 3)))
        assert got == [10.25, 20.0]

    def test_soma_groups_are_singletons(self):
        nodes = NodeList()
        s = nodes.add(10, 10, 5, sig=5, corr=0.1, ntype=SOMA)
        n = nodes.add(10.5, 10, 5, sig=2, corr=0.9)
        nodes.link(s, n)
        out = group1(nodes, 2.0)
        assert len(out) == 3
        assert out.type[1] == SOMA


class TestTrees:
    def _chain(self, nodes, pts, **kw):
        ids = [nodes.add(*p, **kw) for p in pts]
        for a, b in zip(ids, ids[1:]):
            nodes.link(a, b)
        return ids

    def test_bfs_forest_parent_links(self):
        nodes = NodeList()
        ids = self._chain(nodes, [(0, 0, 0), (1, 0, 0), (2, 0, 0)], sig=1, corr=0.5)
        tree = bfs_forest(nodes)
        assert len(tree) == 4
        # root has no parent, others exactly one
        n_par = [len(tree.nbr[i]) for i in range(1, 4)]
        assert sorted(n_par) == [0, 1, 1]

    def test_isolated_singletons_dropped(self):
        nodes = NodeList()
        nodes.add(5, 5, 5, sig=1)
        self._chain(nodes, [(0, 0, 0), (1, 0, 0)], sig=1)
        tree = bfs_forest(nodes)
        assert len(tree) == 3  # dummy + 2-node chain

    def test_extract_trees_by_size(self):
        nodes = NodeList()
        self._chain(nodes, [(i, 0, 0) for i in range(12)], sig=1)
        self._chain(nodes, [(i, 10, 0) for i in range(3)], sig=1)
        tree = bfs_forest(nodes)
        kept = extract_trees(tree, 10)
        assert len(kept) == 13  # dummy + the 12-node tree
        largest = extract_largest_tree(tree)
        assert len(largest) == 13

    def test_subset_severed_links_dropped(self):
        """A keep mask that removes a parent but keeps its child must
        sever the link, not let the unmapped -1 alias the LAST node via
        Python negative indexing (current callers keep whole spans; this
        guards the helper's contract for partial masks)."""
        from pnr_tpu.graph.trees import _subset_treelist

        nodes = NodeList()
        self._chain(nodes, [(i, 0, 0) for i in range(4)], sig=1)
        tree = bfs_forest(nodes)
        keep = np.ones(len(tree), bool)
        keep[2] = False  # drop a mid-chain node
        out = _subset_treelist(tree, keep)
        assert len(out) == len(tree) - 1
        for i in range(1, len(out)):
            for j in out.nbr[i]:
                assert 0 < j < len(out)

    def test_remove_tails(self):
        nodes = NodeList()
        trunk = self._chain(nodes, [(i, 0, 0) for i in range(8)], sig=1)
        spur = nodes.add(4, 1, 0, sig=1)
        nodes.link(trunk[4], spur)
        tree = bfs_forest(nodes)
        pruned = remove_tails(tree, 2)
        assert len(pruned) == len(tree) - 1

    def test_interpolate_treelist(self):
        nodes = NodeList()
        self._chain(nodes, [(0, 0, 0), (4, 0, 0)], sig=1)
        tree = bfs_forest(nodes)
        interpolate_treelist(tree, 1.0, AXON)
        # all parent links <= 1
        for i in range(1, len(tree)):
            for j in tree.nbr[i]:
                d = abs(tree.x[i] - tree.x[j])
                assert d <= 1.0 + 1e-5
        assert all(t == AXON for t in tree.type[1:])


class TestSwcIO:
    def test_roundtrip(self, tmp_path):
        nodes = NodeList()
        a = nodes.add(1, 2, 3, sig=1.5, ntype=2)
        b = nodes.add(4, 5, 6, sig=2.5, ntype=2)
        nodes.nbr[b] = [a]
        p = str(tmp_path / "t.swc")
        save_nodelist(nodes, p, name="test", comment="params:\nfoo=1")
        rows = read_swc(p)
        assert rows.shape == (2, 7)
        np.testing.assert_allclose(rows[0, 2:5], [1, 2, 3])
        assert rows[1, 6] == 1  # parent link
        with open(p) as f:
            head = f.read()
        assert "#name test" in head and "#foo=1" in head


class TestGroup0:
    def test_cylinder_grouping(self, rng):
        """group0 (Advantra_plugin.cpp:1645-1767): nodes in a cross-
        section plane merge; axially separated nodes stay apart."""
        from pnr_tpu.graph.nodes import NodeList
        from pnr_tpu.graph.refine import group0

        nodes = NodeList()
        # a tight cross-section cluster at x=10 (the local PCA direction
        # of the cloud is along x, the cluster spreads in y/z)
        ids = []
        for dy, dz in ((0, 0), (0.5, 0.3), (-0.4, 0.2), (0.2, -0.5)):
            ids.append(nodes.add(10.0, 20 + dy, 8 + dz, corr=0.9, sig=4.0))
        # a chain continuing along +x, outside d_axial of the cluster
        far = [nodes.add(10.0 + 3 * k, 20.0, 8.0, corr=0.5, sig=4.0) for k in (1, 2)]
        for a, b in zip(ids[:-1], ids[1:]):
            nodes.link(a, b)
        nodes.link(ids[-1], far[0])
        nodes.link(far[0], far[1])

        out = group0(nodes, d_axial=2.0, sig2rad=4.0)
        assert len(out) < len(nodes)  # the cluster merged
        assert out.is_bidirectional()
        # merged node sits at the cluster centroid-ish
        xs = np.asarray(out.x[1:])
        assert np.any(np.abs(xs - 10.0) < 1.0)

    def test_isolated_nodes_pass_through(self):
        from pnr_tpu.graph.nodes import NodeList
        from pnr_tpu.graph.refine import group0

        nodes = NodeList()
        a = nodes.add(5, 5, 5, corr=0.9, sig=1.0)
        b = nodes.add(50, 50, 20, corr=0.8, sig=1.0)
        nodes.link(a, b)
        out = group0(nodes)
        assert len(out) == 3  # dummy + 2 singleton groups
        assert out.is_bidirectional()


class TestSomaExtractionAlt:
    def test_two_blobs_become_two_soma_nodes(self, rng):
        from pnr_tpu.graph.nodes import NodeList, SOMA
        from pnr_tpu.pipeline.reconstruct import soma_extraction_alt

        shape = (12, 32, 32)
        z, y, x = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
        b1 = 220 * np.exp(-(((x - 8) ** 2 + (y - 8) ** 2 + ((z - 6) * 2.0) ** 2) / 18))
        b2 = 200 * np.exp(-(((x - 24) ** 2 + (y - 24) ** 2 + ((z - 6) * 2.0) ** 2) / 18))
        e8 = np.clip(b1 + b2, 0, 255).astype(np.uint8)

        nodes = NodeList()
        smap = soma_extraction_alt(e8, 60, rgrp=4.0, zdist=2.0, nodes=nodes)
        somas = [i for i in range(1, len(nodes)) if nodes.type[i] == SOMA]
        assert len(somas) >= 2
        # every above-threshold voxel near a blob centre is mapped
        assert smap[6, 8, 8] > 0 and smap[6, 24, 24] > 0
        assert smap[6, 8, 8] != smap[6, 24, 24]
        # node positions near the blob centres
        pos = np.stack([np.asarray(nodes.x)[somas], np.asarray(nodes.y)[somas],
                        np.asarray(nodes.z)[somas]], -1)
        d1 = np.linalg.norm(pos - np.array([8, 8, 6]), axis=1).min()
        d2 = np.linalg.norm(pos - np.array([24, 24, 6]), axis=1).min()
        assert d1 < 3 and d2 < 3

    def test_sphere_offsets_matches_reference_shape(self):
        from pnr_tpu.pipeline.reconstruct import sphere_offsets

        offs = sphere_offsets(2.0, 2.0)
        # rxy=2, rz=1: ellipsoid membership per tracker.cpp:609
        assert (np.abs(offs[:, 0]) <= 2).all()
        assert (np.abs(offs[:, 2]) <= 1).all()
        assert (offs == 0).all(axis=1).any()
        want = []
        for dx in range(-2, 3):
            for dy in range(-2, 3):
                for dz in range(-1, 2):
                    if dx * dx / 4.0 + dy * dy / 4.0 + dz * dz / 1.0 <= 1.0:
                        want.append((dx, dy, dz))
        assert {tuple(o) for o in offs.tolist()} == set(want)
