"""Tests for the parity-fill components: utils, clustering, alt extractor."""

import numpy as np
import pytest

import jax.numpy as jnp

from pnr_tpu.config import PNRConfig
from pnr_tpu.graph.nodes import SOMA, NodeList
from pnr_tpu.graph.refine import refine_blurring
from pnr_tpu.native import conn2d
from pnr_tpu.ops.interp import interpz
from pnr_tpu.smc.clustering import cluster_labels, largest_cluster, mean_shift
from pnr_tpu.utils.stats import (
    descending,
    get_k_highest,
    mode,
    probability_distribution,
    quantile,
)
from pnr_tpu.utils.exporters import (
    export_points_swc,
    export_seeds_swc,
    export_track_swc,
    save_vector,
)


class TestStats:
    def test_quantile_matches_reference_index(self):
        a = np.asarray([5, 1, 9, 3, 7], np.uint8)
        # k = floor(5 * 1/2) = 2 -> third smallest
        assert quantile(a, 1, 2) == 5
        assert quantile(a, 1, 1) == 9  # num >= den -> max
        assert quantile(a, 0, 4) == 1

    def test_mode_first_to_peak_wins(self):
        assert mode([3, 7, 7, 3]) == 7  # 7 reaches count 2 first
        assert mode([7, 7, 3, 3]) == 7
        assert mode([]) == -1
        assert mode([4, 4, 4]) == 4

    def test_descending_and_topk(self):
        a = np.asarray([1.0, 5.0, 3.0])
        s, idx = descending(a.copy())
        np.testing.assert_array_equal(s, [5, 3, 1])
        np.testing.assert_array_equal(idx, [1, 2, 0])
        v, i = get_k_highest(a, 2)
        np.testing.assert_array_equal(v, [5, 3])

    def test_probability_distribution(self):
        np.testing.assert_allclose(
            probability_distribution(np.zeros(4)), [0.25] * 4
        )
        np.testing.assert_allclose(
            probability_distribution(np.asarray([1.0, 3.0])), [0.25, 0.75]
        )


class TestClustering:
    def test_two_clusters_found(self, rng):
        a = rng.normal(0, 0.3, (12, 3)) + np.array([0, 0, 0])
        b = rng.normal(0, 0.3, (8, 3)) + np.array([10, 0, 0])
        pts = jnp.asarray(np.concatenate([a, b]), jnp.float32)
        conv = mean_shift(pts, krad=3.0)
        labels = np.asarray(cluster_labels(conv, dist=2.0))
        assert len(np.unique(labels)) == 2
        w = np.ones(20, np.float32)
        idx, csw = largest_cluster(labels, w)
        assert len(idx) == 12
        np.testing.assert_allclose(csw[-1], 12.0)


class TestRefineBlurring:
    def test_contracts_and_freezes_soma(self, rng):
        nodes = NodeList()
        s = nodes.add(50, 50, 5, sig=4, ntype=SOMA)
        for x in np.linspace(0, 40, 40):
            nodes.add(x, 10 + rng.normal(0, 1.0), 5.0, sig=2.0, corr=0.5)
        out = refine_blurring(nodes, 1.5, 4, 1e-4)
        assert out.x[s] == 50 and out.y[s] == 50  # soma frozen
        before = np.std(np.asarray(nodes.y[2:]))
        after = np.std(np.asarray(out.y[2:]))
        assert after < before


class TestConn2d:
    def test_labels_same_value_components(self):
        img = np.zeros((8, 8), np.uint8)
        img[1:3, 1:3] = 5
        img[5:7, 5:7] = 5
        img[1, 6] = 9
        labels, n = conn2d(img)
        assert n == 3
        assert labels[1, 1] != labels[5, 5]  # disconnected same-value regions
        assert labels[1, 6] not in (0, labels[1, 1], labels[5, 5])


class TestInterpz:
    def test_z_only_interpolation(self, rng):
        vol = (rng.random((5, 4, 4)) * 255).astype(np.uint8)
        out = interpz(jnp.asarray(vol), jnp.asarray([2]), jnp.asarray([1]), jnp.asarray([1.5]))
        want = 0.5 * vol[1, 1, 2] + 0.5 * vol[2, 1, 2]
        np.testing.assert_allclose(float(out[0]), want, atol=1e-4)


class TestExporters:
    def test_swc_and_log_files(self, tmp_path):
        p1 = str(tmp_path / "pts.swc")
        export_points_swc(p1, [(1, 2, 3), (4, 5, 6, 1.5)])
        lines = open(p1).read().strip().split("\n")
        assert len(lines) == 2 and lines[1].endswith("1.5 -1")

        p2 = str(tmp_path / "seeds.swc")
        export_seeds_swc(p2, [(1, 1, 1)], [(1, 0, 0)], arrow=5)
        lines = open(p2).read().strip().split("\n")
        assert len(lines) == 2 and lines[1].split()[-1] == "1"  # arrow tip linked

        p3 = str(tmp_path / "track.swc")
        export_track_swc(p3, [(0, 0, 0), (1, 0, 0), (2, 0, 0)], [True, True, False])
        assert len(open(p3).read().strip().split("\n")) == 2

        p4 = str(tmp_path / "vals.log")
        save_vector([1.5, 2.5], p4)
        assert open(p4).read().strip() == "1.5,2.5"


class TestAltExtractor:
    def test_finds_seeds_on_tube(self):
        from pnr_tpu.seeds.alt import extract3d_alt

        rng = np.random.default_rng(4)
        shape = (12, 40, 60)
        z, y, x = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
        d2 = (y - 20) ** 2 + ((z - 6) * 2.0) ** 2
        vol = np.clip(
            200.0 * np.exp(-d2 / (2 * 2.5**2)) + rng.normal(0, 5, shape), 0, 255
        ).astype(np.uint8)
        cfg = PNRConfig(sigmas=(2.0, 3.0), nodepervol=4, vol=9)
        pos, dirs, score, corr = extract3d_alt(
            vol, cfg, j8_threshold=20, seed_corr_min=0.5
        )
        assert len(pos) > 0
        # seeds concentrate on the tube axis, scores sorted descending
        assert np.median(np.abs(pos[:, 1] - 20)) < 3
        assert np.all(np.diff(score) <= 1e-6)
        assert np.all(corr > 0.5)
