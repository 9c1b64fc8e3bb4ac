"""End-to-end pipeline tests on synthetic phantoms (SURVEY.md §4 plan)."""

import numpy as np
import pytest

from pnr_tpu.config import PNRConfig
from pnr_tpu.graph.nodes import SOMA
from pnr_tpu.io.swc import read_swc, save_nodelist
from pnr_tpu.pipeline import reconstruction_func, soma_extraction
from pnr_tpu.graph.nodes import NodeList


def tube_phantom(shape=(12, 40, 80), radius=2.5, zdist=2.0, seed=11, intensity=200.0):
    """Bright x-aligned tube with realistic noise (noise-free ridges
    produce zero seeds by edge-maximum exclusion — see verify skill)."""
    rng = np.random.default_rng(seed)
    z, y, x = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    cy, cz = shape[1] / 2.0, shape[0] / 2.0
    d2 = (y - cy) ** 2 + ((z - cz) * zdist) ** 2
    profile = np.exp(-d2 / (2 * radius**2))
    # Intensity modulation along the tube + soft ends inside the volume:
    # a perfectly uniform ridge yields ZERO seeds (its tolerance flood
    # reaches the border and edge maxima are excluded — faithful
    # MaximumFinder behaviour); realistic stacks vary along the neurite.
    along = (0.7 + 0.3 * np.sin(x / 4.0)) * (x > 6) * (x < shape[2] - 7)
    vol = intensity * profile * along + rng.normal(0, 5, shape)
    return np.clip(vol, 0, 255).astype(np.uint8)


CFG = PNRConfig(
    sigmas=(2.0, 3.0), somaradius=0, tolerance=10.0, znccth=0.5, kappa=2.0,
    step=2, ni=40, np=16, zdist=2.0, nodepervol=4, vol=9, wave_size=32,
)


class TestEndToEnd:
    @pytest.fixture(scope="class")
    def result(self):
        return reconstruction_func(tube_phantom(), CFG, verbose=False)

    def test_produces_tree(self, result):
        assert len(result.tree) > 10
        assert result.trace_count >= 1

    def test_tree_follows_tube_axis(self, result):
        t = result.tree
        ys = np.asarray(t.y[1:])
        zs = np.asarray(t.z[1:])
        xs = np.asarray(t.x[1:])
        # nodes lie near the tube axis (y=20, z=6)
        assert np.median(np.abs(ys - 20.0)) < 2.0
        assert np.median(np.abs(zs - 6.0)) < 2.0
        # tree spans a good stretch of the tube
        assert xs.max() - xs.min() > 30

    def test_tree_structure_valid(self, result):
        t = result.tree
        for i in range(1, len(t)):
            assert len(t.nbr[i]) <= 1  # treelist: at most one parent
            for j in t.nbr[i]:
                assert 1 <= j < len(t)

    def test_swc_export(self, result, tmp_path):
        p = str(tmp_path / "out.swc")
        save_nodelist(result.tree, p, name="Advantra", comment=CFG.provenance_comment())
        rows = read_swc(p)
        assert len(rows) == len(result.tree) - 1
        with open(p) as f:
            content = f.read()
        assert "#znccth=0.5" in content  # provenance embedded

    def test_reproducible(self):
        r1 = reconstruction_func(tube_phantom(), CFG, verbose=False)
        r2 = reconstruction_func(tube_phantom(), CFG, verbose=False)
        np.testing.assert_array_equal(
            np.asarray(r1.tree.x), np.asarray(r2.tree.x)
        )


class TestSomaExtraction:
    def test_soma_detected_and_mapped(self):
        shape = (12, 48, 48)
        z, y, x = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
        d2 = (x - 24) ** 2 + (y - 24) ** 2 + ((z - 6) * 2.0) ** 2
        vol = np.clip(220.0 * np.exp(-d2 / (2 * 8.0**2)), 0, 255).astype(np.uint8)
        cfg = PNRConfig(somaradius=4, sigmas=(2.0,), nodepervol=4, vol=9)
        nodes = NodeList()
        smap = soma_extraction(vol, cfg, nodes)
        assert len(nodes) == 2  # dummy + one soma
        assert nodes.type[1] == SOMA
        assert abs(nodes.x[1] - 24) < 3 and abs(nodes.y[1] - 24) < 3
        # smap voxels point at the soma node id
        assert smap.max() == 1
        assert smap[6, 24, 24] == 1

    def test_empty_when_no_soma(self):
        vol = np.zeros((8, 32, 32), np.uint8)
        cfg = PNRConfig(somaradius=4, sigmas=(2.0,), nodepervol=4, vol=9)
        nodes = NodeList()
        smap = soma_extraction(vol, cfg, nodes)
        assert len(nodes) == 1
        assert smap.max() == 0


class Test2DPath:
    def test_single_slice_runs(self):
        rng = np.random.default_rng(5)
        shape = (1, 48, 96)
        y, x = np.meshgrid(np.arange(48), np.arange(96), indexing="ij")
        along = (0.7 + 0.3 * np.sin(x / 4.0)) * (x > 6) * (x < 89)
        img = 200.0 * np.exp(-((y - 24) ** 2) / (2 * 2.5**2)) * along + rng.normal(0, 5, (48, 96))
        vol = np.clip(img, 0, 255).astype(np.uint8)[None]
        cfg = PNRConfig(
            sigmas=(2.0,), tolerance=10.0, znccth=0.4, kappa=2.0, step=2,
            ni=30, np=16, zdist=2.0, nodepervol=4, vol=9, wave_size=16,
        )
        res = reconstruction_func(vol, cfg, verbose=False)
        assert res.trace_count >= 1
        if len(res.tree) > 1:
            assert np.median(np.abs(np.asarray(res.tree.y[1:]) - 24.0)) < 3.0


class Test2DPathTube:
    def test_single_slice_tube_mode(self):
        import dataclasses

        rng = np.random.default_rng(5)
        y, x = np.meshgrid(np.arange(48), np.arange(96), indexing="ij")
        along = (0.7 + 0.3 * np.sin(x / 4.0)) * (x > 6) * (x < 89)
        img = 200.0 * np.exp(-((y - 24) ** 2) / (2 * 2.5**2)) * along + rng.normal(0, 5, (48, 96))
        vol = np.clip(img, 0, 255).astype(np.uint8)[None]
        cfg = PNRConfig(
            sigmas=(2.0,), tolerance=10.0, znccth=0.4, kappa=2.0, step=2,
            ni=30, np=16, zdist=2.0, nodepervol=4, vol=9, wave_size=16,
            zncc_mode="tube",
        )
        res = reconstruction_func(vol, cfg, verbose=False)
        assert res.trace_count >= 1
        if len(res.tree) > 1:
            assert np.median(np.abs(np.asarray(res.tree.y[1:]) - 24.0)) < 3.0


class TestMidresParity:
    def test_cli_writes_reference_artifact_list(self, tmp_path):
        """--save-midres produces the reference's saveMidres artifact
        set, artifact for artifact (Advantra_plugin.cpp:2098-2141 per-
        stage reconstruct dumps + seeds/J8/directionality/density/soma)."""
        import subprocess
        import sys
        import os

        from pnr_tpu.io.volume import save_volume

        vol = tube_phantom(shape=(10, 32, 64))
        img = str(tmp_path / "t.tif")
        save_volume(img, vol)
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env.pop("PYTHONPATH", None)
        r = subprocess.run(
            [
                sys.executable, "-m", "pnr_tpu.cli", "-i", img,
                "-p", "2,3", "0", "10", "0.5", "2", "2", "40", "16", "2", "4", "1",
                "--save-midres", "--quiet",
            ],
            cwd="/root/repo", env=env, capture_output=True, text=True, timeout=900,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        expected = (
            ["_Advantra.swc", "_J8.tif", "_Seeds.swc", "_VxVyVz.swc",
             "_TraceDensity.tif"]
            + [f"_{n}_.swc" for n in ("n0", "n0tree", "n0res", "n1", "n2", "n2tree")]
            + [f"_{n}_.log" for n in ("n0len", "n0corr", "n1len")]
        )
        for suffix in expected:
            assert os.path.exists(img + suffix), f"missing {suffix}"
        # the stats logs are comma-separated scalars
        vals = open(img + "_n0len_.log").read().strip().split(",")
        assert len(vals) >= 1 and all(float(v) >= 0 for v in vals)

    def test_midres_stage_snapshots_consistent(self):
        """n1 has refine applied (same count as n0res), n2 grouped (fewer
        or equal), n2tree a forest."""
        import dataclasses

        cfg = dataclasses.replace(CFG, save_midres=True)
        res = reconstruction_func(tube_phantom(), cfg, verbose=False)
        mid = res.midres
        for k in ("n0", "n0tree", "n0len", "n0corr", "n0res", "n1", "n1len",
                  "n2", "n2tree", "vx", "trace_density"):
            assert k in mid, f"missing midres key {k}"
        assert len(mid["n0res"]) >= len(mid["n0"])  # resampling inserts
        assert len(mid["n1"]) == len(mid["n0res"])  # refine moves, keeps count
        assert len(mid["n2"]) <= len(mid["n1"])  # grouping merges
        assert len(mid["n0len"]) >= 1
        for i in range(1, len(mid["n2tree"])):
            assert len(mid["n2tree"].nbr[i]) <= 1  # forest: one parent max


class TestTubeVsExactPipeline:
    def test_tube_matches_exact_topology(self, tmp_path):
        """The tube likelihood is an approximation of the exact znccBBB;
        end-to-end SWCs from both engines must agree structurally."""
        import dataclasses

        from pnr_tpu.utils.swc_compare import compare_swc

        vol = tube_phantom()
        exact = reconstruction_func(
            vol, dataclasses.replace(CFG, zncc_mode="exact"), verbose=False
        )
        tube = reconstruction_func(
            vol, dataclasses.replace(CFG, zncc_mode="tube"), verbose=False
        )
        pa = str(tmp_path / "exact.swc")
        pb = str(tmp_path / "tube.swc")
        save_nodelist(exact.tree, pa)
        save_nodelist(tube.tree, pb)
        s = compare_swc(read_swc(pb), read_swc(pa), dist=4.0, resample=1.0)
        assert s.f1 > 0.8, f"tube vs exact diverged: {s}"


class TestCliMesh:
    def test_cli_mesh_flag_runs_sharded(self, tmp_path):
        """--mesh N routes through the multi-device pipeline, and
        --checkpoint is honoured there (not only on the single-device
        path)."""
        import os
        import subprocess
        import sys

        from pnr_tpu.io.volume import save_volume

        vol = tube_phantom(shape=(16, 32, 64))
        img = str(tmp_path / "t.tif")
        ck = str(tmp_path / "ck.npz")
        save_volume(img, vol)
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
        env.pop("PYTHONPATH", None)
        r = subprocess.run(
            [
                sys.executable, "-m", "pnr_tpu.cli", "-i", img,
                "-p", "2,3", "0", "10", "0.5", "2", "2", "40", "16", "2", "4", "1",
                "--mesh", "8", "--zncc-mode", "tube", "--quiet",
                "--checkpoint", ck,
            ],
            cwd="/root/repo", env=env, capture_output=True, text=True, timeout=900,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert os.path.exists(img + "_Advantra.swc")
        assert os.path.exists(ck), "--mesh run ignored --checkpoint"


class TestCliBatch:
    def test_cli_multiple_images_stream_batch(self, tmp_path):
        """Several -i inputs stream through the batch driver, one SWC
        each; single-image-only flags are rejected."""
        import os

        from pnr_tpu.cli import main
        from pnr_tpu.io.volume import save_volume

        imgs = []
        for k in range(2):
            p = str(tmp_path / f"t{k}.tif")
            save_volume(p, tube_phantom(seed=50 + k))
            imgs.append(p)
        params = ["2,3", "0", "10", "0.5", "2", "2", "40", "16", "2", "4", "1"]
        metrics = str(tmp_path / "metrics.json")
        rc = main(
            ["-i", *imgs, "-p", *params, "--zncc-mode", "tube", "--quiet",
             "--metrics", metrics]
        )
        assert rc == 0
        for p in imgs:
            assert os.path.exists(p + "_Advantra.swc")
        import json

        with open(metrics) as f:
            m = json.load(f)
        assert [e["image"] for e in m["stacks"]] == imgs
        for e in m["stacks"]:
            assert e["tree_nodes"] > 0 and e["trace_count"] > 0
            assert e["timings_s"] and all(v >= 0 for v in e["timings_s"].values())
        assert "znccth" in m["params"]
        rc = main(["-i", *imgs, "-p", *params, "--mesh", "8", "--quiet"])
        assert rc == 1  # --mesh takes a single input


class TestBatchDriver:
    def test_batch_matches_individual_and_reuses_tracker(self):
        """reconstruction_batch shares one tracker across same-shaped
        stacks; stack 0 matches an individual run with the same key."""
        import jax

        from pnr_tpu.pipeline import reconstruction_batch

        vols = [tube_phantom(seed=11), tube_phantom(seed=12)]
        key = jax.random.key(0)
        results = list(reconstruction_batch(vols, CFG, key=key))
        assert len(results) == 2
        for r in results:
            assert len(r.tree) > 10

        solo = reconstruction_func(
            vols[0], CFG, verbose=False, key=jax.random.fold_in(key, 0)
        )
        assert len(solo.tree) == len(results[0].tree)
        np.testing.assert_allclose(
            np.asarray(solo.tree.x), np.asarray(results[0].tree.x), atol=1e-5
        )

    def test_prefetch_pipeline_identical(self):
        """The prefetching two-stage pipeline (front half of stack i+1
        overlapped with the back half of stack i) must be bitwise
        identical to the sequential driver: the front half is a pure
        function of (vol, cfg)."""
        import jax

        from pnr_tpu.pipeline import reconstruction_batch

        vols = [tube_phantom(seed=21), tube_phantom(seed=22), tube_phantom(seed=23)]
        key = jax.random.key(3)
        seq = list(reconstruction_batch(vols, CFG, key=key, prefetch=False))
        pre = list(reconstruction_batch(vols, CFG, key=key, prefetch=True))
        assert len(seq) == len(pre) == 3
        for a, b in zip(seq, pre):
            assert len(a.tree) == len(b.tree)
            np.testing.assert_array_equal(np.asarray(a.tree.x), np.asarray(b.tree.x))
            np.testing.assert_array_equal(np.asarray(a.n0.x), np.asarray(b.n0.x))
            np.testing.assert_array_equal(a.seeds_pos, b.seeds_pos)
            assert a.trace_count == b.trace_count

    def test_score_seeds_paths(self):
        """_score_seeds must use the patch engine for BOTH small and
        >chunk seed counts (same values), and must fall back to the
        gather zncc when the tracker has no patch engine."""
        import jax.numpy as jnp

        from pnr_tpu.pipeline.reconstruct import _score_seeds
        from pnr_tpu.smc.tracker import BatchedTracker

        vol = tube_phantom(seed=41)
        tracker = BatchedTracker(CFG, is2d=False)
        field = tracker.prepare_field(jnp.asarray(vol))
        rng = np.random.default_rng(0)
        n = 1500  # > the 1024 engine chunk
        pos = np.stack(
            [
                rng.uniform(5, vol.shape[2] - 5, n),
                rng.uniform(5, vol.shape[1] - 5, n),
                rng.uniform(2, vol.shape[0] - 2, n),
            ],
            axis=-1,
        ).astype(np.float32)
        d = rng.normal(size=(n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        corr_big = _score_seeds(field, pos, d, tracker)
        corr_small = _score_seeds(field, pos[:200], d[:200], tracker)
        np.testing.assert_allclose(corr_big[:200], corr_small, atol=2e-5)

        # engine-less tracker (PNR_TPU_EXACT_ENGINE=0 equivalent)
        bare = BatchedTracker(CFG, is2d=False)
        bare._patch_engine = None
        corr_gather = _score_seeds(jnp.asarray(vol), pos[:64], d[:64], bare)
        assert corr_gather.shape == (64,)
        assert np.isfinite(corr_gather).all()

    def test_prefetch_edge_cases(self):
        """Empty input, generator input, depth > len(vols)."""
        from pnr_tpu.pipeline import reconstruction_batch

        assert list(reconstruction_batch([], CFG)) == []
        # a generator (not a list) with depth larger than its length
        gen_in = (tube_phantom(seed=31) for _ in range(2))
        out = list(reconstruction_batch(gen_in, CFG, prefetch_depth=5))
        assert len(out) == 2
        assert all(len(r.tree) > 10 for r in out)


class TestCommonDialog:
    """Terminal CommonDialog equivalent (nf_dialog.h:15-260 / the menu
    parameter flow, Advantra_plugin.cpp:184-272)."""

    def test_defaults_and_overrides(self):
        import io

        from pnr_tpu.ui import CommonDialog

        d = CommonDialog(
            ["neuritesigmas", "step"], ["2,3", "3"],
            infile=io.StringIO("4,5\n\n"), outfile=io.StringIO(),
        )
        assert d.exec_() is True
        assert d.get_para("neuritesigmas") == "4,5"
        assert d.get_num("step") == 3.0

    def test_cancel(self):
        import io

        from pnr_tpu.ui import CommonDialog

        d = CommonDialog(["a"], ["1"], infile=io.StringIO("cancel\n"), outfile=io.StringIO())
        assert d.exec_() is False
        assert d.accepted is False

    def test_unknown_item_raises(self):
        import io

        from pnr_tpu.ui import CommonDialog

        d = CommonDialog(["a"], ["1"], infile=io.StringIO("\n"), outfile=io.StringIO())
        d.exec_()
        with pytest.raises(KeyError):
            d.get_para("missing")

    def test_prompt_parameters_full_flow(self):
        import io

        from pnr_tpu.ui import prompt_parameters

        # override sigmas + vol, keep the rest; EOF accepts the tail
        cfg = prompt_parameters(
            infile=io.StringIO("2,4,6\n\n\n\n\n\n\n\n\n\n27\n"),
            outfile=io.StringIO(),
        )
        assert cfg is not None
        assert cfg.sigmas == (2.0, 4.0, 6.0)
        assert cfg.vol == 27
        # untouched fields keep the reference defaults
        from pnr_tpu.config import PNRConfig

        assert cfg.step == PNRConfig().step

    def test_prompt_parameters_cancel(self):
        import io

        from pnr_tpu.ui import prompt_parameters

        assert prompt_parameters(
            infile=io.StringIO("cancel\n"), outfile=io.StringIO()
        ) is None

    def test_prompt_parameters_validates(self):
        import io

        from pnr_tpu.ui import prompt_parameters

        with pytest.raises(ValueError):
            prompt_parameters(
                infile=io.StringIO("2,3\n\n\n\n\n\n\n\n\n\n7\n"),  # vol=7 invalid
                outfile=io.StringIO(),
            )
