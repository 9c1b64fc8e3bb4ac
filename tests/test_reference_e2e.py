"""End-to-end tracer parity: the COMPILED reference's full seed loop
(frangi3d -> extractSeeds -> znccBBB filter/sort -> trackPos/trackNeg
with density maps, Advantra_plugin.cpp:2558-2710 via
oracle_api.cpp:ref_trace_all) vs this rebuild's pipeline on the same
volume, scored distributionally with utils/swc_compare (the reference
RNG is irreproducible by construction — SURVEY.md §7 hard-part 6)."""

import numpy as np
import pytest

from pnr_tpu.config import PNRConfig
from pnr_tpu.io.swc import read_swc, save_nodelist
from pnr_tpu.parity import get_oracle, unavailable_reason
from pnr_tpu.parity.oracle import reference_reconstruct_n0
from pnr_tpu.pipeline.reconstruct import reconstruction_func, reconstruct_graph
from pnr_tpu.utils.swc_compare import compare_swc

oracle = get_oracle()
pytestmark = pytest.mark.skipif(
    oracle is None, reason=f"reference oracle unavailable: {unavailable_reason()}"
)

CFG = PNRConfig(
    sigmas=(2.0, 3.0), tolerance=10.0, znccth=0.5, kappa=2.0, step=2,
    ni=40, np=10, zdist=2.0, nodepervol=4, vol=9, wave_size=32,
    zncc_mode="exact",
)


def phantom():
    """The branching-neuron phantom (finite branches with end caps —
    an edge-to-edge tube would be rejected wholesale by extractSeeds'
    edge-touch rule, seed.cpp:700-707)."""
    from tests.test_phantom_neuron import branching_neuron_phantom

    vol, _gold = branching_neuron_phantom()
    return vol


def _swc_rows(tree, path):
    save_nodelist(tree, str(path))
    return read_swc(str(path))


@pytest.fixture(scope="module")
def traced(tmp_path_factory):
    vol = phantom()
    tmp = tmp_path_factory.mktemp("e2e")

    # reference end-to-end -> n0 -> the rebuild's (parity-tested)
    # post-processing so both sides get identical graph treatment
    ref_n0, n_seeds, n_nodes = reference_reconstruct_n0(vol, CFG)
    ref_tree = reconstruct_graph(ref_n0.copy(), CFG)
    ref_rows = _swc_rows(ref_tree, tmp / "ref.swc")

    res = reconstruction_func(vol, CFG, verbose=False)
    our_rows = _swc_rows(res.tree, tmp / "ours.swc")
    return ref_n0, n_seeds, ref_rows, our_rows, res


class TestReferenceEndToEnd:
    def test_reference_produced_nodes(self, traced):
        ref_n0, n_seeds, ref_rows, _, _ = traced
        assert n_seeds > 0
        assert len(ref_n0) > 20
        assert len(ref_rows) > 10

    def test_swc_f1_vs_reference(self, traced, tmp_path):
        """BASELINE north star: matched SWC topology vs the plugin,
        gated against the reference's own replicate noise floor
        (VERDICT r3 item 3).

        The reference RNG is wall-clock seeded (srand(time(NULL)) per
        SMC iteration, tracker.cpp:1003,1098) so each replicate traces
        a variable subset of the phantom while this rebuild is
        deterministic. The only sound yardstick for "matched topology"
        is therefore the reference's agreement WITH ITSELF: we run N
        replicates, score every ref-vs-ref pair (the noise floor), and
        demand ours-vs-ref mean F1 within a margin of that floor.
        The floor POOLS two phantom topologies (VERDICT r4 item 4: the
        single-phantom 3-4-replicate floor swung 0.944 -> 0.881 between
        same-day runs — one bad draw could flip the gate): branching
        neuron (4 replicates) + crossing tubes (3 replicates), 9 pairs,
        gated on the POOLED mean. Calibrated 2026-08-20 single-phantom
        figures for scale: floor mean 0.931, std 0.035; ours-vs-ref
        0.938 — the rebuild agrees with the reference better than the
        reference agrees with itself."""
        import itertools

        from tests.test_phantom_neuron import crossing_tubes_phantom

        _, _, ref_rows, our_rows, res = traced
        floor = []
        ours = []
        # topology 1: branching neuron (reuses the fixture's replicate)
        reps = [np.asarray(ref_rows, np.float64)]
        for rep in range(3):
            ref_n0, _, _ = reference_reconstruct_n0(phantom(), CFG)
            reps.append(
                np.asarray(
                    _swc_rows(
                        reconstruct_graph(ref_n0.copy(), CFG),
                        tmp_path / f"ref{rep}.swc",
                    ),
                    np.float64,
                )
            )
        floor += [
            compare_swc(reps[a], reps[b], dist=4.0, resample=1.0).f1
            for a, b in itertools.combinations(range(len(reps)), 2)
        ]
        ours += [compare_swc(our_rows, r, dist=4.0, resample=1.0) for r in reps]

        # topology 2: crossing tubes
        vol2 = crossing_tubes_phantom()[0]
        reps2 = []
        for rep in range(3):
            ref_n0, _, _ = reference_reconstruct_n0(vol2, CFG)
            reps2.append(
                np.asarray(
                    _swc_rows(
                        reconstruct_graph(ref_n0.copy(), CFG),
                        tmp_path / f"x{rep}.swc",
                    ),
                    np.float64,
                )
            )
        floor += [
            compare_swc(reps2[a], reps2[b], dist=4.0, resample=1.0).f1
            for a, b in itertools.combinations(range(len(reps2)), 2)
        ]
        our2 = _swc_rows(
            reconstruction_func(vol2, CFG, verbose=False).tree,
            tmp_path / "ours2.swc",
        )
        ours += [compare_swc(our2, r, dist=4.0, resample=1.0) for r in reps2]

        ours_f1 = [s.f1 for s in ours]
        floor_mean = float(np.mean(floor))
        ours_mean = float(np.mean(ours_f1))
        # the floor itself must be sane (replicates trace one phantom)
        assert floor_mean >= 0.8, (floor, "reference replicates disagree")
        # margin = replicate noise (calibrated std 0.035, ~1.5 std),
        # against the POOLED two-topology floor
        assert ours_mean >= floor_mean - 0.05, (ours_mean, floor_mean, ours_f1)
        # hard absolute floors, independent of the measured yardstick
        assert ours_mean >= 0.85, (ours_mean, ours_f1)
        assert min(s.recall for s in ours) >= 0.8, ours_f1

    def test_n0_clouds_overlap(self, traced):
        """Raw tracer output (pre-post-processing): every reference node
        should have a rebuild node nearby and vice versa (Hausdorff-style
        distributional check on the traced point clouds)."""
        ref_n0, _, _, _, res = traced
        ref_pts = ref_n0.positions()[1:]
        our_pts = res.n0.positions()[1:]
        d = np.linalg.norm(ref_pts[:, None, :] - our_pts[None, :, :], axis=-1)
        ref_cov = (d.min(axis=1) <= 4.0).mean()
        our_cov = (d.min(axis=0) <= 4.0).mean()
        assert ref_cov >= 0.9, ref_cov
        assert our_cov >= 0.9, our_cov


class TestReference2D:
    """The reference's first-class 2-D path (P == 1,
    Advantra_plugin.cpp:2339): compiled frangi2d + 2-D tracker end to
    end vs the rebuild's 2-D pipeline on the same image."""

    @staticmethod
    def phantom2d():
        rng = np.random.default_rng(33)
        h, w = 96, 128
        y, x = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        # a Y-shaped planar neuron with end caps
        trunk = np.exp(-((y - 48) ** 2) / (2 * 2.2**2)) * (x > 10) * (x < 64)
        up = np.exp(-((y - 48 + 0.55 * (x - 64)) ** 2) / (2 * 2.2**2)) * (
            (x >= 64) & (x < 112)
        )
        dn = np.exp(-((y - 48 - 0.55 * (x - 64)) ** 2) / (2 * 2.2**2)) * (
            (x >= 64) & (x < 112)
        )
        img = 190.0 * np.maximum(trunk, np.maximum(up, dn))
        img = img * (0.8 + 0.2 * np.sin(x / 5.0))
        img = np.clip(img + rng.normal(0, 5, (h, w)), 0, 255)
        return img.astype(np.uint8)[None]

    def test_2d_swc_parity(self, tmp_path):
        cfg = PNRConfig(
            sigmas=(2.0, 3.0), tolerance=10.0, znccth=0.5, kappa=2.0,
            step=2, ni=40, np=10, zdist=2.0, nodepervol=4, vol=9,
            wave_size=32, zncc_mode="exact",
        )
        vol = self.phantom2d()
        ref_n0, n_seeds, _ = reference_reconstruct_n0(vol, cfg)
        assert n_seeds > 0 and len(ref_n0) > 10
        ref_rows = _swc_rows(
            reconstruct_graph(ref_n0.copy(), cfg), tmp_path / "ref2d.swc"
        )
        res = reconstruction_func(vol, cfg, verbose=False)
        our_rows = _swc_rows(res.tree, tmp_path / "ours2d.swc")
        s = compare_swc(our_rows, ref_rows, dist=4.0, resample=1.0)
        assert s.recall >= 0.8, s
        assert s.f1 >= 0.65, s
        # both stay planar
        assert np.all(np.abs(np.asarray(ref_n0.z[1:])) < 1.5)
        assert np.all(np.abs(np.asarray(res.n0.z[1:])) < 1.5)


class TestReferenceConfigSweep:
    """End-to-end parity across the config axes that change the
    bookkeeping semantics, each against the compiled reference's full
    seed loop: the vol=5/19/27 suppression stamps (incl. the
    documented y-clamp divergence class at 19/27), a step-3/kappa-4
    prior-table geometry, and a different particle count. Calibrated
    2026-08-20: single-replicate F1 0.914-0.970 across all axes; gates
    sit below the measured reference replicate-noise floor (min pair
    0.873)."""

    @pytest.mark.parametrize(
        "kw",
        [
            dict(vol=5),
            dict(vol=19),
            dict(vol=27),
            dict(step=3, kappa=4.0),
            dict(np=12),
        ],
        ids=lambda kw: "_".join(f"{k}{v:g}" for k, v in kw.items()),
    )
    def test_config_axis_parity(self, kw, tmp_path):
        import dataclasses

        cfg = dataclasses.replace(CFG, **kw)
        vol = phantom()
        ref_n0, n_seeds, _ = reference_reconstruct_n0(vol, cfg)
        assert n_seeds > 0 and len(ref_n0) > 20
        ref_rows = _swc_rows(
            reconstruct_graph(ref_n0.copy(), cfg), tmp_path / "ref.swc"
        )
        res = reconstruction_func(vol, cfg, verbose=False)
        our_rows = _swc_rows(res.tree, tmp_path / "ours.swc")
        s = compare_swc(our_rows, ref_rows, dist=4.0, resample=1.0)
        assert s.recall >= 0.85, (kw, s)
        assert s.f1 >= 0.80, (kw, s)


class TestReferenceMorePhantoms:
    """The branching phantom above carries the deep pooled-replicate
    gate; these battery phantoms add structural diversity (an X
    crossing that stresses density suppression, and genuine 3-D
    curvature that stresses the z-transition priors) with single-
    replicate distributional gates."""

    @pytest.mark.parametrize("maker", ["crossing", "tortuous"])
    def test_swc_parity_battery(self, maker, tmp_path):
        from tests.test_phantom_neuron import (
            crossing_tubes_phantom,
            tortuous_3d_phantom,
        )

        vol, _gold = (
            crossing_tubes_phantom() if maker == "crossing"
            else tortuous_3d_phantom()
        )
        ref_n0, n_seeds, _ = reference_reconstruct_n0(vol, CFG)
        assert n_seeds > 0 and len(ref_n0) > 20
        ref_rows = _swc_rows(
            reconstruct_graph(ref_n0.copy(), CFG), tmp_path / "ref.swc"
        )
        res = reconstruction_func(vol, CFG, verbose=False)
        our_rows = _swc_rows(res.tree, tmp_path / "ours.swc")
        s = compare_swc(our_rows, ref_rows, dist=4.0, resample=1.0)
        # single reference replicate (wall-clock RNG): recall is the
        # sound direction — everything the reference traced, we trace
        assert s.recall >= 0.8, (maker, s)
        assert s.f1 >= 0.6, (maker, s)
