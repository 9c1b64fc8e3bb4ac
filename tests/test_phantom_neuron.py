"""End-to-end quality: reconstruct a branching neuron phantom and score
against its ground-truth centerline (the gold166-style validation of
SURVEY.md §7 step 7, with synthetic gold since the BigNeuron stacks are
not vendored)."""

import numpy as np
import pytest

from pnr_tpu.config import PNRConfig
from pnr_tpu.io.swc import save_nodelist, read_swc
from pnr_tpu.pipeline import reconstruction_func
from pnr_tpu.utils.swc_compare import compare_swc


def branching_neuron_phantom(shape=(16, 72, 96), radius=2.2, zdist=2.0, seed=2):
    """Y-shaped neurite: trunk along +x, two branches at ~30 degrees.

    Returns (volume uint8, gold SWC rows)."""
    rng = np.random.default_rng(seed)
    pts = []
    # trunk: x in [8, 48] at y=36, z=8
    for t in np.linspace(0, 1, 60):
        pts.append((8 + 40 * t, 36.0, 8.0))
    # branch A: up-right
    for t in np.linspace(0, 1, 50):
        pts.append((48 + 38 * t, 36 + 20 * t, 8.0))
    # branch B: down-right
    for t in np.linspace(0, 1, 50):
        pts.append((48 + 38 * t, 36 - 20 * t, 8.0))
    pts = np.asarray(pts)

    z, y, x = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    vol = np.zeros(shape)
    for px, py, pz in pts:
        d2 = (x - px) ** 2 + (y - py) ** 2 + ((z - pz) * zdist) ** 2
        np.maximum(vol, np.exp(-d2 / (2 * radius**2)), out=vol)
    intensity = 190.0 * (0.75 + 0.25 * np.sin(x / 5.0))
    vol = np.clip(vol * intensity + rng.normal(0, 5, shape), 0, 255).astype(np.uint8)

    gold = []
    for i, (px, py, pz) in enumerate(pts, start=1):
        if i == 1:
            parent = -1
        elif i == 111:  # branch B roots at the trunk tip, not branch A's end
            parent = 60
        else:
            parent = i - 1
        gold.append([i, 2, px, py, pz, radius, parent])
    return vol, np.asarray(gold, np.float64)


CFG = PNRConfig(
    sigmas=(2.0, 3.0), tolerance=10.0, znccth=0.5, kappa=2.0, step=2, ni=60,
    np=16, zdist=2.0, nodepervol=4, vol=9, wave_size=32, zncc_mode="tube",
)


def _score(vol, gold, cfg, tmpdir):
    res = reconstruction_func(vol, cfg, verbose=False)
    p = str(tmpdir / "rec.swc")
    save_nodelist(res.tree, p)
    rec = read_swc(p)
    # density-invariant DIADEM-style scoring: both morphologies
    # arclength-resampled to 1.0 before one-to-one matching (raw
    # matching understates recall by the node-count ratio)
    return compare_swc(rec, gold, dist=4.0, resample=1.0), res


class TestBranchingNeuron:
    @pytest.fixture(scope="class")
    def scored(self, tmp_path_factory):
        vol, gold = branching_neuron_phantom()
        score, res = _score(vol, gold, CFG, tmp_path_factory.mktemp("swc"))
        return score, res, gold

    def test_recall_covers_all_branches(self, scored):
        score, res, gold = scored
        # measured 0.96 recall / 1.0 coverage on this phantom — gates at
        # the floor a real regression would break (VERDICT r1 item 7)
        assert score.recall > 0.85, f"recall too low: {score}"
        tree_xyz = np.stack(
            [np.asarray(res.tree.x[1:]), np.asarray(res.tree.y[1:]), np.asarray(res.tree.z[1:])],
            axis=-1,
        )
        for name, sel in (
            ("trunk", gold[:60]),
            ("branchA", gold[60:110]),
            ("branchB", gold[110:]),
        ):
            gp = sel[:, 2:5]
            d = np.linalg.norm(tree_xyz[:, None, :] - gp[None, :, :], axis=-1)
            covered = (d.min(axis=0) < 4.0).mean()
            assert covered > 0.8, f"{name} coverage {covered:.2f}"

    def test_precision_and_f1(self, scored):
        score, _, _ = scored
        assert score.precision > 0.9, f"precision too low: {score}"
        assert score.f1 > 0.88, f"f1 too low: {score}"
        assert score.topology > 0.95, f"topology too low: {score}"

    def test_no_spurious_far_nodes(self, scored):
        _, res, gold = scored
        tree_xyz = np.stack(
            [np.asarray(res.tree.x[1:]), np.asarray(res.tree.y[1:]), np.asarray(res.tree.z[1:])],
            axis=-1,
        )
        gp = gold[:, 2:5]
        d = np.linalg.norm(tree_xyz[:, None, :] - gp[None, :, :], axis=-1).min(axis=1)
        assert (d > 8.0).mean() < 0.1, "too many nodes far from the gold structure"


class TestBranchingNeuronExact:
    """End-to-end quality gate for the exact-parity ZNCC engine (the
    round-1 gate only covered tube mode — VERDICT item 7)."""

    def test_exact_mode_quality(self, tmp_path):
        vol, gold = branching_neuron_phantom()
        import dataclasses

        cfg = dataclasses.replace(CFG, zncc_mode="exact", ni=40)
        score, res = _score(vol, gold, cfg, tmp_path)
        assert score.recall > 0.8, f"exact-mode recall too low: {score}"
        assert score.precision > 0.85, f"exact-mode precision too low: {score}"
        assert score.f1 > 0.85, f"exact-mode f1 too low: {score}"


def crossing_tubes_phantom(shape=(16, 80, 96), radius=2.2, zdist=2.0, seed=9):
    """Two straight neurites crossing in the xy plane (~45 degrees) —
    the intersection stresses density suppression and direction priors
    (a trace must pass straight through the other tube's bright blob).

    Returns (volume uint8, gold SWC rows: two independent polylines)."""
    rng = np.random.default_rng(seed)
    pts = []
    # tube A: from (10, 20) to (86, 60); tube B: from (10, 60) to (86, 20)
    for t in np.linspace(0, 1, 70):
        pts.append((10 + 76 * t, 20 + 40 * t, 8.0))
    for t in np.linspace(0, 1, 70):
        pts.append((10 + 76 * t, 60 - 40 * t, 8.0))
    pts = np.asarray(pts)

    z, y, x = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    vol = np.zeros(shape)
    for px, py, pz in pts:
        d2 = (x - px) ** 2 + (y - py) ** 2 + ((z - pz) * zdist) ** 2
        np.maximum(vol, np.exp(-d2 / (2 * radius**2)), out=vol)
    intensity = 190.0 * (0.75 + 0.25 * np.sin(x / 5.0))
    vol = np.clip(vol * intensity + rng.normal(0, 5, shape), 0, 255).astype(np.uint8)

    gold = []
    for i, (px, py, pz) in enumerate(pts, start=1):
        parent = -1 if i in (1, 71) else i - 1
        gold.append([i, 2, px, py, pz, radius, parent])
    return vol, np.asarray(gold, np.float64)


class TestCrossingTubes:
    """Intersection handling: both neurites must be recovered through
    the crossing (the trace that arrives second must pass straight
    through the already-suppressed crossing region or link into it)."""

    def test_crossing_quality(self, tmp_path):
        vol, gold = crossing_tubes_phantom()
        score, res = _score(vol, gold, CFG, tmp_path)
        assert score.recall > 0.8, f"crossing recall too low: {score}"
        assert score.precision > 0.85, f"crossing precision too low: {score}"
        # each arm individually covered (no arm lost to suppression)
        tree_xyz = np.stack(
            [
                np.asarray(res.tree.x[1:]),
                np.asarray(res.tree.y[1:]),
                np.asarray(res.tree.z[1:]),
            ],
            axis=-1,
        )
        for name, sel in (("tubeA", gold[:70]), ("tubeB", gold[70:])):
            gp = sel[:, 2:5]
            d = np.linalg.norm(tree_xyz[:, None, :] - gp[None, :, :], axis=-1)
            covered = (d.min(axis=0) < 4.0).mean()
            assert covered > 0.75, f"{name} coverage {covered:.2f}"


class TestNoisyPhantom:
    """Larger, noisier phantom (2x the noise, dimmer tube) — the
    regression surface for seed scoring + SMC robustness."""

    def test_noisy_quality(self, tmp_path):
        vol, gold = branching_neuron_phantom(shape=(16, 80, 112), seed=7)
        rng = np.random.default_rng(13)
        noisy = np.clip(
            vol.astype(np.float32) * 0.8 + rng.normal(0, 10, vol.shape), 0, 255
        ).astype(np.uint8)
        score, res = _score(noisy, gold, CFG, tmp_path)
        assert score.recall > 0.7, f"noisy recall too low: {score}"
        assert score.precision > 0.8, f"noisy precision too low: {score}"


def branching_neuron_phantom_2d(shape=(1, 80, 112), radius=2.2, seed=5):
    """The Y-phantom flattened to a single slice (the reference's P==1
    first-class 2-D path, Advantra_plugin.cpp:2339 / frangi2d)."""
    rng = np.random.default_rng(seed)
    pts = []
    for t in np.linspace(0, 1, 60):
        pts.append((10 + 44 * t, 40.0, 0.0))
    for t in np.linspace(0, 1, 50):
        pts.append((54 + 44 * t, 40 + 24 * t, 0.0))
    for t in np.linspace(0, 1, 50):
        pts.append((54 + 44 * t, 40 - 24 * t, 0.0))
    pts = np.asarray(pts)

    _, y, x = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    vol = np.zeros(shape)
    for px, py, _pz in pts:
        d2 = (x - px) ** 2 + (y - py) ** 2
        np.maximum(vol, np.exp(-d2 / (2 * radius**2)), out=vol)
    intensity = 190.0 * (0.75 + 0.25 * np.sin(x / 5.0))
    vol = np.clip(vol * intensity + rng.normal(0, 5, shape), 0, 255).astype(np.uint8)

    gold = []
    for i, (px, py, pz) in enumerate(pts, start=1):
        if i == 1:
            parent = -1
        elif i == 111:
            parent = 60
        else:
            parent = i - 1
        gold.append([i, 2, px, py, pz, radius, parent])
    return vol, np.asarray(gold, np.float64)


class Test2DPhantom:
    """Ground-truth quality gate for the 2-D (P == 1) pipeline — the
    3-D battery exercises frangi3d/3-D tracing only, while the
    reference treats single-slice images as first-class."""

    def test_2d_quality(self, tmp_path):
        vol, gold = branching_neuron_phantom_2d()
        import dataclasses

        cfg = dataclasses.replace(CFG, zdist=1.0)
        score, res = _score(vol, gold, cfg, tmp_path)
        assert score.recall > 0.75, f"2-D recall too low: {score}"
        assert score.precision > 0.85, f"2-D precision too low: {score}"
        # everything must stay in the plane
        assert np.allclose(res.tree.z[1:], 0.0, atol=1.0)


def tortuous_3d_phantom(shape=(24, 64, 112), radius=2.2, zdist=2.0, seed=17):
    """A neurite with genuine 3-D curvature: the centerline undulates
    in BOTH y and z along x, plus a branch diving through z. Every
    other phantom in the battery is planar (constant z=8), so the
    tracer's z-transition priors and the anisotropic (zdist) template
    frames were only ever exercised by noise — this one gates them.

    Returns (volume uint8, gold SWC rows)."""
    rng = np.random.default_rng(seed)
    pts = []
    # trunk: x in [10, 100], y and z sinusoidal (z amplitude 4 around 12)
    for t in np.linspace(0, 1, 90):
        xx = 10 + 90 * t
        pts.append((xx, 32 + 10 * np.sin(xx / 14.0), 12 + 4 * np.sin(xx / 11.0)))
    trunk_n = len(pts)
    # branch: leaves the trunk mid-way, dives from z~14 to z~5
    bx0 = 10 + 90 * 0.5
    by0 = 32 + 10 * np.sin(bx0 / 14.0)
    bz0 = 12 + 4 * np.sin(bx0 / 11.0)
    for t in np.linspace(0.04, 1, 40):
        pts.append((bx0 + 34 * t, by0 + 16 * t, bz0 - 8 * t))
    pts = np.asarray(pts)

    z, y, x = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    vol = np.zeros(shape)
    for px, py, pz in pts:
        d2 = (x - px) ** 2 + (y - py) ** 2 + ((z - pz) * zdist) ** 2
        np.maximum(vol, np.exp(-d2 / (2 * radius**2)), out=vol)
    intensity = 190.0 * (0.75 + 0.25 * np.sin(x / 5.0))
    vol = np.clip(vol * intensity + rng.normal(0, 5, shape), 0, 255).astype(np.uint8)

    gold = []
    branch_root = int(round(0.5 * (90 - 1))) + 1  # trunk node nearest the fork
    for i, (px, py, pz) in enumerate(pts, start=1):
        if i == 1:
            parent = -1
        elif i == trunk_n + 1:
            parent = branch_root
        else:
            parent = i - 1
        gold.append([i, 2, px, py, pz, radius, parent])
    return vol, np.asarray(gold, np.float64)


class TestTortuous3D:
    """Out-of-plane tracing quality: recall must hold while the
    centerline moves through z (anisotropic sampling, z-transitions)."""

    def test_3d_curvature_quality(self, tmp_path):
        vol, gold = tortuous_3d_phantom()
        score, res = _score(vol, gold, CFG, tmp_path)
        assert score.recall > 0.75, f"3-D tortuous recall too low: {score}"
        assert score.precision > 0.85, f"3-D tortuous precision too low: {score}"
        # the reconstruction must actually span the z undulation
        zs = np.asarray(res.tree.z[1:])
        assert zs.max() - zs.min() > 5.0, "reconstruction collapsed to a plane"


def multi_neuron_soma_phantom(shape=(20, 96, 128), zdist=2.0, seed=21):
    """Two neurons, each a bright soma blob with two neurites of
    DIFFERENT radii leaving it. Gates the full soma path at quality
    level (the unit tests only check detection): erode/threshold/CC
    soma extraction, seed suppression inside the soma mask, the
    trackPos soma-hit link (traces walking INTO a soma must stop and
    link, Advantra_plugin.cpp:2426-2481 + tracker.cpp:850-862), and
    multi-tree extraction.

    Returns (volume uint8, gold SWC rows: soma centers + centerlines)."""
    rng = np.random.default_rng(seed)
    soma_a = (24.0, 28.0, 10.0)   # (x, y, z)
    soma_b = (104.0, 68.0, 10.0)
    neurites = [
        # (start soma, end point, radius): start OUTSIDE the soma blob
        (soma_a, (72.0, 28.0, 10.0), 2.2),   # A1: straight +x
        (soma_a, (56.0, 62.0, 10.0), 1.8),   # A2: diagonal, thinner
        (soma_b, (64.0, 82.0, 10.0), 2.2),   # B1: -x toward the edge
        (soma_b, (116.0, 24.0, 10.0), 1.8),  # B2: down-right, thinner
    ]

    z, y, x = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    vol = np.zeros(shape)
    gold = []
    nid = 0
    for sx, sy, sz in (soma_a, soma_b):
        d2 = (x - sx) ** 2 + (y - sy) ** 2 + ((z - sz) * zdist) ** 2
        np.maximum(vol, 1.2 * np.exp(-d2 / (2 * 5.0**2)), out=vol)
        nid += 1
        gold.append([nid, 1, sx, sy, sz, 5.0, -1])
    for (sx, sy, sz), (ex, ey, ez), radius in neurites:
        seg = np.asarray([ex - sx, ey - sy, ez - sz])
        length = np.linalg.norm(seg)
        root = 1 if (sx, sy, sz) == soma_a else 2
        first = True
        # the tube is DRAWN from inside the soma blob (t=5/len) so the
        # image is continuous, but gold points start outside the soma
        # suppression zone (t=10/len): seeds inside the smap are
        # dropped and traces STOP at the soma, so centerline inside it
        # is structurally unreachable (reference semantics)
        for t in np.linspace(5.0 / length, 1.0, int(length)):
            px, py, pz = np.asarray([sx, sy, sz]) + t * seg
            d2 = (x - px) ** 2 + (y - py) ** 2 + ((z - pz) * zdist) ** 2
            np.maximum(vol, np.exp(-d2 / (2 * radius**2)), out=vol)
            if t * length < 10.0:
                continue
            nid += 1
            gold.append([nid, 2, px, py, pz, radius, root if first else nid - 1])
            first = False
    intensity = 185.0 * (0.78 + 0.22 * np.sin(x / 5.0))
    vol = np.clip(vol * intensity + rng.normal(0, 5, shape), 0, 255).astype(np.uint8)
    return vol, np.asarray(gold, np.float64)


def snr_phantom(
    noise_sigma,
    shape=(16, 72, 96),
    radius=2.2,
    zdist=2.0,
    seed=11,
    amplitude=150.0,
    bg_gradient=True,
    psf=True,
):
    """Realism-battery phantom (VERDICT r3 item 6): the Y-neuron under
    microscopy-like degradations — a linear background ramp, an
    anisotropic PSF blur (z wider than xy, like a confocal z-spread),
    and additive Gaussian noise. The reference's intended data is noisy
    anisotropic microscopy (reference README.md:11-13); its stacks are
    not vendored, so this battery records an operating envelope instead.

    SNR := tube amplitude above local background / noise sigma.
    Returns (volume uint8, gold SWC rows, snr)."""
    rng = np.random.default_rng(seed)
    pts = []
    for t in np.linspace(0, 1, 60):
        pts.append((8 + 40 * t, 36.0, 8.0))
    for t in np.linspace(0, 1, 50):
        pts.append((48 + 38 * t, 36 + 20 * t, 8.0))
    for t in np.linspace(0, 1, 50):
        pts.append((48 + 38 * t, 36 - 20 * t, 8.0))
    pts = np.asarray(pts)

    z, y, x = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    tube = np.zeros(shape)
    for px, py, pz in pts:
        d2 = (x - px) ** 2 + (y - py) ** 2 + ((z - pz) * zdist) ** 2
        np.maximum(tube, np.exp(-d2 / (2 * radius**2)), out=tube)
    vol = amplitude * tube
    if bg_gradient:
        # a 20->55 intensity ramp across y: autofluorescence-like
        # structured background the global thresholds must survive
        vol = vol + 20.0 + 35.0 * (y / max(shape[1] - 1, 1))
    if psf:
        import scipy.ndimage as ndi

        # anisotropic PSF: z-spread ~2x the lateral one in physical
        # units (z voxels already cover zdist microns each)
        vol = ndi.gaussian_filter(vol, sigma=(1.6 / zdist * 2.0, 0.8, 0.8))
    vol = np.clip(vol + rng.normal(0, noise_sigma, shape), 0, 255).astype(
        np.uint8
    )

    gold = []
    for i, (px, py, pz) in enumerate(pts, start=1):
        if i == 1:
            parent = -1
        elif i == 111:
            parent = 60
        else:
            parent = i - 1
        gold.append([i, 2, px, py, pz, radius, parent])
    snr = amplitude / max(noise_sigma, 1e-9)
    return vol, np.asarray(gold, np.float64), snr


class TestSNRBattery:
    """F1-vs-SNR operating envelope (VERDICT r3 item 6): background
    ramp + anisotropic PSF + noise sweep, gated on graceful degradation
    — no cliff above the reference's own operating regime (microscopy
    SNR >~ 5). Calibrated 2026-08-20 on this battery: F1 0.93/0.93/0.95
    at SNR 30/15/10, 0.76 at SNR 6, collapse at SNR 3.8 (recorded
    envelope edge, not gated)."""

    @pytest.fixture(scope="class")
    def curve(self, tmp_path_factory):
        tmp = tmp_path_factory.mktemp("snr")
        out = {}
        for ns in (5, 15, 25, 40):
            vol, gold, snr = snr_phantom(ns)
            score, _ = _score(vol, gold, CFG, tmp)
            out[ns] = (snr, score)
        return out

    def test_clean_regime_quality(self, curve):
        for ns in (5, 15):
            snr, s = curve[ns]
            assert s.f1 > 0.85, f"noise={ns} (snr {snr:.0f}): {s}"

    def test_graceful_degradation_no_cliff(self, curve):
        # weakly decreasing within jitter down to SNR 6; precision must
        # not collapse before recall does (spurious structure is worse
        # than missed structure on noisy data)
        f1s = [curve[ns][1].f1 for ns in (5, 15, 25)]
        assert f1s[1] >= f1s[0] - 0.10, f1s
        assert f1s[2] >= 0.55, f"cliff at SNR 6: {f1s}"
        assert curve[25][1].precision > 0.85, curve[25][1]

    def test_envelope_edge_does_not_crash(self, curve):
        # SNR 3.8: below the operating envelope — the pipeline must
        # degrade to few/no traces, never crash or emit garbage.
        # Engine nuance (measured 2026-08-20 via the compiled oracle):
        # the EXACT engine mirrors the reference here — both emit noise
        # fragments (ours 15 seeds / 197 nodes vs the reference's 117
        # seeds / 189 nodes on this phantom) — while TUBE mode (this
        # battery) yields silence: its locally-tube-like assumption
        # rejects pure noise, the better serving behavior and a
        # documented divergence of the approximation.
        _, s = curve[40]
        assert s.precision >= 0.0 and np.isfinite(s.f1)


class TestLowSignalDiagnostic:
    """VERDICT r4 item 7: tube-on-noise silence must carry a structured
    warning (engine, counts, retry-exact hint) in the metrics record —
    an operator getting an empty SWC must see that the ENGINE, not the
    specimen, said no. The exact engine traces the same noise (mirroring
    the reference) and must NOT warn."""

    def test_tube_flags_exact_does_not(self):
        import dataclasses

        from pnr_tpu.pipeline import reconstruction_func
        from pnr_tpu.hostpath import host_reconstruction_func
        from pnr_tpu.utils.exporters import low_signal_diagnostic, metrics_entry

        vol, _gold, snr = snr_phantom(40)  # SNR 3.8: the envelope edge
        assert snr < 4.5

        cfg_tube = dataclasses.replace(CFG, zncc_mode="tube")
        res_tube = reconstruction_func(vol, cfg_tube, verbose=False)
        warn = low_signal_diagnostic(res_tube)
        assert warn is not None, (
            res_tube.n_raw_seeds, len(res_tube.n0), len(res_tube.seeds_pos)
        )
        assert warn["engine"] == "tube"
        assert warn["raw_maxima"] > 0
        assert warn["committed_nodes"] == 0
        assert "exact" in warn["message"]
        entry = metrics_entry("x", res_tube)
        assert entry["low_signal_warning"]["engine"] == "tube"

        # exact mode (host engine — same semantics, native-fast): the
        # engine traces the noise fragments like the reference; no flag
        cfg_exact = dataclasses.replace(CFG, zncc_mode="exact")
        res_exact = host_reconstruction_func(vol, cfg_exact, verbose=False)
        assert low_signal_diagnostic(res_exact) is None, (
            res_exact.n_raw_seeds, len(res_exact.n0)
        )
        assert "low_signal_warning" not in metrics_entry("x", res_exact)


class TestMultiNeuronSoma:
    """Two somas, four neurites, two radii — scored end to end with
    soma extraction ON."""

    @pytest.fixture(scope="class")
    def scored(self, tmp_path_factory):
        import dataclasses

        vol, gold = multi_neuron_soma_phantom()
        cfg = dataclasses.replace(CFG, somaradius=4)
        score, res = _score(vol, gold, cfg, tmp_path_factory.mktemp("swc"))
        return score, res, gold

    def test_both_somas_found(self, scored):
        from pnr_tpu.graph.nodes import SOMA

        _, res, gold = scored
        # extraction-time positions live in n0 (the tree stages refine/
        # interpolate around the soma, legitimately moving its node)
        soma_nodes = [
            (res.n0.x[i], res.n0.y[i])
            for i in range(1, len(res.n0))
            if res.n0.type[i] == SOMA
        ]
        assert len(soma_nodes) == 2, f"somas in n0: {len(soma_nodes)}"
        for sx, sy in ((24, 28), (104, 68)):
            d = min(np.hypot(nx - sx, ny - sy) for nx, ny in soma_nodes)
            assert d < 3.0, f"no soma node near ({sx}, {sy}): {d:.1f}"
        # and the FINAL tree still carries soma-typed nodes near both
        tree_somas = [
            (res.tree.x[i], res.tree.y[i])
            for i in range(1, len(res.tree))
            if res.tree.type[i] == SOMA
        ]
        assert tree_somas, "tree lost all soma-typed nodes"
        for sx, sy in ((24, 28), (104, 68)):
            d = min(np.hypot(nx - sx, ny - sy) for nx, ny in tree_somas)
            assert d < 10.0, f"tree soma drifted from ({sx}, {sy}): {d:.1f}"

    def test_every_neurite_covered(self, scored):
        _, res, gold = scored
        tree_xyz = np.stack(
            [
                np.asarray(res.tree.x[1:]),
                np.asarray(res.tree.y[1:]),
                np.asarray(res.tree.z[1:]),
            ],
            axis=-1,
        )
        neurite = gold[gold[:, 1] == 2]
        roots = np.where(np.diff(neurite[:, 6], prepend=0) != 1)[0]
        for k, beg in enumerate(roots):
            end = roots[k + 1] if k + 1 < len(roots) else len(neurite)
            gp = neurite[beg:end, 2:5]
            d = np.linalg.norm(tree_xyz[:, None, :] - gp[None, :, :], axis=-1)
            covered = (d.min(axis=0) < 4.0).mean()
            assert covered > 0.65, f"neurite {k} coverage {covered:.2f}"

    def test_f1_and_soma_linking(self, scored):
        from pnr_tpu.graph.nodes import SOMA

        score, res, _ = scored
        assert score.recall > 0.75, f"recall too low: {score}"
        assert score.precision > 0.8, f"precision too low: {score}"
        # at least one traced node links to a soma node (the trackPos
        # soma-hit path produced a soma-rooted tree, not a free island)
        soma_ids = {
            i for i in range(1, len(res.tree)) if res.tree.type[i] == SOMA
        }
        linked = any(
            soma_ids.intersection(res.tree.nbr[i])
            for i in range(1, len(res.tree))
            if i not in soma_ids
        )
        assert linked, "no trace linked into a soma"
