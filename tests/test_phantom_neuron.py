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
        parent = i - 1 if i > 1 else -1
        gold.append([i, 2, px, py, pz, radius, parent])
    return vol, np.asarray(gold, np.float64)


CFG = PNRConfig(
    sigmas=(2.0, 3.0), tolerance=10.0, znccth=0.5, kappa=2.0, step=2, ni=60,
    np=16, zdist=2.0, nodepervol=4, vol=9, wave_size=32, zncc_mode="tube",
)


class TestBranchingNeuron:
    @pytest.fixture(scope="class")
    def scored(self, tmp_path_factory):
        vol, gold = branching_neuron_phantom()
        res = reconstruction_func(vol, CFG, verbose=False)
        p = str(tmp_path_factory.mktemp("swc") / "rec.swc")
        save_nodelist(res.tree, p)
        rec = read_swc(p)
        return compare_swc(rec, gold, dist=4.0), res, gold

    def test_recall_covers_all_branches(self, scored):
        score, res, gold = scored
        assert score.recall > 0.5, f"recall too low: {score}"
        # every structural segment is reached: check coverage per branch
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
            assert covered > 0.5, f"{name} coverage {covered:.2f}"

    def test_precision_reasonable(self, scored):
        score, _, _ = scored
        assert score.precision > 0.5, f"precision too low: {score}"

    def test_no_spurious_far_nodes(self, scored):
        _, res, gold = scored
        tree_xyz = np.stack(
            [np.asarray(res.tree.x[1:]), np.asarray(res.tree.y[1:]), np.asarray(res.tree.z[1:])],
            axis=-1,
        )
        gp = gold[:, 2:5]
        d = np.linalg.norm(tree_xyz[:, None, :] - gp[None, :, :], axis=-1).min(axis=1)
        assert (d > 8.0).mean() < 0.1, "too many nodes far from the gold structure"
