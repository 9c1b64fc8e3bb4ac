"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from pnr_tpu.config import PNRConfig
from pnr_tpu.ops import frangi3d, normalize_to_u8
from pnr_tpu.parallel import (
    build_sharded_step,
    frangi3d_sharded,
    halo_exchange_z,
    make_mesh,
    normalize_to_u8_sharded,
    shard_volume,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    return make_mesh(8)


def make_vol(shape=(32, 24, 40), seed=0):
    rng = np.random.default_rng(seed)
    z, y, x = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    d2 = (y - 12) ** 2 + ((z - 16) * 2.0) ** 2
    # modulate along the tube: a constant ridge floods to the image
    # border and MaximumFinder (correctly) rejects it -> zero seeds
    vol = 180.0 * np.exp(-d2 / (2 * 2.5**2)) * (0.75 + 0.25 * np.sin(x / 4.0))
    vol = vol + rng.normal(0, 5, shape)
    return np.clip(vol, 0, 255).astype(np.uint8)


class TestHaloExchange:
    def test_matches_edge_padding(self, mesh):
        vol = make_vol()
        halo = 3

        fn = shard_map(
            lambda v: halo_exchange_z(v, halo, "z"),
            mesh=mesh,
            in_specs=P("z"),
            out_specs=P("z"),
        )
        padded_sharded = np.asarray(fn(shard_volume(vol, mesh)))
        # per-shard padded blocks concatenate to (Z + n*2h); verify each
        # shard's padded block equals the globally edge-padded slice
        n = 8
        zl = vol.shape[0] // n
        global_pad = np.pad(vol, ((halo, halo), (0, 0), (0, 0)), mode="edge")
        blocks = padded_sharded.reshape(n, zl + 2 * halo, *vol.shape[1:])
        for r in range(n):
            want = global_pad[r * zl : r * zl + zl + 2 * halo]
            np.testing.assert_array_equal(blocks[r], want)


class TestShardedFrangi:
    def test_matches_single_device(self, mesh):
        vol = make_vol()
        sigmas = (2.0, 3.0)
        j_ref, jmin_ref, jmax_ref, vx_ref, vy_ref, vz_ref = frangi3d(
            jnp.asarray(vol), sigmas, 2.0
        )
        j8_ref = np.asarray(normalize_to_u8(j_ref, jmin_ref, jmax_ref))

        vs = shard_volume(vol, mesh)
        j, jmin, jmax, vx, vy, vz = frangi3d_sharded(vs, sigmas, 2.0, mesh)
        j8 = np.asarray(normalize_to_u8_sharded(j, jmin, jmax))

        np.testing.assert_allclose(np.asarray(j), np.asarray(j_ref), atol=1e-5)
        np.testing.assert_allclose(float(jmax), float(jmax_ref), rtol=1e-6)
        # uint8 quantization may flip on exact .5 boundaries; allow 1 LSB
        diff = np.abs(j8.astype(int) - j8_ref.astype(int))
        assert diff.max() <= 1
        assert (diff > 0).mean() < 1e-3
        # Directions are only meaningful where the response is nonzero
        # (at J==0 the Hessian eigenvector is numerical noise and never
        # consumed — seeds decode directions at J8 maxima only).
        m = j8_ref > 0
        np.testing.assert_array_equal(np.asarray(vx)[m], np.asarray(vx_ref)[m])
        np.testing.assert_array_equal(np.asarray(vy)[m], np.asarray(vy_ref)[m])
        np.testing.assert_array_equal(np.asarray(vz)[m], np.asarray(vz_ref)[m])


class TestShardedStep:
    def test_full_step_compiles_and_runs(self, mesh):
        cfg = PNRConfig(
            sigmas=(2.0,), znccth=0.3, kappa=2.0, step=2, ni=6, np=8,
            zdist=2.0, nodepervol=4, vol=9, wave_size=8,
        )
        step = build_sharded_step(cfg, mesh, wave=8)
        vol = make_vol()
        out = step(shard_volume(vol, mesh), jax.random.key(0))
        assert out["j8"].shape == vol.shape
        assert out["seed_pos"].shape == (8, 3)
        assert out["est_packs"].shape[1] % 8 == 0
        assert np.asarray(out["trace_valid"]).dtype == bool
        # shards containing the tube find REAL MaximumFinder seeds on
        # it; empty shards report valid=False (no arbitrary voxels)
        sp = np.asarray(out["seed_pos"])
        sv = np.asarray(out["seed_valid"])
        assert sv.any()
        on_tube = np.abs(sp[sv][:, 1] - 12) < 4
        assert on_tube.mean() > 0.5


class TestShardedSeeds:
    def test_matches_single_device_extraction(self, mesh):
        """Per-shard MaximumFinder == unsharded (the flood is per-slice)."""
        from pnr_tpu.parallel.sharded import seeds_sharded
        from pnr_tpu.seeds.extract import extract_seeds

        vol = make_vol()
        j, jmin, jmax, vx, vy, vz = frangi3d(jnp.asarray(vol), (2.0,), 2.0)
        j8 = normalize_to_u8(j, jmin, jmax)
        ref_pos, ref_dirs = extract_seeds(
            np.asarray(j8), np.asarray(vx), np.asarray(vy), np.asarray(vz),
            10.0, use_device=True,
        )

        sharding = jax.NamedSharding(mesh, P("z"))
        cap = 64
        pos, dirs, valid, found = seeds_sharded(
            jax.device_put(j8, sharding),
            jax.device_put(vx, sharding),
            jax.device_put(vy, sharding),
            jax.device_put(vz, sharding),
            10.0, mesh, cap,
        )
        pos = np.asarray(pos)[np.asarray(valid)]
        assert int(np.asarray(found).sum()) == len(ref_pos)
        got = {tuple(p) for p in pos.astype(int)}
        want = {tuple(p) for p in ref_pos.astype(int)}
        assert got == want


class TestHandoffTracing:
    def test_z_spanning_trace_matches_single_device(self, mesh):
        """A trace seeded in one shard crosses shard boundaries via
        carry handoff and reproduces the single-device estimates
        (VERDICT r1 item 4: no more truncation at the halo)."""
        from pnr_tpu.parallel.handoff import (
            build_handoff_trace_step,
            stitch_estimates,
        )
        from pnr_tpu.smc.tracker import BatchedTracker

        rng = np.random.default_rng(9)
        shape = (32, 24, 64)  # 8 shards x 4 slices
        z, y, x = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
        d2 = (y - 12) ** 2 + (x - 32) ** 2
        vol = np.clip(
            200.0 * np.exp(-d2 / (2 * 2.5**2)) * (0.75 + 0.25 * np.sin(z / 3.0))
            + rng.normal(0, 4, shape),
            0, 255,
        ).astype(np.uint8)

        cfg = PNRConfig(
            sigmas=(2.0,), znccth=0.3, kappa=2.0, step=2, ni=16, np=8,
            zdist=1.0, nodepervol=4, vol=9, zncc_mode="tube",
        )
        lanes = 4
        step, n_stages, stage_iters = build_handoff_trace_step(
            cfg, mesh, lanes_per_shard=lanes, stage_iters=2
        )

        # one seed in shard 0, headed +z across every shard boundary
        seeds = np.zeros((8 * lanes, 3), np.float32)
        dirs = np.zeros((8 * lanes, 3), np.float32)
        ids = np.arange(8 * lanes, dtype=np.int32)
        valid = np.zeros(8 * lanes, bool)
        seeds[0] = (32.0, 12.0, 2.0)
        dirs[0] = (0.0, 0.0, 1.0)
        valid[0] = True

        key = jax.random.key(0)
        packs, sids, live, lost = step(
            shard_volume(vol, mesh), seeds, dirs, ids, valid, key
        )
        assert int(np.asarray(lost).sum()) == 0
        est, tids = stitch_estimates(np.asarray(packs), np.asarray(sids), cfg.ni)
        assert 0 in tids
        e = est[list(tids).index(0)]  # (ni, 9)

        # single-device reference with the SAME per-trace key
        tracker = BatchedTracker(cfg, is2d=False)
        field = tracker.prepare_field(jnp.asarray(vol))
        res = tracker.trace_wave(
            field,
            seeds[:1], dirs[:1], key, ids[:1].astype(np.int64), staged=False,
        )
        ref_valid = res.valid[0]
        got_valid = e[:, 8] > 0.5
        # the trace crosses multiple shards: it must stay valid well past
        # the first boundary (z=4) — i.e., no halo truncation
        assert got_valid.sum() >= 10
        ref_z = res.pos[0][ref_valid, 2]
        assert ref_z.max() > 8, "reference trace should cross shard boundaries"
        np.testing.assert_array_equal(got_valid, ref_valid)
        # tiny fp differences: the padded slab's conv borders clamp at
        # the halo edge instead of the volume edge, and SMC resampling
        # amplifies ulps over iterations — observed max 2e-3
        np.testing.assert_allclose(
            e[got_valid, 0:3], res.pos[0][ref_valid], atol=1e-2
        )
        np.testing.assert_allclose(
            e[got_valid, 7], res.corr[0][ref_valid], atol=1e-2
        )


class TestShardLocalTracing:
    def test_local_traces_follow_tube_in_global_coords(self, mesh):
        from pnr_tpu.parallel.sharded import assign_seeds_to_shards, build_local_trace_step

        rng = np.random.default_rng(9)
        shape = (32, 24, 64)  # 8 shards x 4 slices
        z, y, x = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
        # vertical tube along Z so traces cross shard boundaries
        d2 = (y - 12) ** 2 + (x - 32) ** 2
        vol = np.clip(
            200.0 * np.exp(-d2 / (2 * 2.5**2)) * (0.75 + 0.25 * np.sin(z / 3.0))
            + rng.normal(0, 4, shape),
            0, 255,
        ).astype(np.uint8)

        cfg = PNRConfig(
            sigmas=(2.0,), znccth=0.3, kappa=2.0, step=2, ni=12, np=8,
            zdist=1.0, nodepervol=4, vol=9, zncc_mode="tube",
        )
        step = build_local_trace_step(cfg, mesh, seeds_per_shard=2, trace_halo=6)

        # seeds on the tube axis in several shards, pointing +z
        seeds = np.array(
            [[32.0, 12.0, zz] for zz in (2, 6, 10, 14, 18, 22, 26, 29)], np.float32
        )
        dirs = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (len(seeds), 1))
        sp, sd, valid = assign_seeds_to_shards(seeds, dirs, shape[0], 8, 2)

        out = np.asarray(step(shard_volume(vol, mesh), sp, sd, jax.random.key(0)))
        assert out.shape == (16, 12, 9)
        # for real seeds: iteration-0 estimates valid and ON the tube, in
        # GLOBAL coordinates (x~32, y~12, z near the seed)
        got_valid = out[:, 0, 8] > 0.5
        assert got_valid[valid].mean() > 0.8
        for k in np.nonzero(valid)[0]:
            if got_valid[k]:
                assert abs(out[k, 0, 0] - 32) < 3
                assert abs(out[k, 0, 1] - 12) < 3
                assert abs(out[k, 0, 2] - sp[k, 2]) < 4
        # traces advance along +z (global), until the halo cuts them
        k = np.nonzero(valid)[0][0]
        zs = out[k, :, 2][out[k, :, 8] > 0.5]
        if len(zs) > 3:
            assert zs[-1] > zs[0]


class TestDriverDryrun:
    """The driver's multi-chip gate: `dryrun_multichip` must succeed even
    when called from a process already bound to a different (or broken)
    jax backend — it re-execs itself on a forced virtual CPU mesh."""

    def test_dryrun_multichip_is_self_contained(self):
        import sys

        sys.path.insert(0, "/root/repo")
        try:
            import __graft_entry__ as g

            g.dryrun_multichip(8)  # raises on failure
        finally:
            sys.path.remove("/root/repo")

    def test_make_mesh_rejects_oversubscription(self):
        import jax
        import pytest

        from pnr_tpu.parallel import make_mesh

        with pytest.raises(ValueError, match="make_mesh"):
            make_mesh(len(jax.devices()) + 1)


class TestShardedReconstruction:
    def test_matches_single_device_swc(self, mesh):
        """Full multi-device reconstruction (sharded Frangi + sharded
        seeds + handoff tracing + host graph) vs the single-device
        pipeline on the same phantom (VERDICT r1 item 5)."""
        from pnr_tpu.io.swc import save_nodelist, read_swc
        from pnr_tpu.pipeline import reconstruction_func
        from pnr_tpu.pipeline.sharded_reconstruct import reconstruction_func_sharded
        from pnr_tpu.utils.swc_compare import compare_swc

        rng = np.random.default_rng(11)
        shape = (16, 40, 80)  # 8 shards x 2 slices
        z, y, x = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
        d2 = (y - 20) ** 2 + ((z - 8) * 2.0) ** 2
        vol = np.clip(
            200.0 * np.exp(-d2 / (2 * 2.5**2))
            * (0.7 + 0.3 * np.sin(x / 4.0)) * (x > 6) * (x < 73)
            + rng.normal(0, 5, shape),
            0, 255,
        ).astype(np.uint8)

        cfg = PNRConfig(
            sigmas=(2.0, 3.0), tolerance=10.0, znccth=0.5, kappa=2.0, step=2,
            ni=40, np=16, zdist=2.0, nodepervol=4, vol=9, wave_size=16,
            zncc_mode="tube",
        )
        ref = reconstruction_func(vol, cfg, verbose=False)
        got = reconstruction_func_sharded(vol, cfg, mesh, verbose=False)

        assert len(got.tree) > 10
        import tempfile

        pa = tempfile.mktemp(suffix=".swc")
        pb = tempfile.mktemp(suffix=".swc")
        save_nodelist(ref.tree, pa)
        save_nodelist(got.tree, pb)
        s = compare_swc(read_swc(pb), read_swc(pa), dist=3.0, resample=1.0)
        assert s.f1 > 0.85, f"sharded vs single-device SWC mismatch: {s}"

    def test_rejects_unsupported_configs(self, mesh):
        from pnr_tpu.pipeline.sharded_reconstruct import reconstruction_func_sharded

        cfg = PNRConfig(
            sigmas=(2.0,), znccth=0.5, kappa=2.0, step=2, ni=10, np=8,
            zdist=2.0, nodepervol=4, vol=9,
        )
        with pytest.raises(ValueError, match="divide"):
            reconstruction_func_sharded(
                np.zeros((17, 16, 16), np.uint8), cfg, mesh, verbose=False
            )
        import dataclasses

        cfg2 = dataclasses.replace(cfg, somaradius=4)
        with pytest.raises(ValueError, match="soma"):
            reconstruction_func_sharded(
                np.zeros((16, 16, 16), np.uint8), cfg2, mesh, verbose=False
            )

    def test_lane_overflow_counts_lost_traces(self, mesh):
        """With zero free lanes on the receiving shard, a migrating
        trace drops and the per-shard lost counter reports exactly it."""
        from pnr_tpu.parallel.handoff import build_handoff_trace_step

        rng = np.random.default_rng(9)
        shape = (32, 24, 64)
        z, y, x = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
        d2 = (y - 12) ** 2 + (x - 32) ** 2
        vol = np.clip(
            200.0 * np.exp(-d2 / (2 * 2.5**2)) * (0.75 + 0.25 * np.sin(z / 3.0))
            + rng.normal(0, 4, shape),
            0, 255,
        ).astype(np.uint8)
        cfg = PNRConfig(
            sigmas=(2.0,), znccth=0.3, kappa=2.0, step=2, ni=16, np=8,
            zdist=1.0, nodepervol=4, vol=9, zncc_mode="tube",
        )
        step, _, _ = build_handoff_trace_step(
            cfg, mesh, lanes_per_shard=1, stage_iters=2
        )
        # every shard's single lane is occupied by a +z-moving trace:
        # each migration lands on a full shard and must drop
        seeds = np.array([[32.0, 12.0, 4.0 * s + 1.0] for s in range(8)], np.float32)
        dirs = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (8, 1))
        ids = np.arange(8, dtype=np.int32)
        valid = np.ones(8, bool)
        packs, sids, live, lost = step(
            shard_volume(vol, mesh), seeds, dirs, ids, valid, jax.random.key(0)
        )
        lost_total = int(np.asarray(lost).sum())
        # traces DO cross boundaries on this tube; each crossing into an
        # occupied shard is dropped and counted ONCE (the counter used to
        # be inflated by the lane count)
        assert np.asarray(lost).shape == (8,)
        assert 0 < lost_total <= 8
