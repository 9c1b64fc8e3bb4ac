"""Multi-device reconstruction: the full pipeline over a device mesh.

Same contract as `pnr_tpu.pipeline.reconstruction_func`, with the three
heavy stages sharded over a 1-D Z mesh (SURVEY.md §2b):

* Frangi + J8: halo-exchange stencils, global min/max by mesh reduction
  (`frangi3d_sharded`);
* seed extraction: per-shard MaximumFinder (exact — the tolerance flood
  is per-z-slice) + per-shard ZNCC scoring against halo-padded local
  likelihood fields (`seeds_sharded`, `build_seed_scorer`);
* tracing: shard-local SMC with boundary handoff — the volume never
  replicates (`build_handoff_trace_step`).

Seed ordering, first-come-first-served density suppression, and the
graph post-processing run on the host exactly as in the single-device
pipeline: waves are traced speculatively to full length on the mesh and
committed in global corr order through the same `TraceCommitter`.
Differences from the single-device path are bounded by the ~1e-2 fp
drift of halo-edge convolutions (see tests/test_parallel.py), so SWC
output matches within tolerance, not bitwise.

Limitations (v1): somaradius must be 0 (soma extraction is a host
stage on the full volume — run the single-device path for soma stacks)
and Z must divide by the mesh size (pad upstream otherwise).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import PartitionSpec as P
from jax import shard_map

from pnr_tpu.config import PNRConfig
from pnr_tpu.graph.build import TraceCommitter
from pnr_tpu.graph.nodes import NodeList
from pnr_tpu.parallel.halo import halo_exchange_z
from pnr_tpu.parallel.handoff import build_handoff_trace_step, stitch_estimates
from pnr_tpu.parallel.sharded import (
    frangi3d_sharded,
    normalize_to_u8_sharded,
    seeds_sharded,
    shard_volume,
)
from pnr_tpu.pipeline.reconstruct import ReconstructionResult, reconstruct_graph


def build_seed_scorer(cfg: PNRConfig, mesh):
    """Shard-local znccBBB seed scoring: each shard scores the seeds in
    its slab against its halo-padded likelihood field (exact within the
    halo — identical values to the global field)."""
    from pnr_tpu.smc.tracker import BatchedTracker

    axis = mesh.axis_names[0]
    tracker = BatchedTracker(cfg, is2d=False)
    smax = max(cfg.sigmas)
    halo = int(math.ceil(3.0 * smax)) + int(math.ceil(smax)) + 2

    def local_fn(vol_local, sp, sd):
        idx = lax.axis_index(axis)
        zl = vol_local.shape[0]
        padded = halo_exchange_z(vol_local, halo, axis)
        field = tracker.prepare_field(padded)
        z_off = (idx * zl - halo).astype(jnp.float32)
        sp_local = sp - jnp.stack(
            [jnp.zeros_like(z_off), jnp.zeros_like(z_off), z_off]
        )[None, :]
        corr, sig = tracker._zncc(field, sp_local, sd)
        return corr

    fn = shard_map(
        local_fn, mesh=mesh, in_specs=(P(axis), P(axis), P(axis)), out_specs=P(axis)
    )
    return jax.jit(fn)


def _bucket_by_shard(pos, dirs, ids, z_total, n_shards, lanes):
    """Fixed-lane per-shard buckets preserving the given order inside
    each shard. Returns (pos, dirs, ids, valid) each (n_shards*lanes, ...)."""
    zl = z_total // n_shards
    out_p = np.zeros((n_shards * lanes, 3), np.float32)
    out_d = np.zeros((n_shards * lanes, 3), np.float32)
    out_d[:, 0] = 1.0
    out_i = np.zeros(n_shards * lanes, np.int32)
    valid = np.zeros(n_shards * lanes, bool)
    dropped = 0
    for s in range(n_shards):
        lo = s * zl
        hi = (s + 1) * zl if s < n_shards - 1 else z_total + 1
        m = (pos[:, 2] >= lo) & (pos[:, 2] < hi)
        sel = np.nonzero(m)[0]
        dropped += max(0, len(sel) - lanes)
        sel = sel[:lanes]
        k = len(sel)
        sl = slice(s * lanes, s * lanes + k)
        out_p[sl] = pos[sel]
        out_d[sl] = dirs[sel]
        out_i[sl] = ids[sel]
        valid[sl.start : sl.start + k] = True
    return out_p, out_d, out_i, valid, dropped


def reconstruction_func_sharded(
    vol: np.ndarray,
    cfg: PNRConfig,
    mesh,
    verbose: bool = True,
    key: Optional[jax.Array] = None,
) -> ReconstructionResult:
    """Full reconstruction of a (Z, Y, X) uint8 volume over `mesh`."""
    vol = np.ascontiguousarray(vol, np.uint8)
    n_dev = int(mesh.devices.size)
    if vol.shape[0] % n_dev != 0:
        raise ValueError(
            f"Z={vol.shape[0]} must divide by the mesh size {n_dev} (pad the stack)"
        )
    if cfg.somaradius > 0:
        raise ValueError(
            "sharded pipeline v1 does not run soma extraction; use the "
            "single-device reconstruction_func for soma stacks"
        )
    if key is None:
        key = jax.random.key(cfg.seed)

    from pnr_tpu.pipeline.reconstruct import _StageTimer

    tm = _StageTimer(verbose)
    nodes = NodeList()

    tm.start("frangi (sharded)")
    vs = shard_volume(vol, mesh)
    j, jmin, jmax, vx, vy, vz = frangi3d_sharded(
        vs, cfg.sigmas, cfg.zdist, mesh,
        cfg.frangi_alpha, cfg.frangi_beta, cfg.frangi_c,
    )
    j8 = normalize_to_u8_sharded(j, jmin, jmax)
    j8.block_until_ready()
    tm.stop()

    tm.start("seed extraction (sharded)")
    cap = max(64, vol.shape[1] * vol.shape[2] // 64)
    pos_s, dirs_s, valid_s, found = seeds_sharded(
        j8, vx, vy, vz, cfg.tolerance, mesh, cap
    )
    valid_np = np.asarray(valid_s)
    pos = np.asarray(pos_s)[valid_np]
    dirs = np.asarray(dirs_s)[valid_np]
    n_found = int(np.asarray(found).sum())
    if n_found > len(pos) and verbose:
        print(f"warning: seed cap dropped {n_found - len(pos)} seeds")
    tm.stop()
    if verbose:
        print(f"{len(pos) / 1000.0}k seeds")

    tm.start("seed selection & sorting (sharded)")
    corr = np.zeros(0, np.float32)
    if len(pos):
        # size lanes to the fullest Z-slab (neurites confined to a few
        # slices are common; uniform sizing would silently drop seeds)
        zl = vol.shape[0] // n_dev
        counts = np.bincount(
            np.clip((pos[:, 2] // zl).astype(int), 0, n_dev - 1),
            minlength=n_dev,
        )
        lanes = max(1, int(counts.max()))
        scorer = build_seed_scorer(cfg, mesh)
        bp, bd, bi, bv, dropped = _bucket_by_shard(
            pos, dirs, np.arange(len(pos)), vol.shape[0], n_dev, lanes
        )
        assert dropped == 0
        c = np.asarray(scorer(vs, jnp.asarray(bp), jnp.asarray(bd)))
        corr_all = np.full(len(pos), -np.inf, np.float32)
        corr_all[bi[bv]] = c[bv]
        keep = corr_all >= cfg.znccth
        pos, dirs, corr = pos[keep], dirs[keep], corr_all[keep]
        order = np.argsort(-corr, kind="stable")
        pos, dirs, corr = pos[order], dirs[order], corr[order]
    tm.stop()
    if verbose:
        print(f"{len(pos) / 1000.0}k seeds after selection")

    tm.start("tracing (sharded, handoff)")
    committer = TraceCommitter(vol.shape, cfg.vol, cfg.nodepervol, nodes, None)
    wave = max(1, cfg.wave_size)
    # 2 traces per seed (pos+neg); worst case all in one Z-slab
    lanes = 2 * wave
    step, n_stages, stage_iters = build_handoff_trace_step(
        cfg, mesh, lanes_per_shard=lanes, stage_iters=4
    )
    trace_count = 0
    idx = 0
    nseeds = len(pos)
    while idx < nseeds and trace_count <= cfg.max_trace_count:
        batch = []
        while idx < nseeds and len(batch) < wave:
            if committer.seed_allowed(pos[idx]):
                batch.append(idx)
            idx += 1
        if not batch:
            break
        sel = np.asarray(batch)
        # both directions per seed, reference commit order (pos, neg)
        sp = np.repeat(pos[sel], 2, axis=0)
        sd = np.empty_like(sp)
        sd[0::2] = dirs[sel]
        sd[1::2] = -dirs[sel]
        tids = np.empty(2 * len(sel), np.int64)
        tids[0::2] = 2 * sel
        tids[1::2] = 2 * sel + 1
        bp, bd, bi, bv, dropped = _bucket_by_shard(
            sp, sd, tids, vol.shape[0], n_dev, lanes
        )
        if dropped and verbose:
            print(f"warning: wave lane overflow dropped {dropped} traces")
        packs, sids, live, lost = step(
            vs, bp, bd, bi.astype(np.int32), bv, key
        )
        est, got_ids = stitch_estimates(np.asarray(packs), np.asarray(sids), cfg.ni)
        by_id = {int(t): r for r, t in enumerate(got_ids)}
        # commit in the reference's order: per seed, pos then neg trace
        for si in sel:
            if trace_count > cfg.max_trace_count:
                break
            if not committer.seed_allowed(pos[si]):
                continue
            trace_count += 1
            for d in (0, 1):
                tid = int(2 * si + d)
                if tid not in by_id:
                    continue
                e = est[by_id[tid]]
                cur = committer.begin_trace()
                committer.commit_steps(
                    cur, e[:, 0:3], e[:, 3:6], e[:, 6], e[:, 7], e[:, 8], cfg.ni
                )
                committer.finish_trace(cur)
    tm.stop()
    if verbose:
        print(f"traced {trace_count} seeds, |n0|={len(nodes)}")

    n0 = nodes
    tm.start("reconstruct")
    tree = reconstruct_graph(n0.copy(), cfg)
    tm.stop()

    return ReconstructionResult(
        tree=tree,
        n0=n0,
        seeds_pos=pos,
        seeds_corr=corr,
        trace_count=trace_count,
        timings=tm.timings,
        j8=np.asarray(j8),
    )
