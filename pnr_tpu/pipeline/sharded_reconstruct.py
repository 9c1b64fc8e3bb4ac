"""Multi-device reconstruction: the full pipeline over a device mesh.

Same contract as `pnr_tpu.pipeline.reconstruction_func`, with the heavy
stages sharded over a 1-D mesh (SURVEY.md §2b) — Z-slabs for 3-D
volumes, Y-slabs (via an internal transposed (Y, 1, X) layout) for the
reference's first-class 2-D path (P == 1, Advantra_plugin.cpp:2339):

* soma extraction: per-slice erode + xy-Gaussian shard trivially over Z
  (no halo — both stencils are xy-only, frangi.cpp:879/786); the
  max-entropy threshold reduces a global 256-bin histogram over the
  mesh; the 3-D connected components run on the gathered binary mask on
  host (tiny, one uint8 volume fetch) — bit-identical to single-device;
* Frangi + J8: halo-exchange stencils, global min/max by mesh reduction
  (`frangi3d_sharded`);
* seed extraction: slab-local exact MaximumFinder flood (the tolerance
  flood is per-z-slice, so each process floods only its own slabs —
  `_seeds_per_shard_multiprocess`) + per-shard ZNCC scoring against
  halo-padded local likelihood fields (`build_seed_scorer`);
* tracing: shard-local SMC with boundary handoff — the volume never
  replicates (`build_handoff_tracer`), run STAGED with the same
  in-order commit wavefront + kill-back as the single-device path, so
  suppressed/stopped traces cost no further device compute and the
  mutable-map semantics stay first-come-first-served.

Arbitrary Z is supported by replicate-padding the top slice up to the
mesh multiple: with the reference's clamped-border stencils, replicated
slices reproduce the border values exactly, so results in the original
region are unchanged; seeds in the padding are discarded and the
tracer's global stop bound stays the ORIGINAL Z.

Lane overflow never loses traces: seeds that do not fit a wave's
per-shard lanes are re-queued into the next wave (ordering divergence
from the strict global corr order, counted and reported), and in-flight
migration overflow keeps traces on their shard (parallel/handoff.py).
Checkpoint/resume snapshots the commit state between waves exactly like
the single-device loop.

MULTI-HOST: the driver also runs over a mesh spanning several
`jax.distributed` processes (parallel/multihost.py) — the
redundant-host-driver design: every process executes the same
deterministic host logic (seed order, FCFS commit, graph stages), all
device stages take same-value host inputs (auto-sharded) or global
arrays, and `fetch_replicated` all-gathers the few sharded stage
outputs the host consumes. Certified on a real 2-process cluster:
identical J8/types/counts, ulp-tolerance coordinates vs single-process
(tests/test_multiprocess.py).
"""

from __future__ import annotations

import math
import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import PartitionSpec as P
from jax import shard_map

from pnr_tpu.config import PNRConfig
from pnr_tpu.io.volume import as_u8_volume
from pnr_tpu.graph.build import TraceCommitter
from pnr_tpu.graph.nodes import SOMA, NodeList
from pnr_tpu.parallel.halo import halo_exchange_z
from pnr_tpu.parallel.handoff import build_handoff_tracer
from pnr_tpu.parallel.multihost import fetch_replicated
from pnr_tpu.parallel.sharded import (
    frangi2d_sharded,
    frangi3d_sharded,
    normalize_to_u8_sharded,
    shard_volume,
)
from pnr_tpu.pipeline.reconstruct import ReconstructionResult, reconstruct_graph

import functools


# Per-call construction of the sharded stage callables re-traces their
# (large) graphs every run: measured 22 s/run re-trace+dispatch for the
# 3-sigma Frangi graph alone at 52 Mvox (PARITY.md round 3). Cache the
# jitted callables across reconstruction_func_sharded calls, keyed by
# everything that shapes the graph (Mesh and the frozen PNRConfig are
# both hashable) — the sharded analog of reconstruction_batch's shared
# BatchedTracker.
@functools.lru_cache(maxsize=16)
def _jit_frangi3d_sharded(mesh, sigmas, zdist, alpha, beta, c):
    return jax.jit(
        lambda v: frangi3d_sharded(v, sigmas, zdist, mesh, alpha, beta, c)
    )


@functools.lru_cache(maxsize=16)
def _jit_frangi2d_sharded(mesh, sigmas, beta_one, beta_two):
    return jax.jit(
        lambda v: frangi2d_sharded(v, sigmas, mesh, beta_one, beta_two)
    )


@functools.lru_cache(maxsize=16)
def _seed_scorer_cached(cfg, mesh, is2d):
    return build_seed_scorer(cfg, mesh, is2d=is2d)


@functools.lru_cache(maxsize=8)
def _handoff_tracer_cached(cfg, mesh, lanes, stage_iters, z_total, is2d):
    return build_handoff_tracer(
        cfg, mesh, lanes_per_shard=lanes, stage_iters=stage_iters,
        z_total=z_total, is2d=is2d,
    )


def _host_flood(j8_np: np.ndarray, tolerance) -> np.ndarray:
    """Exact MaximumFinder tolerance flood on a host copy of J8 —
    native C++ when built, device label propagation otherwise."""
    from pnr_tpu import native
    from pnr_tpu.seeds.extract import max_points_device, max_points_host

    if native.have_native():
        return max_points_host(j8_np, float(tolerance))
    return np.asarray(max_points_device(jnp.asarray(j8_np), float(tolerance)))


def _decode_seed_dirs(vx, vy, vz, pos: np.ndarray):
    """Seed-direction decode at `pos` on the (possibly sharded)
    quantized direction maps. Multi-process runs gather each map to a
    process-local replicated copy first (one at a time; each device
    holds one transient full map) so the gather is process-local."""
    from pnr_tpu.seeds.extract import decode_directions_device

    if jax.process_count() > 1:
        vx, vy, vz = (jnp.asarray(fetch_replicated(a)) for a in (vx, vy, vz))
    return decode_directions_device(vx, vy, vz, pos)


def _seeds_per_shard_multiprocess(j8, vx, vy, vz, tolerance, span_orig):
    """Slab-local exact seed extraction for multi-process meshes
    (VERDICT r3 item 2): the reference's tolerance flood is strictly
    per z-slice (seed.cpp:574-791 — MaximumFinder runs on each slice
    independently, with the edge-touch rejection against the slice's
    own x/y borders), and Z-sharded slabs hold WHOLE slices, so each
    process floods only the slabs its devices own with the exact native
    MaximumFinder. No process ever materializes the full J8 or any
    direction map, there is no volume-size cliff, and the flood is
    embarrassingly parallel across hosts. Directions decode against the
    LOCAL map shards (the decode reads only the seed's own voxel).

    The tiny per-process (x, y, z, dir) row lists are all-gathered and
    lex-sorted by (z, y, x) — exactly `np.nonzero`'s order on the full
    volume — so every process ends with the identical global seed list
    in single-device order (redundant-host-driver invariant)."""
    from pnr_tpu.parallel.multihost import allgather_host_rows
    from pnr_tpu.seeds.extract import decode_directions_device

    def by_z0(arr):
        d = {}
        for s in arr.addressable_shards:
            z0 = s.index[0].start or 0
            # A replicated mesh axis would surface the same slab more
            # than once per process — flooding it twice would emit
            # duplicate seeds into the all-gather. Unchecked invariant
            # of the 1-D Z mesh; make it loud.
            if z0 in d:
                raise AssertionError(
                    f"duplicate addressable shard at z0={z0}: the seed "
                    "flood requires an unreplicated Z sharding"
                )
            d[z0] = s
        return d

    vx_sh, vy_sh, vz_sh = by_z0(vx), by_z0(vy), by_z0(vz)
    j8_sh = by_z0(j8)
    if not (set(j8_sh) == set(vx_sh) == set(vy_sh) == set(vz_sh)):
        raise AssertionError(
            "J8 and the direction maps are sharded at different "
            f"z-starts: j8={sorted(j8_sh)} vx={sorted(vx_sh)} "
            f"vy={sorted(vy_sh)} vz={sorted(vz_sh)}"
        )
    rows = []
    for sh in j8.addressable_shards:
        z0 = sh.index[0].start or 0
        slab = np.asarray(sh.data)
        zmax = min(slab.shape[0], span_orig - z0)
        if zmax <= 0:
            continue  # shard lies fully in the replicate Z padding
        zz, yy, xx = np.nonzero(_host_flood(slab[:zmax], tolerance))
        if not len(zz):
            continue
        pos_local = np.stack([xx, yy, zz], axis=-1).astype(np.float32)
        d = decode_directions_device(
            np.asarray(vx_sh[z0].data),
            np.asarray(vy_sh[z0].data),
            np.asarray(vz_sh[z0].data),
            pos_local,
        )
        pos_local[:, 2] += z0
        rows.append(np.concatenate([pos_local, d], axis=1))
    local = (
        np.concatenate(rows, axis=0)
        if rows
        else np.zeros((0, 6), np.float32)
    )
    allrows = allgather_host_rows(local)
    order = np.lexsort((allrows[:, 0], allrows[:, 1], allrows[:, 2]))
    allrows = allrows[order]
    return allrows[:, :3].copy(), allrows[:, 3:].copy()


def _pad_axis_replicate(vol: np.ndarray, n_dev: int, axis: int = 0) -> np.ndarray:
    """Pad an axis to a mesh multiple by replicating the last slice —
    exact for clamped-border stencils (the beyond-edge taps read the
    edge slice either way)."""
    n = vol.shape[axis]
    npad = -(-n // n_dev) * n_dev - n
    if npad == 0:
        return vol
    pad = np.repeat(np.take(vol, [-1], axis=axis), npad, axis=axis)
    return np.concatenate([vol, pad], axis=axis)


def _pad_z_replicate(vol: np.ndarray, n_dev: int) -> np.ndarray:
    return _pad_axis_replicate(vol, n_dev, axis=0)


def soma_extraction_sharded(
    vs, vol_shape, cfg: PNRConfig, nodes: NodeList, mesh, verbose=False,
    is2d: bool = False,
):
    """Sharded soma extraction (Advantra_plugin.cpp:2426-2481): xy erode
    + xy Gaussian stencils over the mesh, global max-entropy threshold
    via a psum'd histogram, host 3-D CC on the gathered binary mask.
    Returns the int32 smap with `vol_shape` (original extents).

    3-D: Z-sharded slabs — both stencils are xy-only (frangi.cpp:879,
    786), so no halo is needed. 2-D (`is2d`): `vs` holds the transposed
    (Y, 1, X) representation sharded over Y; the stencils reach
    ceil(r) + ceil(3r) rows, exchanged as a Y halo. Replicate-padded
    rows/slices (arbitrary extents) are masked out of the histogram so
    the threshold is exactly the single-device one.
    """
    from pnr_tpu.ops.morphology import imerode_xy
    from pnr_tpu.ops.gaussian import imgaussian_xy
    from pnr_tpu.ops.thresholds import maxentropy_th
    from pnr_tpu import native

    axis = mesh.axis_names[0]
    r = float(cfg.somaradius)
    span_orig = vol_shape[1] if is2d else vol_shape[0]
    halo = (int(math.ceil(r)) + int(math.ceil(3.0 * r))) if is2d else 0

    def local_fn(v):
        if is2d:
            padded = halo_exchange_z(v, halo, axis)  # (Yl + 2h, 1, X)
            img = jnp.transpose(padded, (1, 0, 2))  # (1, Yp, X)
            e8 = imgaussian_xy(imerode_xy(img, r), r)
            e8 = jnp.transpose(e8[:, halo:-halo], (1, 0, 2))  # (Yl, 1, X)
        else:
            e8 = imgaussian_xy(imerode_xy(v, r), r)
        # exact global histogram: replicate-padded slices contribute 0
        sl = v.shape[0]
        g = lax.axis_index(axis) * sl + jnp.arange(sl)
        w = (g < span_orig).astype(jnp.int32)
        wmask = jnp.broadcast_to(w[:, None, None], e8.shape).reshape(-1)
        hist = jnp.zeros((256,), jnp.int32).at[
            e8.reshape(-1).astype(jnp.int32)
        ].add(wmask)
        return e8, lax.psum(hist, axis)

    fn = shard_map(local_fn, mesh=mesh, in_specs=P(axis), out_specs=(P(axis), P()))
    e8_s, hist = jax.jit(fn)(vs)
    th = maxentropy_th(np.asarray(hist))
    e8_np = fetch_replicated(e8_s)
    if is2d:  # back to (1, Y, X), drop Y padding
        e8_np = e8_np.transpose(1, 0, 2)[:, :span_orig]
    else:
        e8_np = e8_np[:span_orig]  # drop Z padding
    e8bin = np.where(e8_np > th, 255, 0).astype(np.uint8)
    labels, regions = native.conn3d(e8bin, value_over=0, min_size=1, diagonal=True)
    base = len(nodes) - 1
    for rg in range(len(regions)):
        nodes.add(
            regions[rg, 0], regions[rg, 1], regions[rg, 2],
            sig=regions[rg, 3], ntype=SOMA,
        )
    return np.where(labels > 0, labels + base, 0).astype(np.int32)


def build_seed_scorer(cfg: PNRConfig, mesh, is2d: bool = False):
    """Shard-local znccBBB seed scoring: each shard scores the seeds in
    its slab against its halo-padded likelihood field (exact within the
    halo — identical values to the global field). With `is2d`, the
    volume is the transposed (Y, 1, X) representation sharded over Y
    and seeds bucket by their y coordinate."""
    from pnr_tpu.smc.tracker import BatchedTracker

    axis = mesh.axis_names[0]
    # patch_reuse widens the per-trace extraction windows beyond what
    # required_trace_halo budgets for, and reuse groups align to stage
    # launches (different staging here vs single-device) — force the
    # strict per-iteration extraction so the bitwise single-device
    # guarantee holds. The knob is a measured no-win on v5e anyway
    # (config.py).
    if getattr(cfg, "patch_reuse", 1) != 1:
        import dataclasses

        cfg = dataclasses.replace(cfg, patch_reuse=1)
    tracker = BatchedTracker(cfg, is2d=is2d)
    ci = 1 if is2d else 2
    smax = max(cfg.sigmas)
    halo = int(math.ceil(3.0 * smax)) + int(math.ceil(smax)) + 2

    def local_fn(vol_local, sp, sd):
        idx = lax.axis_index(axis)
        zl = vol_local.shape[0]
        padded = halo_exchange_z(vol_local, halo, axis)
        if is2d:
            padded = jnp.transpose(padded, (1, 0, 2))
        field = tracker.prepare_field(padded)
        z_off = (idx * zl - halo).astype(jnp.float32)
        sp_local = sp - jnp.zeros((3,), jnp.float32).at[ci].set(z_off)[None, :]
        if tracker._patch_engine is not None:
            corr, _ = tracker._patch_engine.eval_fused(
                field, sp_local[:, None, :], sd[:, None, :]
            )
            return corr[:, 0]
        corr, sig = tracker._zncc(field, sp_local, sd)
        return corr

    fn = shard_map(
        local_fn, mesh=mesh, in_specs=(P(axis), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,  # tube-map / exact Pallas kernels inside
    )
    return jax.jit(fn)


def _bucket_by_shard(pos, dirs, ids, z_padded, n_shards, lanes, ci=2):
    """Fixed-lane per-shard buckets preserving the given order inside
    each shard (`ci` selects the sharded coordinate: z for 3-D, y for
    2-D). Returns (pos, dirs, ids, valid, dropped_ids) — overflow
    entries are RETURNED (for re-queueing), never silently lost."""
    zl = z_padded // n_shards
    out_p = np.zeros((n_shards * lanes, 3), np.float32)
    out_d = np.zeros((n_shards * lanes, 3), np.float32)
    out_d[:, 0] = 1.0
    out_i = np.zeros(n_shards * lanes, np.int64)
    valid = np.zeros(n_shards * lanes, bool)
    dropped: List[int] = []
    for s in range(n_shards):
        lo = s * zl
        hi = (s + 1) * zl if s < n_shards - 1 else z_padded + 1
        m = (pos[:, ci] >= lo) & (pos[:, ci] < hi)
        sel = np.nonzero(m)[0]
        dropped.extend(ids[sel[lanes:]].tolist())
        sel = sel[:lanes]
        k = len(sel)
        sl = slice(s * lanes, s * lanes + k)
        out_p[sl] = pos[sel]
        out_d[sl] = dirs[sel]
        out_i[sl] = ids[sel]
        valid[sl.start : sl.start + k] = True
    return out_p, out_d, out_i, valid, dropped


def _score_seeds_sharded(scorer, vs, pos, dirs, z_padded, n_dev, verbose, ci=2):
    """Score all seeds through the per-shard scorer, looping buckets so
    a crowded slab degrades to extra passes instead of aborting."""
    n = len(pos)
    corr = np.full(n, -np.inf, np.float32)
    todo = np.arange(n)
    zl = z_padded // n_dev
    while len(todo):
        counts = np.bincount(
            np.clip((pos[todo, ci] // zl).astype(int), 0, n_dev - 1),
            minlength=n_dev,
        )
        lanes = max(1, int(counts.max()))
        bp, bd, bi, bv, dropped = _bucket_by_shard(
            pos[todo], dirs[todo], todo, z_padded, n_dev, lanes, ci
        )
        # host arrays go in raw: jit auto-shards same-value host inputs,
        # which also works across processes (committed local jnp arrays
        # would not)
        c = fetch_replicated(scorer(vs, bp, bd))
        corr[bi[bv]] = c[bv]
        todo = np.asarray(dropped, np.int64)
        if len(todo) and verbose:
            print(f"seed scorer: extra pass for {len(todo)} seeds")
    return corr


def reconstruction_func_sharded(
    vol: np.ndarray,
    cfg: PNRConfig,
    mesh,
    verbose: bool = True,
    key: Optional[jax.Array] = None,
    checkpoint_path: Optional[str] = None,
    checkpoint_every_waves: int = 1,
    resume: bool = False,
    _lanes_override: Optional[int] = None,  # tests: force lane overflow
    stage_iters: int = 8,  # SMC iterations per device stage launch;
    # measured on v5e at 52 Mvox (171 seeds, wave 128): 4 -> 17.6 s,
    # 8 -> 13.4 s (same tree), 16 -> 10.7 s (tree differs by ~1% —
    # the handoff halo grows with stage drift and shifts sample
    # clamping ulps, which SMC resampling amplifies; same F1 class).
    # Smaller values buy kill-back economy per launch; 8 is the
    # measured balance.

) -> ReconstructionResult:
    """Full reconstruction of a (Z, Y, X) uint8 volume over `mesh`.

    3-D volumes shard over Z. Single-slice (P == 1) images — the
    reference's first-class 2-D path (Advantra_plugin.cpp:2339) —
    shard over Y instead: internally the image is carried as its
    transposed (Y, 1, X) representation so the whole 1-D-mesh machinery
    (halo exchange, bucketing, boundary handoff) applies unchanged,
    with `frangi2d` per shard and y-migration in the tracer. Seed
    extraction in 2-D runs on the gathered J8 slice: the tolerance
    flood spans the whole slice (seed.cpp:574 floods per z-slice), so
    it cannot shard over Y; one slice gather is the same O(Y*X) the
    host already holds as the input.
    """
    vol = as_u8_volume(vol)
    n_dev = int(mesh.devices.size)
    if verbose and mesh.devices.flat[0].platform == "tpu":
        # pre-flight HBM feasibility (estimates — warn, don't refuse)
        from pnr_tpu.parallel.plan import plan_sharded

        try:
            plan = plan_sharded(vol.shape, cfg, n_dev, stage_iters=stage_iters)
            if not plan.fits:
                print(
                    "warning: this run may exceed per-chip HBM — "
                    + plan.summary().replace("\n", "\n  ")
                )
        except ValueError:
            pass
    is2d = vol.shape[0] == 1
    ci = 1 if is2d else 2  # the sharded coordinate in (x, y, z)
    span_orig = vol.shape[1] if is2d else vol.shape[0]
    if is2d:
        rep = np.ascontiguousarray(
            _pad_axis_replicate(vol, n_dev, axis=1).transpose(1, 0, 2)
        )
    else:
        rep = _pad_z_replicate(vol, n_dev)
    if key is None:
        key = jax.random.key(cfg.seed)

    from pnr_tpu.pipeline.reconstruct import _StageTimer

    tm = _StageTimer(verbose)
    nodes = NodeList()
    smap = None

    vs = shard_volume(rep, mesh)

    if cfg.somaradius > 0:
        tm.start("soma extraction (sharded)")
        smap = soma_extraction_sharded(
            vs, vol.shape, cfg, nodes, mesh, verbose, is2d=is2d
        )
        tm.stop()

    tm.start("frangi (sharded)")
    if is2d:
        j, jmin, jmax, vx, vy, vz = _jit_frangi2d_sharded(
            mesh, cfg.sigmas, cfg.frangi_betaone, cfg.frangi_betatwo
        )(vs)
    else:
        j, jmin, jmax, vx, vy, vz = _jit_frangi3d_sharded(
            mesh, cfg.sigmas, cfg.zdist,
            cfg.frangi_alpha, cfg.frangi_beta, cfg.frangi_c,
        )(vs)
    j8 = normalize_to_u8_sharded(j, jmin, jmax)
    j8.block_until_ready()
    tm.stop()

    tm.start("seed extraction (sharded)")
    if is2d:
        # host flood on the de-transposed slice; the decode gather runs
        # on the TRANSPOSED sharded maps, where flat index is y*X + x
        j8_full = fetch_replicated(j8).transpose(1, 0, 2)[:, :span_orig]
        _, yy, xx = np.nonzero(_host_flood(j8_full, cfg.tolerance))
        pos = np.stack(
            [xx, yy, np.zeros_like(xx)], axis=-1
        ).astype(np.float32)
        pos_t = np.stack([xx, np.zeros_like(xx), yy], axis=-1).astype(np.float32)
        dirs = _decode_seed_dirs(vx, vy, vz, pos_t)
    elif jax.process_count() == 1:
        # the host owns the full volume (API contract): fetch J8 once
        # and run the exact native tolerance flood, like the
        # single-device pipeline. The device label-propagation
        # (`seeds_sharded`, kept as a library routine) is exact too but
        # iterates whole-slab passes to convergence — measured 275 s of
        # a 337 s run on a 52-Mvox noisy stack vs ~3 s for this path
        # (PARITY.md round 3).
        j8_np = np.asarray(j8)[:span_orig]
        zz, yy, xx = np.nonzero(_host_flood(j8_np, cfg.tolerance))
        pos = np.stack([xx, yy, zz], axis=-1).astype(np.float32)
        dirs = _decode_seed_dirs(vx, vy, vz, pos)
    else:
        # multi-process: slab-local exact flood per shard, no gather of
        # J8 or the direction maps, no volume-size cliff (r3 item 2)
        pos, dirs = _seeds_per_shard_multiprocess(
            j8, vx, vy, vz, cfg.tolerance, span_orig
        )
    # drop seeds inside the soma
    if smap is not None and len(pos):
        zi = np.floor(pos[:, 2] + 0.5).astype(int)
        yi = np.floor(pos[:, 1] + 0.5).astype(int)
        xi = np.floor(pos[:, 0] + 0.5).astype(int)
        outside = smap[zi, yi, xi] == 0
        pos, dirs = pos[outside], dirs[outside]
    tm.stop()
    if verbose:
        print(f"{len(pos) / 1000.0}k seeds")

    tm.start("seed selection & sorting (sharded)")
    corr = np.zeros(0, np.float32)
    if len(pos):
        scorer = _seed_scorer_cached(cfg, mesh, is2d)
        corr_all = _score_seeds_sharded(
            scorer, vs, pos, dirs, rep.shape[0], n_dev, verbose, ci
        )
        keep = corr_all >= cfg.znccth
        pos, dirs, corr = pos[keep], dirs[keep], corr_all[keep]
        order = np.argsort(-corr, kind="stable")
        pos, dirs, corr = pos[order], dirs[order], corr[order]
    tm.stop()
    if verbose:
        print(f"{len(pos) / 1000.0}k seeds after selection")

    tm.start("tracing (sharded, staged handoff)")
    committer = TraceCommitter(vol.shape, cfg.vol, cfg.nodepervol, nodes, smap)
    wave = max(1, cfg.wave_size)
    # worst case: every trace of the wave in one slab always fits, so
    # re-queueing only triggers under a test override
    lanes = _lanes_override or 2 * wave
    stage_iters = max(1, int(stage_iters))
    init, stage, n_stages = _handoff_tracer_cached(
        cfg, mesh, lanes, stage_iters, span_orig, is2d
    )
    trace_count = 0
    idx = 0
    nseeds = len(pos)
    waves_done = 0
    requeued_total = 0
    handoffs_total = 0
    # lane-overflow re-queues + the unstarted tail of a cap-cut wave;
    # persisted in the checkpoint so a resume never skips them
    pending: List[int] = []
    if resume and checkpoint_path:
        from pnr_tpu.pipeline.checkpoint import load_checkpoint

        if not os.path.exists(checkpoint_path):
            # loud on EVERY process: on a non-shared filesystem only
            # process 0 holds the snapshot, and silently starting fresh
            # here would break the redundant-host-driver invariant
            # (identical host logic and state on all processes)
            raise FileNotFoundError(
                f"resume=True but no checkpoint at {checkpoint_path!r} "
                f"(process {jax.process_index()}; multi-host resume needs "
                "the snapshot on a shared filesystem)"
            )
        committer, idx, trace_count, pending, ck_nseeds = load_checkpoint(
            checkpoint_path
        )
        if tuple(committer.shape) != tuple(vol.shape):
            raise ValueError(
                f"checkpoint was taken on a {tuple(committer.shape)} volume, "
                f"not {tuple(vol.shape)} — wrong checkpoint or wrong input"
            )
        if ck_nseeds >= 0 and ck_nseeds != nseeds:
            raise ValueError(
                f"checkpoint expects {ck_nseeds} seeds, this run selected "
                f"{nseeds} — the front-half config differs from the "
                "checkpointed run"
            )
        nodes = committer.nodes
        if verbose:
            print(f"resumed at seed {idx}, {trace_count} traces, |n0|={len(nodes)}")

    while (pending or idx < nseeds) and trace_count <= cfg.max_trace_count:
        batch: List[int] = []
        while pending and len(batch) < wave:
            si = pending.pop(0)
            if committer.seed_allowed(pos[si]):
                batch.append(si)
        while idx < nseeds and len(batch) < wave:
            if committer.seed_allowed(pos[idx]):
                batch.append(idx)
            idx += 1
        if not batch:
            break
        sel = np.asarray(batch)
        sp = np.repeat(pos[sel], 2, axis=0)
        sd = np.empty_like(sp)
        sd[0::2] = dirs[sel]
        sd[1::2] = -dirs[sel]
        tids = np.empty(2 * len(sel), np.int64)
        tids[0::2] = 2 * sel
        tids[1::2] = 2 * sel + 1
        bp, bd, bi, bv, dropped = _bucket_by_shard(
            sp, sd, tids, rep.shape[0], n_dev, lanes, ci
        )
        if dropped:
            # re-queue whole seeds whose traces did not fit this wave's
            # lanes (commit-order divergence, never loss)
            requeue = sorted({int(t) // 2 for t in dropped})
            bv = bv & ~np.isin(bi // 2, np.asarray(requeue))
            sel = sel[~np.isin(sel, np.asarray(requeue))]
            pending.extend(requeue)
            requeued_total += len(requeue)
            if verbose:
                print(f"wave lane overflow: re-queued {len(requeue)} seeds")
        if not len(sel):
            continue

        trace_count, unstarted, wave_handoffs = _trace_and_commit_wave_sharded(
            committer, init, stage, vs, bp, bd, bi, bv, key, cfg,
            pos, sel, trace_count, n_stages, stage_iters,
            n_shards=n_dev,
            # capacity structurally cannot bind when every trace of the
            # wave fits one shard's lanes (lanes = 2*wave >= 2*len(sel))
            # — the stale-by-one kill of the pipeline is then
            # economy-only and results are bitwise-serial
            pipelined=(_lanes_override is None and lanes >= 2 * len(sel)),
        )
        handoffs_total += wave_handoffs
        # cap-cut wave tail goes BEFORE earlier lane-overflow re-queues:
        # in an uninterrupted run those overflow seeds trace in the wave
        # AFTER this one
        pending = unstarted + pending
        waves_done += 1
        if (
            checkpoint_path
            and waves_done % max(1, checkpoint_every_waves) == 0
            and jax.process_index() == 0  # one writer; state is replicated
        ):
            from pnr_tpu.pipeline.checkpoint import save_checkpoint

            save_checkpoint(
                checkpoint_path, committer, idx, trace_count, pending, nseeds
            )
    tm.stop()
    if verbose:
        extra = f", {requeued_total} re-queued" if requeued_total else ""
        print(f"traced {trace_count} seeds{extra}, |n0|={len(nodes)}")

    n0 = nodes

    def _fetch_map(a):
        # de-transpose the internal (Y, 1, X) 2-D layout and drop the
        # replicate padding, like the returned J8
        m = fetch_replicated(a)
        return m.transpose(1, 0, 2)[:, :span_orig] if is2d else m[:span_orig]

    midres = None
    if cfg.save_midres:
        # same artifact set as the single-device path (r3 item 7):
        # direction maps, trace density, normalized soma map; the
        # per-stage n0/n1/n2 snapshots fill in reconstruct_graph below
        from pnr_tpu.pipeline.reconstruct import smap_to_u8

        midres = {
            "vx": _fetch_map(vx),
            "vy": _fetch_map(vy),
            "vz": _fetch_map(vz),
            "trace_density": np.clip(committer.npervol, 0, 255).astype(
                np.uint8
            ),
        }
        if smap is not None:
            midres["smap8"] = smap_to_u8(smap)

    tm.start("reconstruct")
    tree = reconstruct_graph(n0.copy(), cfg, midres=midres)
    tm.stop()

    return ReconstructionResult(
        tree=tree,
        n0=n0,
        seeds_pos=pos,
        seeds_corr=corr,
        trace_count=trace_count,
        timings=tm.timings,
        j8=_fetch_map(j8),
        midres=midres,
        zncc_mode=cfg.zncc_mode,
        n_handoffs=handoffs_total,
        n_requeued=requeued_total,
    )


def _trace_and_commit_wave_sharded(
    committer, init, stage, vs, bp, bd, bi, bv, base_key, cfg,
    pos, sel, trace_count, n_stages, stage_iters, pipelined=False,
    n_shards=1,
):
    """Staged sharded wave with the in-order commit wavefront and
    kill-back — the sharded counterpart of the single-device
    `_trace_and_commit_wave` (pipeline/reconstruct.py): estimates commit
    in seed order between stages, and traces whose committed prefix
    stopped (suppression/out-of-bounds/low corr) are killed so they cost
    no further device compute and free their lanes for migration.

    With `pipelined`, stage k+1 launches (kill mask computed ON DEVICE
    from stage k's lane ids — no host sync) before stage k's estimates
    are fetched and committed, so the next stage's device compute
    overlaps the host commit — the sharded analog of the single-device
    stage-loop software pipeline. The kill feedback is then stale by
    one stage: economy-only, PROVIDED migration capacity never binds
    (a dead-but-unkilled trace holds its lane one stage longer). The
    caller only enables this when every trace of the wave fits one
    shard's lanes simultaneously, where capacity structurally cannot
    bind and results are bitwise-identical to the serial loop."""
    ni = cfg.ni
    state, est0, ids0, field = init(vs, bp, bd, bi.astype(np.int32), bv, base_key)
    lanes_total = int(est0.shape[0])

    # boundary-handoff observation: a live trace id whose lane moved to
    # a different shard between consecutive ids snapshots migrated over
    # the mesh (parallel/handoff.py). Counted host-side from the lane
    # layout (lane // lanes_per_shard) — free, and the driver dryrun
    # asserts it fires (VERDICT r4 item 5).
    per_shard = lanes_total // max(1, n_shards)
    shard_of: dict = {}
    handoffs = 0

    def note_ids(ids_np):
        nonlocal handoffs
        for lane in range(lanes_total):
            t = int(ids_np[lane])
            if t < 0:
                continue
            s = lane // per_shard
            prev = shard_of.get(t)
            if prev is not None and prev != s:
                handoffs += 1
            shard_of[t] = s

    def _fetch2(a, b):
        """Fetch a pair of stage outputs; single-process issues both D2H
        transfers before collecting either (the link pipelines
        concurrent requests — see fetch_volume), multi-process gathers
        remote shards to every process."""
        if getattr(a, "is_fully_addressable", True):
            for x in (a, b):
                if hasattr(x, "copy_to_host_async"):
                    x.copy_to_host_async()
            return np.asarray(a), np.asarray(b)
        return fetch_replicated(a), fetch_replicated(b)

    # per-trace host-side estimate buffers, filled stage by stage
    est = {int(t): np.zeros((ni, 9), np.float32) for t in bi[bv]}
    e0, ids_cur = _fetch2(est0, ids0)
    note_ids(ids_cur)
    for lane in range(lanes_total):
        t = int(ids_cur[lane])
        if t >= 0:
            est[t][0] = e0[lane]

    cursors = {int(t): committer.begin_trace() for t in bi[bv]}
    killed_ids = set()
    seed_started = {int(s): False for s in sel}
    commit_order = []
    for s in sel:
        commit_order.extend([2 * int(s), 2 * int(s) + 1])
    commit_ptr = 0
    it_done = 1

    def _unstarted():
        # seeds the trace cap prevented from starting: carried as
        # pending by the caller so a checkpointed resume never skips them
        return [int(s) for s in sel if not seed_started[int(s)]]

    def advance(avail):
        nonlocal commit_ptr, trace_count
        while commit_ptr < len(commit_order):
            tid = commit_order[commit_ptr]
            si = tid // 2
            if tid % 2 == 0 and not seed_started[si]:
                if trace_count > cfg.max_trace_count:
                    return True
                seed_started[si] = True
                if not committer.seed_allowed(pos[si]):
                    killed_ids.add(tid)
                    killed_ids.add(tid + 1)
                    if tid in cursors:
                        cursors[tid]["finished"] = True
                    if tid + 1 in cursors:
                        cursors[tid + 1]["finished"] = True
                    commit_ptr += 2
                    continue
                trace_count += 1
            if tid not in cursors:  # seed re-queued out of this wave
                commit_ptr += 1
                continue
            cur = cursors[tid]
            e = est[tid]
            committer.commit_steps(
                cur, e[:, 0:3], e[:, 3:6], e[:, 6], e[:, 7], e[:, 8], avail
            )
            if cur["finished"] or cur["i"] >= ni:
                committer.finish_trace(cur)
                killed_ids.add(tid)
                commit_ptr += 1
            else:
                break
        return False

    def fill_est(pk, ids_np, it0, n_it):
        for lane in range(lanes_total):
            t = int(ids_np[lane])
            if t >= 0 and t in est:
                est[t][it0 : it0 + n_it] = pk[lane, :n_it]

    if not pipelined:
        while True:
            capped = advance(it_done)
            if commit_ptr >= len(commit_order) or it_done >= ni or capped:
                break
            # build the kill mask in CURRENT lane layout
            kill = np.zeros(lanes_total, bool)
            for lane in range(lanes_total):
                t = int(ids_cur[lane])
                if t >= 0 and t in killed_ids:
                    kill[lane] = True
            n_it = min(stage_iters, ni - it_done)
            # host values go in raw (np): jit auto-shards same-value
            # host inputs, which also works across processes
            state, packed, ids_j, live, kept = stage(
                vs, field, state,
                np.arange(it_done, it_done + stage_iters, dtype=np.int32),
                kill,
            )
            pk, ids_cur = _fetch2(packed, ids_j)
            note_ids(ids_cur)
            fill_est(pk, ids_cur, it_done, n_it)
            it_done += n_it

        advance(it_done)
        return trace_count, _unstarted(), handoffs

    # ---- pipelined: one stage in flight ahead of the commit wavefront
    ids_dev = ids0  # device lane ids of the LAST LAUNCHED stage
    it_launch = 1
    inflight = None  # (packed, ids, it_start, n_it)
    kpad = max(lanes_total, 2 * len(sel))
    while True:
        capped = advance(it_done)
        if commit_ptr >= len(commit_order) or capped:
            break  # in-flight work (if any) is dead — drop it
        if it_launch < ni:
            # pad with -2: -1 is the free-lane id sentinel in `ids`, and
            # the pad value must never match a lane id
            killed_arr = np.full(kpad, -2, np.int64)
            if killed_ids:
                kl = np.fromiter(killed_ids, np.int64)
                killed_arr[: len(kl)] = kl
            # device-side id->lane kill translation: stage k+1 launches
            # without fetching stage k's lane layout (killed_arr is a
            # same-value host array; eager isin follows ids_dev's
            # sharding, single- or multi-process)
            kill_dev = jnp.isin(ids_dev, killed_arr)
            n_it = min(stage_iters, ni - it_launch)
            state, packed, ids_j, live, kept = stage(
                vs, field, state,
                np.arange(it_launch, it_launch + stage_iters, dtype=np.int32),
                kill_dev,
            )
            if getattr(packed, "is_fully_addressable", True):
                for a in (packed, ids_j):
                    if hasattr(a, "copy_to_host_async"):
                        a.copy_to_host_async()
            newflight = (packed, ids_j, it_launch, n_it)
            ids_dev = ids_j
            it_launch += n_it
        else:
            newflight = None
        if inflight is not None:
            packed_p, ids_p, it0, n_p = inflight
            pk_p, ids_np = _fetch2(packed_p, ids_p)
            note_ids(ids_np)
            fill_est(pk_p, ids_np, it0, n_p)
            it_done = it0 + n_p
        elif newflight is None:
            break
        inflight = newflight

    advance(it_done)
    return trace_count, _unstarted(), handoffs
