"""End-to-end reconstruction pipeline: uint8 volume -> SWC node graph.

Parity target: `reconstruction_func` (pnr-vaa3d/Advantra_plugin.cpp:
2183-2731) and `reconstruct` (:2096-2181): soma extraction ->
multi-scale Frangi -> seed extraction -> ZNCC seed filtering/sorting ->
per-seed bidirectional SMC tracing with density suppression -> node
graph post-processing (resample -> mean-shift refine -> group -> BFS
forest -> prune -> interpolate) -> SWC.

TPU redesign: the dense stages and the particle filter run on device;
seeds trace in waves of `cfg.wave_size` in lockstep (speculative
compute, sequential commit — see pnr_tpu.graph.build). Per SURVEY.md
§2a the reference's final SWC write is dead code under its default
flags (nested contradictory ENFORCE_SINGLE_TREE guards,
Advantra_plugin.cpp:2142-2166); this pipeline implements the intended
behaviour: largest tree when enforce_single_tree, else all trees with
at least tree_size_min nodes, interpolated at step 1.0.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pnr_tpu import native
from pnr_tpu.config import PNRConfig
from pnr_tpu.io.volume import as_u8_volume
from pnr_tpu.graph.build import TraceCommitter
from pnr_tpu.graph.nodes import AXON, SOMA, NodeList
from pnr_tpu.graph.refine import group1, interpolate_nodelist, non_blurring
from pnr_tpu.graph.trees import (
    bfs_forest,
    extract_largest_tree,
    extract_trees,
    interpolate_treelist,
)
from pnr_tpu.ops import (
    frangi2d,
    frangi3d,
    imerode_xy,
    imgaussian_xy,
    maxentropy_th,
    normalize_to_u8,
)
from pnr_tpu.ops.zncc import make_zncc_fn
from pnr_tpu.seeds.extract import extract_seeds
from pnr_tpu.smc.tracker import BatchedTracker
from pnr_tpu.utils.runtime import fetch_u8_sparse, fetch_volume


@dataclasses.dataclass
class ReconstructionResult:
    tree: NodeList  # final treelist (SWC-ready)
    n0: NodeList  # raw traced node graph (pre-postprocessing)
    seeds_pos: np.ndarray
    seeds_corr: np.ndarray
    trace_count: int
    timings: Dict[str, float]
    j8: Optional[np.ndarray] = None
    midres: Optional[Dict[str, np.ndarray]] = None  # when cfg.save_midres
    #: raw MaximumFinder count BEFORE soma/zncc selection — the
    #: low-signal diagnostic's reference point (VERDICT r4 item 7)
    n_raw_seeds: int = -1
    #: engine the likelihood ran on ("tube"/"exact"), for diagnostics
    zncc_mode: str = ""
    #: sharded runs: boundary-handoff migrations observed (lane id seen
    #: on a different shard than the previous stage) and lane-overflow
    #: re-queues; -1 on the single-device path
    n_handoffs: int = -1
    n_requeued: int = -1


def smap_to_u8(smap: np.ndarray) -> np.ndarray:
    """Min-max normalized soma label map for the midres dump
    (Advantra_plugin.cpp:2450-2470)."""
    smin, smax = int(smap.min()), int(smap.max())
    if smax == smin:
        return np.full(smap.shape, smin & 0xFF, np.uint8)
    return np.clip(
        np.round((smap - smin) / float(smax - smin) * 255), 0, 255
    ).astype(np.uint8)


class _StageTimer:
    def __init__(self, verbose: bool):
        self.timings: Dict[str, float] = {}
        self.verbose = verbose
        self._t0 = None
        self._name = None

    def start(self, name: str):
        if self.verbose:
            print(f"{name}... ", end="", flush=True)
        self._name, self._t0 = name, time.perf_counter()

    def stop(self):
        dt = time.perf_counter() - self._t0
        self.timings[self._name] = self.timings.get(self._name, 0.0) + dt
        if self.verbose:
            print(f"{dt:.3f} sec.")


def soma_extraction(vol: np.ndarray, cfg: PNRConfig, nodes: NodeList):
    """Erode -> xy Gaussian -> max-entropy threshold -> 3-D CC -> soma
    nodes + voxel map (Advantra_plugin.cpp:2426-2481, soma_extraction1
    :1899-1915). Returns smap (Z, Y, X) int32 of soma-node indices."""
    v = jnp.asarray(vol)
    e8 = imerode_xy(v, float(cfg.somaradius))
    e8 = imgaussian_xy(e8, float(cfg.somaradius))
    e8_np = fetch_volume(e8)
    th = maxentropy_th(e8_np)
    e8bin = np.where(e8_np > th, 255, 0).astype(np.uint8)
    labels, regions = native.conn3d(e8bin, value_over=0, min_size=1, diagonal=True)
    # region r (1-based) becomes node index len(nodes)-1+r; with an empty
    # fresh NodeList (dummy only) that is exactly r, so labels ARE indices.
    base = len(nodes) - 1
    for r in range(len(regions)):
        nodes.add(
            regions[r, 0], regions[r, 1], regions[r, 2],
            sig=regions[r, 3], ntype=SOMA,
        )
    smap = np.where(labels > 0, labels + base, 0).astype(np.int32)
    return smap


def sphere_offsets(radius: float, zdist: float) -> np.ndarray:
    """Integer ellipsoid offsets, z-range shrunk by 1/zdist
    (Tracker::sphereXYZ, pnr-vaa3d/tracker.cpp:581-620). (K, 3) dx,dy,dz."""
    radius = max(0.0, float(radius))
    rxy = int(round(radius))
    rz = int(round(radius / zdist))
    if rxy == 0:
        # reference: 0/0 -> NaN -> the <=1 test fails for every offset
        return np.zeros((0, 3), np.int32)
    out = []
    for dx in range(-rxy, rxy + 1):
        for dy in range(-rxy, rxy + 1):
            for dz in range(-rz, rz + 1):
                t = (dx * dx) / float(rxy * rxy) + (dy * dy) / float(rxy * rxy)
                if rz != 0:
                    t += (dz * dz) / float(rz * rz)
                if t <= 1.0:
                    out.append((dx, dy, dz))
    return np.asarray(out, np.int32)


def soma_extraction_alt(
    e8: np.ndarray, th: int, rgrp: float, zdist: float, nodes: NodeList
) -> np.ndarray:
    """Alternate soma extraction (`soma_extraction`,
    Advantra_plugin.cpp:1917-2094; unused in the reference's live path,
    reproduced for completeness).

    Greedy spherical clustering of above-threshold voxels by descending
    value: each unmapped voxel claims its ellipsoid neighbourhood's
    above-threshold voxels as one SOMA node (position = their running
    average), then 6-connected adjacent clusters are linked and the
    neighbour lists deduplicated. Returns the (Z, Y, X) int32 smap of
    node indices (relative to `nodes`, which receives the SOMA nodes).
    """
    e8 = np.asarray(e8)
    l, h, w = e8.shape
    smap = np.zeros((l, h, w), np.int32)
    mask = e8 > th
    zz, yy, xx = np.nonzero(mask)
    vals = e8[zz, yy, xx]
    order = np.argsort(-vals.astype(np.int32), kind="stable")
    offs = sphere_offsets(rgrp, zdist)
    base = len(nodes) - 1

    for k in order:
        z0, y0, x0 = int(zz[k]), int(yy[k]), int(xx[k])
        if smap[z0, y0, x0] != 0:
            continue
        x1 = np.clip(x0 + offs[:, 0], 0, w - 1)
        y1 = np.clip(y0 + offs[:, 1], 0, h - 1)
        z1 = np.clip(z0 + offs[:, 2], 0, l - 1)
        inb = (
            (x0 + offs[:, 0] >= 0) & (x0 + offs[:, 0] < w)
            & (y0 + offs[:, 1] >= 0) & (y0 + offs[:, 1] < h)
            & (z0 + offs[:, 2] >= 0) & (z0 + offs[:, 2] < l)
        )
        # NOTE: like the reference (:1983-2003), neighbours are stamped
        # without checking for a prior claim — overlapping clusters
        # overwrite earlier stamps (processing-order dependent)
        sel = inb & mask[z1, y1, x1]
        if not sel.any():
            continue
        nid = nodes.add(
            float(x1[sel].mean()), float(y1[sel].mean()), float(z1[sel].mean()),
            sig=rgrp, ntype=SOMA,
        )
        smap[z1[sel], y1[sel], x1[sel]] = nid - base

    # 6-connected linking of adjacent clusters
    lab = smap
    for axis, shift in ((0, 1), (1, 1), (2, 1)):
        a = lab
        b = np.roll(lab, -shift, axis=axis)
        sl = [slice(None)] * 3
        sl[axis] = slice(0, -1)
        aa = a[tuple(sl)]
        bb = b[tuple(sl)]
        both = (aa > 0) & (bb > 0) & (aa != bb)
        for i, j in set(zip(aa[both].tolist(), bb[both].tolist())):
            nodes.nbr[base + i].append(base + j)
            nodes.nbr[base + j].append(base + i)
    for i in range(base + 1, len(nodes)):
        nodes.nbr[i] = sorted(set(nodes.nbr[i]))
    return np.where(smap > 0, smap + base, 0).astype(np.int32)


def _score_seeds(
    img: jax.Array, pos: np.ndarray, dirs: np.ndarray, tracker, chunk: int = 4096
):
    """Batched znccBBB over all seeds (Advantra_plugin.cpp:2561-2575).

    In tube mode each seed scores through the gather-free patch engine
    (one tight patch per seed, N=1) — identical values to the gather
    formulation but ~10x cheaper to trace/compile and to run on TPU."""
    n = len(pos)
    corrs = np.empty(n, np.float32)
    engine = tracker._patch_engine
    if engine is not None:
        chunk = min(chunk, 1024)
    # bucket the launch shape to the next power of two >= n (>= 128):
    # typical stacks have a few hundred selected seeds, and padding them
    # all the way to the 1024-lane chunk quadruples the patch traffic;
    # the bucket set stays bounded (128..chunk) so compiles stay shared
    if n <= chunk:
        chunk = max(128, 1 << max(0, (n - 1).bit_length()))
    # cache the jitted scorer on the tracker: a fresh jax.jit wrapper
    # per call would re-trace the scoring graph for every stack
    scored = getattr(tracker, "_seed_scorer", None)
    if scored is None:
        if engine is not None:

            def fn(f, p, d):
                c, _ = engine.eval_fused(f, p[:, None, :], d[:, None, :])
                return c[:, 0], None

            scored = jax.jit(fn)
        else:
            scored = jax.jit(tracker._zncc)
        tracker._seed_scorer = scored
    for beg in range(0, n, chunk):
        end = min(beg + chunk, n)
        pad = chunk - (end - beg)
        p = np.pad(pos[beg:end], ((0, pad), (0, 0)), mode="edge")
        d = np.pad(dirs[beg:end], ((0, pad), (0, 0)), mode="edge")
        c, _ = scored(img, jnp.asarray(p), jnp.asarray(d))
        corrs[beg:end] = np.asarray(c)[: end - beg]
    return corrs


def _trace_and_commit_wave(
    tracker, committer, field, seed_pos, seed_dirs, seed_global_idx, base_key, cfg, trace_count
):
    """Trace one wave of seeds with staged device execution and an
    in-order incremental commit wavefront.

    The reference traces sequentially and stops each trace the moment it
    hits the density/soma maps (tracker.cpp:843-919) — it never computes
    past a stop. The lockstep wave must reproduce that economy: estimates
    are committed in seed order between stages, and a trace whose commit
    stopped feeds a kill mask back into the next stage so it costs no
    further device compute. PRNG streams key on (seed id, direction,
    absolute iteration), so results are independent of staging.
    """
    ni = cfg.ni
    nb = len(seed_pos)
    t_real = 2 * nb
    # interleave [pos_0, neg_0, pos_1, neg_1, ...] = the reference's
    # commit order (trackPos then trackNeg per seed, Advantra_plugin.cpp:2683-2693)
    sp = np.repeat(np.asarray(seed_pos, np.float32), 2, axis=0)
    sd = np.empty_like(sp)
    sd[0::2] = seed_dirs
    sd[1::2] = -np.asarray(seed_dirs)
    ids = np.empty(t_real, np.int64)
    ids[0::2] = 2 * np.asarray(seed_global_idx)
    ids[1::2] = 2 * np.asarray(seed_global_idx) + 1

    chunk = tracker.TRACE_CHUNK
    tpad = chunk if t_real <= chunk else -(-t_real // chunk) * chunk
    if t_real < tpad:
        padn = tpad - t_real
        sp = np.concatenate([sp, np.tile(sp[:1], (padn, 1))])
        sd = np.concatenate([sd, np.tile(sd[:1], (padn, 1))])
        ids = np.concatenate([ids, np.zeros(padn, np.int64)])

    stage = tracker.STAGE_ITERS
    cursors = [committer.begin_trace() for _ in range(t_real)]
    killed = np.zeros(tpad, bool)
    killed[t_real:] = True  # pad lanes never commit; let their chunk retire
    seed_started = [False] * nb
    seed_suppressed = [False] * nb
    commit_ptr = 0

    # per-chunk device state
    nchunks = tpad // chunk
    keys_all = jax.vmap(lambda i: jax.random.fold_in(base_key, i))(
        jnp.asarray(ids, jnp.uint32)
    )
    carries = []
    # packed estimate buffer: [..., 0:3]=pos, 3:6=dir, 6=sig, 7=corr, 8=valid
    est = np.zeros((tpad, ni, 9), np.float32)
    init_pend = []
    for c in range(nchunks):
        slc = slice(c * chunk, (c + 1) * chunk)
        carry, est0 = tracker._trace_init(
            field, jnp.asarray(sp[slc]), jnp.asarray(sd[slc]), keys_all[slc]
        )
        carries.append(carry)
        init_pend.append((slc, est0))
    for _, est0 in init_pend:
        # issue all chunks' D2H before collecting any (see dispatch_stage)
        if hasattr(est0, "copy_to_host_async"):
            est0.copy_to_host_async()
    for slc, est0 in init_pend:
        est[slc, 0] = np.asarray(est0)
    est_pos = est[:, :, 0:3]
    est_dir = est[:, :, 3:6]
    est_sig = est[:, :, 6]
    est_corr = est[:, :, 7]
    est_valid = est[:, :, 8]  # float 0/1; truthiness works in commit_steps
    it_done = 1

    def advance_commits(avail: int) -> bool:
        """Advance the in-order commit wavefront; True when the trace cap
        blocks starting the next seed (everything before it is finished)."""
        nonlocal commit_ptr, trace_count
        while commit_ptr < t_real:
            k = commit_ptr
            si = k // 2
            if k % 2 == 0 and not seed_started[si]:
                # the trace cap stops STARTING seeds; a started seed still
                # finishes both directions (Advantra_plugin.cpp:2702 breaks
                # after trackPos+trackNeg complete)
                if trace_count > cfg.max_trace_count:
                    return True
                seed_started[si] = True
                if not committer.seed_allowed(seed_pos[si]):
                    seed_suppressed[si] = True
                    killed[k] = killed[k + 1] = True
                    cursors[k]["finished"] = cursors[k + 1]["finished"] = True
                    commit_ptr += 2
                    continue
                trace_count += 1
            cur = cursors[k]
            committer.commit_steps(
                cur, est_pos[k], est_dir[k], est_sig[k], est_corr[k], est_valid[k], avail
            )
            if cur["finished"] or cur["i"] >= ni:
                committer.finish_trace(cur)
                killed[k] = True
                commit_ptr += 1
            else:
                break  # needs more stages
        return False

    def dispatch_stage(it0):
        """Launch iterations [it0, it0+stage) for every live chunk and
        start their D2H transfers; returns the pending collection list.

        Dispatching every chunk BEFORE fetching any and issuing all
        copy_to_host_async up front lets the remote link pipeline the
        transfers (see fetch_volume)."""
        iter_idx = jnp.arange(it0, it0 + stage)
        pend = []
        for c in range(nchunks):
            slc = slice(c * chunk, (c + 1) * chunk)
            if killed[slc].all():
                continue  # whole chunk retired: no device work left
            carry, packed = tracker._trace_stage(
                field, keys_all[slc], carries[c], iter_idx, jnp.asarray(killed[slc])
            )
            carries[c] = carry
            pend.append((slc, packed))
        for _, packed in pend:
            if hasattr(packed, "copy_to_host_async"):
                packed.copy_to_host_async()
        return pend

    next_pending = None
    next_it0 = None
    while True:
        capped = advance_commits(it_done)
        if commit_ptr >= t_real or it_done >= ni or capped:
            break
        if next_pending is None or next_it0 != it_done:
            next_pending = dispatch_stage(it_done)
            next_it0 = it_done
        pending = next_pending
        n_it = min(stage, ni - it_done)
        # software-pipeline the stage loop: launch stage k+1 BEFORE
        # collecting stage k, so its device compute and D2H overlap the
        # host-side commits below. Its kill mask is one stage stale —
        # a pure economy (not correctness) cost: a trace whose commit
        # stops during stage k still computes stage k+1 once; the
        # commit wavefront and PRNG streams are unaffected.
        if it_done + n_it < ni:
            next_pending = dispatch_stage(it_done + n_it)
            next_it0 = it_done + n_it
        else:
            next_pending = None
        for slc, packed in pending:
            est[slc, it_done : it_done + n_it] = np.asarray(packed)[:, :n_it]
        it_done += n_it

    advance_commits(it_done)
    # seeds the trace cap prevented from STARTING (never suppressed,
    # never traced): the caller must carry them as pending so a
    # checkpointed resume with a raised cap does not silently skip them
    unstarted = [
        int(seed_global_idx[si]) for si in range(nb) if not seed_started[si]
    ]
    return trace_count, unstarted


@dataclasses.dataclass
class _StackFront:
    """Everything up to (and including) seed selection for one stack:
    the device/link-heavy prefix of `reconstruction_func`, computable
    independently of the trace state so it can be PREFETCHED for stack
    i+1 while stack i is still tracing (`reconstruction_batch`)."""

    nodes: NodeList
    smap: Optional[np.ndarray]
    j8_np: np.ndarray
    vx: jax.Array
    vy: jax.Array
    vz: jax.Array
    pos: np.ndarray
    dirs: np.ndarray
    corr: np.ndarray
    field: jax.Array
    tracker: BatchedTracker
    timings: Dict[str, float]
    n_raw_seeds: int = -1


def _stack_front(
    vol: np.ndarray,
    cfg: PNRConfig,
    verbose: bool = True,
    tracker: Optional[BatchedTracker] = None,
) -> _StackFront:
    """Soma -> Frangi -> seed extraction -> seed selection/sorting.

    Pure function of (vol, cfg): no PRNG, no mutable trace state — safe
    to run in a worker thread ahead of the consuming back half."""
    vol = as_u8_volume(vol)
    is2d = vol.shape[0] == 1
    tm = _StageTimer(verbose)

    from pnr_tpu.utils.runtime import warmup_device_transfers

    tm.start("device warmup")
    warmup_device_transfers()
    tm.stop()

    nodes = NodeList()
    smap = None

    if cfg.somaradius > 0:
        tm.start("soma extraction")
        smap = soma_extraction(vol, cfg, nodes)
        tm.stop()

    tm.start("frangi")
    img = jnp.asarray(vol)
    if is2d:
        if vol.size > 80_000_000:
            # gigapixel slides: O(tile) arena via the 2-D aligned-window
            # tiler (bitwise frangi2d; see ops/frangi_blocked.py)
            from pnr_tpu.ops.frangi_blocked import (
                frangi2d_tiled,
                pick_blocks_2d,
            )

            by, bx = pick_blocks_2d(vol.shape[1:], cfg.sigmas)
            j, jmin, jmax, vx, vy = frangi2d_tiled(
                img[0], cfg.sigmas, cfg.frangi_betaone, cfg.frangi_betatwo,
                block_y=by, block_x=bx,
            )
            vz = jnp.zeros_like(vx)
        else:
            j, jmin, jmax, vx, vy, vz = frangi2d(
                img[0], cfg.sigmas, cfg.frangi_betaone, cfg.frangi_betatwo
            )
        j, vx, vy, vz = j[None], vx[None], vy[None], vz[None]
    else:
        from pnr_tpu.ops.frangi_fused import (
            best_fused_geom, frangi3d_fused, fused_frangi_enabled,
        )
        from pnr_tpu.ops.pallas_conv import mosaic_available

        use_fused = (
            (cfg.fused_frangi or fused_frangi_enabled())
            and mosaic_available()
            and best_fused_geom(vol.shape, cfg.sigmas, cfg.zdist) is not None
            # the fused kernel's ~13 B/voxel HBM peak caps it near
            # 1 Gvox on a 16 GiB chip; beyond that the 2-axis tiler
            # below (O(tile) arena) is the only engine that fits
            and vol.size * 13 <= 13 * (1 << 30)
        )
        if use_fused:
            # one raw-volume read; O(ring) VMEM and ~13 B/voxel HBM
            # peak, so it also lifts the monolithic ~80 Mvox XLA cap
            j, jmin, jmax, vx, vy, vz = frangi3d_fused(
                img, cfg.sigmas, cfg.zdist,
                cfg.frangi_alpha, cfg.frangi_beta, cfg.frangi_c,
            )
        elif vol.size > 80_000_000:
            # stream in tiles: the fused XLA graph peaks at ~180
            # B/voxel, beyond one v5e's 16 GB HBM around ~80 Mvox (52
            # Mvox monolithic measured fine with headroom for the
            # field maps). 2-axis aligned-window tiling when divisors
            # allow (pod-shard planes need Y tiled too); Z-only
            # streaming otherwise.
            from pnr_tpu.ops.frangi_blocked import (
                frangi3d_blocked,
                frangi3d_tiled,
                pick_blocks,
            )

            blocks = pick_blocks(vol.shape, cfg.sigmas, cfg.zdist)
            if blocks is not None:
                j, jmin, jmax, vx, vy, vz = frangi3d_tiled(
                    img, cfg.sigmas, cfg.zdist,
                    cfg.frangi_alpha, cfg.frangi_beta, cfg.frangi_c,
                    block_z=blocks[0], block_y=blocks[1],
                )
            else:
                j, jmin, jmax, vx, vy, vz = frangi3d_blocked(
                    img, cfg.sigmas, cfg.zdist,
                    cfg.frangi_alpha, cfg.frangi_beta, cfg.frangi_c,
                )
        else:
            j, jmin, jmax, vx, vy, vz = frangi3d(
                img, cfg.sigmas, cfg.zdist, cfg.frangi_alpha, cfg.frangi_beta, cfg.frangi_c
            )
    j8 = normalize_to_u8(j, jmin, jmax)
    j8.block_until_ready()
    # the f32 vesselness volume is consumed: at the half-Gvox class it
    # is 2.1 GB that would otherwise stay referenced through the tube
    # field build (observed as the 537-Mvox RESOURCE_EXHAUSTED)
    j = jmin = jmax = None
    tm.stop()

    tm.start("seed extraction")
    # The tolerance flood is a tiny serial stage; the native C++ runtime
    # finishes it in milliseconds, while the device label propagation
    # pays a per-iteration sync on remote TPU runtimes. The device path
    # remains available (and required) for sharded volumes.
    # the flood needs J8 on host; directions decode ON DEVICE at the
    # seed voxels only (fetching Vx/Vy/Vz wholesale costs three volume
    # transfers over the device link to read a few hundred voxels)
    from pnr_tpu.seeds.extract import decode_directions_device, max_points_device, max_points_host

    j8_np = fetch_u8_sparse(j8)
    if native.have_native():
        mask = max_points_host(j8_np, float(cfg.tolerance))
    else:
        mask = np.asarray(max_points_device(j8, float(cfg.tolerance)))
    # the device J8 buffer is done (the host copy serves the result and
    # the flood): free it BEFORE the tube map field builds — at the
    # half-Gvox class the extra ~0.5 GB tipped a 16-GiB chip over
    # (observed RESOURCE_EXHAUSTED at 537 Mvox)
    j8 = None
    zz, yy, xx = np.nonzero(mask)
    pos = np.stack([xx, yy, zz], axis=-1).astype(np.float32)
    n_raw_seeds = len(pos)
    dirs = decode_directions_device(vx, vy, vz, pos)
    if not cfg.save_midres:
        # the direction volumes are only re-read for the midres dump;
        # dropping them here frees their device buffers while this
        # front waits (in-flight prefetched fronts share the HBM)
        vx = vy = vz = None
    tm.stop()
    if verbose:
        print(f"{len(pos) / 1000.0}k seeds")

    tm.start("seed selection & sorting")
    if tracker is None:
        tracker = BatchedTracker(cfg, is2d)
    field = tracker.prepare_field(img)
    # tube mode replaces the raw device volume with the map field; in
    # exact mode `field` is a view keeping the same buffer alive —
    # dropping the extra reference is free either way (at 537 Mvox it
    # is another ~0.5 GB of headroom)
    img = None
    # overlap the tracer's first-use tracing + executable loading with
    # the rest of the front half (see BatchedTracker.warm_async)
    tracker.warm_async(field)
    if len(pos):
        # drop seeds inside the soma (smap > 0)
        if smap is not None:
            xi = np.floor(pos[:, 0] + 0.5).astype(int)
            yi = np.floor(pos[:, 1] + 0.5).astype(int)
            zi = np.floor(pos[:, 2] + 0.5).astype(int)
            outside = smap[zi, yi, xi] == 0
            pos, dirs = pos[outside], dirs[outside]
    if len(pos):
        corr = _score_seeds(field, pos, dirs, tracker)
        keep = corr >= cfg.znccth
        pos, dirs, corr = pos[keep], dirs[keep], corr[keep]
        order = np.argsort(-corr, kind="stable")
        pos, dirs, corr = pos[order], dirs[order], corr[order]
    else:
        corr = np.zeros(0, np.float32)
    tm.stop()
    if verbose:
        print(f"{len(pos) / 1000.0}k seeds after selection")

    return _StackFront(
        nodes=nodes, smap=smap, j8_np=j8_np, vx=vx, vy=vy, vz=vz,
        pos=pos, dirs=dirs, corr=corr, field=field, tracker=tracker,
        timings=tm.timings, n_raw_seeds=n_raw_seeds,
    )


def reconstruction_func(
    vol: np.ndarray,
    cfg: PNRConfig,
    verbose: bool = True,
    key: Optional[jax.Array] = None,
    checkpoint_path: Optional[str] = None,
    checkpoint_every_waves: int = 1,
    resume: bool = False,
    _tracker: Optional[BatchedTracker] = None,
    _front: Optional[_StackFront] = None,
) -> ReconstructionResult:
    """Full reconstruction of a (Z, Y, X) uint8 volume.

    With `checkpoint_path`, the mutable trace state snapshots every
    `checkpoint_every_waves` committed waves; `resume=True` continues
    from the snapshot (deterministic — PRNG streams are per-trace-id).
    Setting env PNR_TPU_PROFILE_DIR captures a jax.profiler trace.
    """
    import os

    profile_dir = os.environ.get("PNR_TPU_PROFILE_DIR")
    if profile_dir:
        jax.profiler.start_trace(profile_dir)
    vol = as_u8_volume(vol)
    if key is None:
        key = jax.random.key(cfg.seed)

    if _front is None:
        _front = _stack_front(vol, cfg, verbose=verbose, tracker=_tracker)
    front = _front
    tm = _StageTimer(verbose)
    tm.timings.update(front.timings)
    nodes, smap, tracker, field = front.nodes, front.smap, front.tracker, front.field
    pos, dirs, corr = front.pos, front.dirs, front.corr
    vx, vy, vz = front.vx, front.vy, front.vz
    j8_np = front.j8_np

    tm.start("tracing")
    committer = TraceCommitter(vol.shape, cfg.vol, cfg.nodepervol, nodes, smap)
    trace_count = 0
    idx = 0
    nseeds = len(pos)
    pending: List[int] = []  # selected-but-untraced seeds (cap-cut wave tail)
    if resume and checkpoint_path:
        from pnr_tpu.pipeline.checkpoint import load_checkpoint

        if not os.path.exists(checkpoint_path):
            raise FileNotFoundError(
                f"resume=True but no checkpoint at {checkpoint_path!r}"
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
    wave = max(1, cfg.wave_size)
    waves_done = 0
    while (pending or idx < nseeds) and trace_count <= cfg.max_trace_count:
        # gather the next wave of seeds that pass the (stale) suppression
        # check — suppression is monotone (visit counts only grow), so a
        # stale "blocked" is exact; resumed pending seeds go first (they
        # precede idx in the reference's seed order)
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
        trace_count, unstarted = _trace_and_commit_wave(
            tracker, committer, field, pos[sel], dirs[sel], sel, key, cfg, trace_count
        )
        pending = unstarted + pending
        waves_done += 1
        if checkpoint_path and waves_done % max(1, checkpoint_every_waves) == 0:
            from pnr_tpu.pipeline.checkpoint import save_checkpoint

            save_checkpoint(
                checkpoint_path, committer, idx, trace_count, pending, nseeds
            )
    tm.stop()
    if verbose:
        used = (100.0 * trace_count) / max(len(pos), 1)
        print(f"{used:.1f}% seeds used, |n0|={len(nodes)}")

    n0 = nodes
    midres = None
    if cfg.save_midres:
        midres = {
            "vx": fetch_volume(vx),
            "vy": fetch_volume(vy),
            "vz": fetch_volume(vz),
            "trace_density": np.clip(committer.npervol, 0, 255).astype(np.uint8),
        }
        if smap is not None:
            midres["smap8"] = smap_to_u8(smap)

    tm.start("reconstruct")
    tree = reconstruct_graph(n0.copy(), cfg, midres=midres)
    tm.stop()

    if profile_dir:
        jax.profiler.stop_trace()

    result = ReconstructionResult(
        tree=tree,
        n0=n0,
        seeds_pos=pos,
        seeds_corr=corr,
        trace_count=trace_count,
        timings=tm.timings,
        j8=j8_np,
        midres=midres,
        n_raw_seeds=front.n_raw_seeds,
        zncc_mode=cfg.zncc_mode,
    )
    from pnr_tpu.utils.exporters import low_signal_diagnostic

    warn = low_signal_diagnostic(result)
    if warn is not None:
        import sys as _sys

        _sys.stderr.write(f"WARNING low-signal: {warn['message']}\n")
    return result


def reconstruction_batch(
    vols,
    cfg: PNRConfig,
    verbose: bool = False,
    key: Optional[jax.Array] = None,
    prefetch: bool = True,
    prefetch_depth: int = 2,
):
    """Reconstruct a sequence of stacks, amortizing setup across them.

    The production serving loop (SURVEY.md section 2b data parallelism
    over stacks): one BatchedTracker — and therefore one set of jitted
    trace programs and one XLA compile per volume shape — is shared by
    every stack; each stack gets its own PRNG substream (fold_in by
    index, so results match individual runs with the same key only for
    index 0). Yields ReconstructionResult per input, in order.

    With `prefetch` (default), worker threads run the next stacks'
    device/link-heavy front halves (soma, Frangi, J8 fetch, seed
    extraction/scoring) WHILE the current stack traces and commits —
    a software pipeline. Results are bitwise-identical to
    prefetch=False: the front half is a pure function of (vol, cfg)
    and the back half consumes it unchanged; only wall-clock overlaps.
    `prefetch_depth` fronts run concurrently — on remote-tunneled
    runtimes the link pipelines concurrent transfers, so depth 2 also
    overlaps two stacks' uploads/fetches; each in-flight front holds
    its device buffers (volume, J8, direction maps, likelihood field),
    so reduce the depth for volumes near the HBM budget.
    """
    if key is None:
        key = jax.random.key(cfg.seed)
    trackers: Dict[bool, BatchedTracker] = {}

    def get_tracker(vol):
        is2d = vol.shape[0] == 1
        if is2d not in trackers:
            trackers[is2d] = BatchedTracker(cfg, is2d)
        return trackers[is2d]

    #: a feed may yield None to mean "no stack ready yet" (the watch
    #: server, pipeline/serve.py): the driver must not block on the
    #: feed while fronts are queued — a None is skipped, queued work
    #: keeps draining, and the feed is re-polled on the next top-up.
    #: The FEED owns any sleep/backoff before yielding None.
    _DONE = object()
    raw = iter(vols)
    idx = 0

    def pull():
        """Next (index, uint8 vol), None if the feed isn't ready, or
        _DONE when exhausted. None items do not consume an index."""
        nonlocal idx
        nxt = next(raw, _DONE)
        if nxt is _DONE or nxt is None:
            return nxt
        item = (idx, as_u8_volume(nxt))
        idx += 1
        return item

    if not prefetch:
        while True:
            item = pull()
            if item is _DONE:
                return
            if item is None:
                continue
            i, vol = item
            yield reconstruction_func(
                vol, cfg, verbose=verbose,
                key=jax.random.fold_in(key, i),
                _tracker=get_tracker(vol),
            )

    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    depth = max(1, int(prefetch_depth))
    #: each stack's front holds ~(3S+3)*4+2 bytes/voxel on device (tube
    #: field maps + direction volumes + img/J8); concurrent fronts plus
    #: the currently-tracing stack must share a 16 GB chip
    per_voxel = len(cfg.sigmas) * 12 + 14
    budget = 11 * (1 << 30)

    ex = ThreadPoolExecutor(max_workers=depth, thread_name_prefix="pnr-prefetch")
    try:
        def submit(item):
            i, vol = item
            tracker = get_tracker(vol)  # build on the main thread
            return i, vol, ex.submit(
                _stack_front, vol, cfg, verbose=verbose, tracker=tracker
            ), vol.size * per_voxel

        pending = pull()
        queue = deque()

        def topup(current_bytes):
            """Prefetch ahead while the in-flight fronts (queued + the
            stack currently tracing) fit the device budget; sized per
            VOLUME, so heterogeneous batches clamp on the big stacks.
            With nothing else in flight the next front always submits
            (an over-budget single stack can't do better). A not-ready
            feed (None) is polled AT MOST once per call, so top-ups in
            the middle of the pipeline never stall on arrivals."""
            nonlocal pending
            while len(queue) < depth:
                if pending is None:
                    pending = pull()  # one bounded re-poll of the feed
                if pending is None or pending is _DONE:
                    break
                nbytes = pending[1].size * per_voxel
                used = current_bytes + sum(q[3] for q in queue)
                if (queue or current_bytes) and used + nbytes > budget:
                    break
                queue.append(submit(pending))
                pending = pull()
                if pending is None:
                    break

        topup(0)
        while queue or pending is not _DONE:
            if not queue:
                # the previous stack's device buffers are freed once its
                # back half returned; an over-budget front submits here,
                # and a not-ready feed is re-polled (the feed sleeps)
                topup(0)
                if not queue:
                    continue
            i, vol, fut, nbytes = queue.popleft()
            front = fut.result()
            # keep the pipeline full before tracing the current stack
            topup(nbytes)
            yield reconstruction_func(
                vol, cfg, verbose=verbose,
                key=jax.random.fold_in(key, i),
                _front=front,
            )
    finally:
        ex.shutdown(wait=True, cancel_futures=True)


def reconstruct_graph(
    n0: NodeList, cfg: PNRConfig, midres: Optional[Dict] = None
) -> NodeList:
    """Post-processing sub-pipeline (`reconstruct`, Advantra_plugin.cpp:2096).

    With `midres` (a dict, filled in place), captures the per-stage
    snapshots the reference dumps under saveMidres
    (Advantra_plugin.cpp:2098-2141): n0/n0tree/n0res/n1/n2/n2tree node
    lists plus the n0len/n0corr/n1len statistics logs.
    """
    from pnr_tpu.graph.nodes import get_link_lengths, get_node_corr

    if midres is not None:
        midres["n0"] = n0.copy()
        midres["n0tree"] = bfs_forest(n0)
        midres["n0len"] = get_link_lengths(n0)
        midres["n0corr"] = get_node_corr(n0)
    interpolate_nodelist(n0, cfg.trace_rsmpl)
    if midres is not None:
        midres["n0res"] = n0.copy()
    n1 = non_blurring(n0, cfg.sig2radius, cfg.refine_iter, cfg.epsilon2)
    if midres is not None:
        midres["n1"] = n1.copy()
        midres["n1len"] = get_link_lengths(n1)
    n2 = group1(n1, cfg.group_radius)
    if midres is not None:
        midres["n2"] = n2.copy()
    n2tree = bfs_forest(n2)
    if midres is not None:
        midres["n2tree"] = n2tree.copy()
    if cfg.enforce_single_tree:
        n3 = extract_largest_tree(n2tree)
    else:
        n3 = extract_trees(n2tree, cfg.tree_size_min)
    if cfg.prune_tails:
        from pnr_tpu.graph.trees import remove_tails

        n3 = remove_tails(n3, cfg.tail_size_min)
    interpolate_treelist(n3, 1.0, AXON)
    return n3
