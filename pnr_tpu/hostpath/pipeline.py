"""Host one-shot reconstruction: the full pipeline with zero jax.

The small-volume fast path (VERDICT r4 item 1): a one-shot CLI
invocation on a laptop-sized stack must not pay jax import (~1.8 s),
remote-device init (up to minutes on tunneled runtimes), or XLA
compiles. This engine mirrors `pipeline.reconstruct.reconstruction_func`
(parity target Advantra_plugin.cpp:2183-2731 `reconstruction_func`)
stage for stage in NumPy/SciPy + the native C++ runtime:

  soma (erode -> xy gauss -> max-entropy th -> native 3-D CC)
  -> Frangi (hostpath.filters) -> J8 -> native MaximumFinder flood
  -> seed scoring (tube maps or native exact znccBBB) -> FCFS seed loop
  (HostTracer + the SAME TraceCommitter/native commit core the device
  path uses) -> graph post-processing (the same numpy graph modules,
  with the reference mean-shift).

Engine parity: PRNG streams are bit-exact with the device tracer
(hostpath/threefry.py); dense filters agree to f32 accumulation ulps;
the graph stage shares the device path's own modules. Gated in
tests/test_hostpath.py against the jax pipeline on phantoms.
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import numpy as np

from pnr_tpu.config import PNRConfig
from pnr_tpu.graph.build import TraceCommitter
from pnr_tpu.graph.nodes import SOMA, NodeList
from pnr_tpu.hostpath import filters, threefry as tf, tube
from pnr_tpu.hostpath.tracer import HostWaveTracer, compact_carry
from pnr_tpu import native


def _host_trace_and_commit_wave(
    tracer, committer, seed_pos, seed_dirs, seed_global_idx, base_key, cfg,
    trace_count,
):
    """Host mirror of pipeline.reconstruct._trace_and_commit_wave: staged
    lockstep wave + in-order FCFS commit wavefront + kill-back, with
    killed lanes COMPACTED out of the wave (the host's economy lever —
    a dead lane would otherwise still pay numpy compute every stage).
    PRNG keys on (trace id, absolute iteration): identical results to
    any other staging, and the same commit order as the reference
    (trackPos then trackNeg per seed, Advantra_plugin.cpp:2683-2693)."""
    ni = cfg.ni
    nb = len(seed_pos)
    t_real = 2 * nb
    sp = np.repeat(np.asarray(seed_pos, np.float32), 2, axis=0)
    sd = np.empty_like(sp)
    sd[0::2] = seed_dirs
    sd[1::2] = -np.asarray(seed_dirs)
    ids = np.empty(t_real, np.int64)
    ids[0::2] = 2 * np.asarray(seed_global_idx)
    ids[1::2] = 2 * np.asarray(seed_global_idx) + 1

    keys = np.stack([tf.fold_in(base_key, int(i)) for i in ids])

    stage = 4  # commit-feedback granularity: no launch overhead on host
    cursors = [committer.begin_trace() for _ in range(t_real)]
    killed = np.zeros(t_real, bool)
    seed_started = [False] * nb
    commit_ptr = 0

    est = np.zeros((t_real, ni, 9), np.float32)
    carry, est0 = tracer.trace_init(sp, sd, keys)
    est[:, 0] = est0
    it_done = 1

    def advance_commits(avail: int) -> bool:
        nonlocal commit_ptr, trace_count
        while commit_ptr < t_real:
            k = commit_ptr
            si = k // 2
            if k % 2 == 0 and not seed_started[si]:
                if trace_count > cfg.max_trace_count:
                    return True
                seed_started[si] = True
                if not committer.seed_allowed(seed_pos[si]):
                    killed[k] = killed[k + 1] = True
                    cursors[k]["finished"] = cursors[k + 1]["finished"] = True
                    commit_ptr += 2
                    continue
                trace_count += 1
            cur = cursors[k]
            committer.commit_steps(
                cur, est[k, :, 0:3], est[k, :, 3:6], est[k, :, 6],
                est[k, :, 7], est[k, :, 8], avail,
            )
            if cur["finished"] or cur["i"] >= ni:
                committer.finish_trace(cur)
                killed[k] = True
                commit_ptr += 1
            else:
                break
        return False

    # lanes still computing (compacted view indices into est)
    lanes = np.arange(t_real)
    while True:
        capped = advance_commits(it_done)
        if commit_ptr >= t_real or it_done >= ni or capped:
            break
        active = ~killed[lanes]
        # a lane whose own estimate chain went invalid is equally done
        active &= carry[5]
        if not active.all():
            if not active.any():
                break
            carry = compact_carry(carry, active)
            lanes = lanes[active]
        n_it = min(stage, ni - it_done)
        carry, packed = tracer.trace_stage(
            keys[lanes], carry, range(it_done, it_done + n_it)
        )
        est[lanes, it_done : it_done + n_it] = packed
        it_done += n_it

    advance_commits(ni)
    return trace_count


def _maxentropy_th(img: np.ndarray) -> int:
    """NumPy Kapur max-entropy threshold (ops.thresholds.maxentropy_th)."""
    _FLT_MIN = 1.175494e-38
    hist = np.bincount(img.reshape(-1), minlength=256).astype(np.float32)
    p = hist / hist.sum()
    pt = np.cumsum(p)
    plogp = np.where(p > _FLT_MIN, p * np.log(np.maximum(p, _FLT_MIN)), 0.0)
    cum = np.cumsum(plogp)
    total = cum[-1]
    hb = np.where(pt > _FLT_MIN, -cum / np.maximum(pt, _FLT_MIN) + np.log(np.maximum(pt, _FLT_MIN)), 0.0)
    ptw = 1.0 - pt
    rest = total - cum
    hw = np.where(ptw > _FLT_MIN, -rest / np.maximum(ptw, _FLT_MIN) + np.log(np.maximum(ptw, _FLT_MIN)), 0.0)
    return int(np.argmax(hb + hw))


def _soma_extraction_host(vol: np.ndarray, cfg: PNRConfig, nodes: NodeList):
    """Host soma path (pipeline.reconstruct.soma_extraction semantics)."""
    import math

    from scipy.ndimage import minimum_filter1d

    half = int(math.ceil(cfg.somaradius))
    size = 2 * half + 1
    e8 = minimum_filter1d(vol, size, axis=2, mode="nearest")
    e8 = minimum_filter1d(e8, size, axis=1, mode="nearest")
    # xy gaussian with float accumulation, clipped back to u8
    k = filters.gaussian_kernel(float(cfg.somaradius))
    f = filters.conv1d(e8, k, 2)
    f = filters.conv1d(f, k, 1)
    e8 = np.clip(f, 0.0, 255.0).astype(np.uint8)
    th = _maxentropy_th(e8)
    e8bin = np.where(e8 > th, 255, 0).astype(np.uint8)
    labels, regions = native.conn3d(e8bin, value_over=0, min_size=1, diagonal=True)
    base = len(nodes) - 1
    for r in range(len(regions)):
        nodes.add(
            regions[r, 0], regions[r, 1], regions[r, 2],
            sig=regions[r, 3], ntype=SOMA,
        )
    return np.where(labels > 0, labels + base, 0).astype(np.int32)


def _decode_dirs(vx, vy, vz, pos: np.ndarray) -> np.ndarray:
    """Quantized Frangi direction decode at seed voxels (seed.cpp:767-771)."""
    if len(pos) == 0:
        return np.zeros((0, 3), np.float32)
    xi = pos[:, 0].astype(np.int64)
    yi = pos[:, 1].astype(np.int64)
    zi = pos[:, 2].astype(np.int64)
    u = np.stack([vx[zi, yi, xi], vy[zi, yi, xi], vz[zi, yi, xi]], axis=-1)
    u = (u.astype(np.float32) / 255.0) * 2.0 - 1.0
    n = np.linalg.norm(u, axis=-1, keepdims=True)
    return (u / np.where(n > 0, n, 1.0)).astype(np.float32)


def _max_points_host(j8: np.ndarray, tolerance: float) -> np.ndarray:
    """seeds.extract.max_points_host without the jax-importing module."""
    mask = native.max_finder_stack(j8, float(tolerance))
    if mask is not None:
        return mask
    mask = np.zeros(j8.shape, bool)
    for z in range(j8.shape[0]):
        pts = native.max_finder_2d(j8[z], tolerance)
        if len(pts):
            mask[z, pts[:, 1], pts[:, 0]] = True
    return mask


def host_reconstruct_graph(n0: NodeList, cfg: PNRConfig) -> NodeList:
    """pipeline.reconstruct.reconstruct_graph with the reference
    (scalar numpy) mean-shift instead of the device one — the only
    jax-touching stage of the graph sub-pipeline."""
    import numpy as _np

    from pnr_tpu.graph.refine import (
        group1,
        interpolate_nodelist,
        non_blurring_reference,
    )
    from pnr_tpu.graph.trees import (
        bfs_forest,
        extract_largest_tree,
        extract_trees,
        interpolate_treelist,
        remove_tails,
    )
    from pnr_tpu.graph.nodes import AXON

    interpolate_nodelist(n0, cfg.trace_rsmpl)
    conv = None
    if len(n0) > 1 and native.have_native():
        p4 = _np.stack(
            [_np.asarray(n0.x[1:], _np.float32),
             _np.asarray(n0.y[1:], _np.float32),
             _np.asarray(n0.z[1:], _np.float32),
             _np.asarray(n0.sig[1:], _np.float32)], axis=-1,
        )
        conv = native.mean_shift_grid(
            p4, float(cfg.sig2radius), int(cfg.refine_iter), float(cfg.epsilon2)
        )
    if conv is not None:
        n1 = n0.copy()
        n1.x[1:] = conv[:, 0].astype(float).tolist()
        n1.y[1:] = conv[:, 1].astype(float).tolist()
        n1.z[1:] = conv[:, 2].astype(float).tolist()
        n1.sig[1:] = conv[:, 3].astype(float).tolist()
    else:
        n1 = non_blurring_reference(n0, cfg.sig2radius, cfg.refine_iter, cfg.epsilon2)
    n2 = group1(n1, cfg.group_radius)
    n2tree = bfs_forest(n2)
    if cfg.enforce_single_tree:
        n3 = extract_largest_tree(n2tree)
    else:
        n3 = extract_trees(n2tree, cfg.tree_size_min)
    if cfg.prune_tails:
        n3 = remove_tails(n3, cfg.tail_size_min)
    interpolate_treelist(n3, 1.0, AXON)
    return n3


def host_reconstruction_func(
    vol: np.ndarray, cfg: PNRConfig, verbose: bool = True
):
    """One-shot host reconstruction; returns an object with the same
    salient fields as pipeline.ReconstructionResult (tree, n0,
    seeds_pos, seeds_corr, trace_count, timings, j8)."""
    import dataclasses

    timings: Dict[str, float] = {}

    def _stage(name):
        class _T:
            def __enter__(self_):
                if verbose:
                    print(f"{name}... ", end="", flush=True)
                self_.t0 = time.perf_counter()

            def __exit__(self_, *a):
                dt = time.perf_counter() - self_.t0
                timings[name] = timings.get(name, 0.0) + dt
                if verbose:
                    print(f"{dt:.3f} sec.")

        return _T()

    vol = np.ascontiguousarray(vol)
    if vol.dtype != np.uint8:
        vol = np.clip(vol, 0, 255).astype(np.uint8)
    if vol.ndim == 2:
        vol = vol[None]
    is2d = vol.shape[0] == 1
    nodes = NodeList()
    smap = None

    if cfg.somaradius > 0:
        with _stage("soma extraction"):
            smap = _soma_extraction_host(vol, cfg, nodes)

    with _stage("frangi"):
        if is2d:
            j, jmin, jmax, vx, vy, vz = filters.frangi2d(
                vol[0], cfg.sigmas, cfg.frangi_betaone, cfg.frangi_betatwo
            )
            j, vx, vy, vz = j[None], vx[None], vy[None], vz[None]
        else:
            j, jmin, jmax, vx, vy, vz = filters.frangi3d(
                vol, cfg.sigmas, cfg.zdist,
                cfg.frangi_alpha, cfg.frangi_beta, cfg.frangi_c,
            )
        j8 = filters.normalize_to_u8(j, jmin, jmax)

    with _stage("seed extraction"):
        mask = _max_points_host(j8, float(cfg.tolerance))
        zz, yy, xx = np.nonzero(mask)
        pos = np.stack([xx, yy, zz], axis=-1).astype(np.float32)
        n_raw_seeds = len(pos)
        dirs = _decode_dirs(vx, vy, vz, pos)

    with _stage("seed selection & sorting"):
        from pnr_tpu.ops.zncc_model import TubeZnccModel, ZnccTemplates

        if cfg.zncc_mode == "tube":
            model = TubeZnccModel(cfg.sigmas, is2d)
            maps = tube.build_tube_maps(vol, model)
            _zfn = tube.make_tube_zncc_fn(model)

            def zncc_fn(p, d):
                return _zfn(maps, p, d)

        else:
            templates = ZnccTemplates(cfg.sigmas, is2d)
            zncc_fn = _make_exact_zncc_host(vol, templates)

        if len(pos) and smap is not None:
            xi = np.floor(pos[:, 0] + 0.5).astype(int)
            yi = np.floor(pos[:, 1] + 0.5).astype(int)
            zi = np.floor(pos[:, 2] + 0.5).astype(int)
            outside = smap[zi, yi, xi] == 0
            pos, dirs = pos[outside], dirs[outside]
        if len(pos):
            corr, _ = zncc_fn(pos, dirs)
            keep = corr >= cfg.znccth
            pos, dirs, corr = pos[keep], dirs[keep], corr[keep]
            order = np.argsort(-corr, kind="stable")
            pos, dirs, corr = pos[order], dirs[order], corr[order]
        else:
            corr = np.zeros(0, np.float32)

    with _stage("tracing"):
        tracer = HostWaveTracer(cfg, is2d, zncc_fn, vol.shape)
        committer = TraceCommitter(vol.shape, cfg.vol, cfg.nodepervol, nodes, smap)
        base_key = tf.key_from_seed(cfg.seed)
        trace_count = 0
        nseeds = len(pos)
        idx = 0
        # Host wave sizing: speculative lanes cost REAL CPU here (on the
        # device they are nearly free), and the FCFS result is
        # wave-invariant (same n0 at every size — tested). Exact mode's
        # per-query cost is ~85x tube's, so speculation past the commit
        # wavefront dominates: measured at the bench config (sigmas
        # 2,4,6, 1.18 Mvox), tracing falls 17.2 s -> 3.1 s going wave
        # 128 -> 2. Tube queries are cheap and NumPy per-op overhead
        # dominates instead, so tube keeps the configured wave.
        wave = max(1, cfg.wave_size if cfg.zncc_mode == "tube" else 2)
        while idx < nseeds and trace_count <= cfg.max_trace_count:
            batch = []
            while idx < nseeds and len(batch) < wave:
                if committer.seed_allowed(pos[idx]):
                    batch.append(idx)
                idx += 1
            if not batch:
                break
            sel = np.asarray(batch)
            trace_count = _host_trace_and_commit_wave(
                tracer, committer, pos[sel], dirs[sel], sel, base_key, cfg,
                trace_count,
            )

    n0 = nodes
    with _stage("reconstruct"):
        tree = host_reconstruct_graph(n0.copy(), cfg)

    @dataclasses.dataclass
    class HostResult:
        tree: NodeList
        n0: NodeList
        seeds_pos: np.ndarray
        seeds_corr: np.ndarray
        trace_count: int
        timings: Dict[str, float]
        j8: Optional[np.ndarray] = None
        midres: Optional[Dict] = None
        n_raw_seeds: int = -1
        zncc_mode: str = ""

    result = HostResult(
        tree=tree, n0=n0, seeds_pos=pos, seeds_corr=corr,
        trace_count=trace_count, timings=timings, j8=j8,
        n_raw_seeds=n_raw_seeds, zncc_mode=cfg.zncc_mode,
    )
    from pnr_tpu.utils.exporters import low_signal_diagnostic

    warn = low_signal_diagnostic(result)
    if warn is not None:
        import sys as _sys

        _sys.stderr.write(f"WARNING low-signal: {warn['message']}\n")
    return result


def _make_exact_zncc_host(vol: np.ndarray, templates):
    """Exact znccBBB on host: native C++ kernel when built, vectorized
    NumPy gather fallback (ops.zncc semantics — tracker.cpp:1891-1964)."""
    f = vol.astype(np.float32)

    native_fn = getattr(native, "zncc_exact_queries", None)
    if native.have_native() and native_fn is not None:

        def fn(pos, dirs):
            return native_fn(f, templates, pos, dirs)

        return fn

    from pnr_tpu.hostpath.tube import trilinear

    offs = templates.offs  # (S, K, 3) in (v, u, w) local frame
    wgt = templates.wgt
    msk = templates.mask
    cnt = templates.cnt
    avg = templates.avg
    corrc = templates.corrc
    sigmas = templates.sigmas
    _FLT_MIN = 1.175494e-38

    def fn(pos, dirs):
        pos = np.asarray(pos, np.float32)
        dirs = np.asarray(dirs, np.float32)
        n = pos.shape[0]
        vx, vy, vz = dirs[:, 0], dirs[:, 1], dirs[:, 2]
        # local frame (ops.zncc.local_frame, tracker.cpp:1893-1917)
        nrm = np.sqrt(vx * vx + vy * vy)
        planar = nrm > 1e-4
        safe = np.where(planar, nrm, 1.0)
        sg = np.where(vy < 0, -1.0, 1.0)
        ux = np.where(planar, sg * (vy / safe), 1.0).astype(np.float32)
        uy = np.where(planar, -sg * (vx / safe), 0.0).astype(np.float32)
        uz = np.zeros_like(ux)
        if templates.is2d:
            wx = wy = wz = np.zeros_like(ux)
        else:
            wx = uy * vz - uz * vy
            wy = -ux * vz + uz * vx
            wz = ux * vy - uy * vx
        best_corr = np.full(n, -np.inf, np.float32)
        best_sig = np.ones(n, np.float32)
        for si in range(len(sigmas)):
            o = offs[si]  # (K, 3): v, u, w components
            k = o.shape[0]
            px = (pos[:, 0:1] - o[None, :, 0] * vx[:, None]
                  + o[None, :, 1] * ux[:, None] + o[None, :, 2] * wx[:, None])
            py = (pos[:, 1:2] - o[None, :, 0] * vy[:, None]
                  + o[None, :, 1] * uy[:, None] + o[None, :, 2] * wy[:, None])
            pz = (pos[:, 2:3] - o[None, :, 0] * vz[:, None]
                  + o[None, :, 1] * uz[:, None] + o[None, :, 2] * wz[:, None])
            val = trilinear(f, px, py, pz) * msk[si][None, :]
            ag = val.sum(axis=1) / cnt[si]
            dv = (val - ag[:, None]) * msk[si][None, :]
            dw = (wgt[si] - avg[si]) * msk[si]
            corra = (dv * dw[None, :]).sum(axis=1)
            corrb = (dv * dv).sum(axis=1)
            denom = corrb * corrc[si]
            with np.errstate(invalid="ignore", divide="ignore"):
                corr = np.where(
                    denom > _FLT_MIN,
                    corra / np.sqrt(np.maximum(denom, _FLT_MIN)),
                    0.0,
                ).astype(np.float32)
            take = corr > best_corr
            best_corr = np.where(take, corr, best_corr)
            best_sig = np.where(take, np.float32(sigmas[si]), best_sig)
        return best_corr, best_sig

    return fn
