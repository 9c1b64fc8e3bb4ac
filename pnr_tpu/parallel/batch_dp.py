"""Data parallelism over stacks: one stack per device (SURVEY.md §2b).

`reconstruction_batch` (pipeline/reconstruct.py) shares compiles across
a stream of stacks but runs them strictly sequentially. This module
maps a BATCH of equal-shape stacks over a 1-D device mesh — stack i on
device i — so the dense stages (Frangi + J8 + tube maps) and every SMC
trace wave run for ALL stacks in single launches:

* batched filter: one shard_map launch computes every stack's
  vesselness (no cross-device communication — the batch axis is
  embarrassingly parallel, collectives never enter);
* batched likelihood fields: each device builds its own stack's field
  once (tube map stack or raw volume);
* batched tracing: per wave, every device traces its own stack's seed
  batch in lockstep; commits run per stack on the host between waves,
  preserving the reference's first-come-first-served suppression
  semantics per stack exactly.

PRNG: stack i uses fold_in(key, i) and per-trace fold_in(trace_id) —
the same streams as `reconstruction_batch`, so the SWCs are identical
to sequential runs (asserted in tests/test_parallel.py). On this
1-core container the virtual CPU mesh cannot show wall-clock scaling;
the structural win is B stacks per launch (device-program count drops by
the batch factor), which is the scaling axis on a real multi-chip
mesh.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from pnr_tpu.config import PNRConfig
from pnr_tpu.io.volume import as_u8_volume
from pnr_tpu.graph.build import TraceCommitter
from pnr_tpu.graph.nodes import NodeList
from pnr_tpu.pipeline.reconstruct import (
    ReconstructionResult,
    reconstruct_graph,
    soma_extraction,
)


def build_batch_filter(cfg: PNRConfig, mesh, is2d: bool = False):
    """One launch: per-device Frangi + J8 over a (B, Z, Y, X) batch.

    P == 1 stacks run the 2-D filter (frangi2d, incl. its eigen-swap
    quirk) — the multi-device axis for 2-D workloads IS the batch
    (one image per device); there is no volume axis to shard."""
    from pnr_tpu.ops.frangi import frangi2d, frangi3d, normalize_to_u8

    axis = mesh.axis_names[0]

    def local_fn(v):
        if is2d:
            j, jmin, jmax, vx, vy, vz = frangi2d(
                v[0, 0], cfg.sigmas, cfg.frangi_betaone, cfg.frangi_betatwo
            )
            j, vx, vy, vz = j[None], vx[None], vy[None], vz[None]
        else:
            j, jmin, jmax, vx, vy, vz = frangi3d(
                v[0], cfg.sigmas, cfg.zdist,
                cfg.frangi_alpha, cfg.frangi_beta, cfg.frangi_c,
            )
        j8 = normalize_to_u8(j, jmin, jmax)
        return j8[None], vx[None], vy[None], vz[None]

    fn = shard_map(
        local_fn, mesh=mesh, in_specs=P(axis), out_specs=(P(axis),) * 4,
        check_vma=False,  # Pallas conv inside frangi3d
    )
    return jax.jit(fn)


def build_batch_fields(tracker, mesh):
    """One launch: per-device likelihood field (tube maps / raw volume)."""
    axis = mesh.axis_names[0]

    def local_fn(v):
        return tracker.prepare_field(v[0])[None]

    fn = shard_map(
        local_fn, mesh=mesh, in_specs=P(axis), out_specs=P(axis),
        check_vma=False,  # tube-map Pallas kernels inside
    )
    return jax.jit(fn)


def build_batch_tracer(tracker, cfg: PNRConfig, mesh, lanes: int):
    """Staged batched tracer: (init, stage). Each device traces its own
    stack's `lanes` trace lanes; the kill mask gives the host's commit
    wavefront the same stop-early economy as the single-stack path."""
    axis = mesh.axis_names[0]

    def init_local(field, sp, sd, key_data, valid):
        keys = jax.vmap(jax.random.wrap_key_data)(key_data)
        carry, est0 = tracker._trace_init(field[0], sp, sd, keys)
        est0 = est0.at[:, 8].multiply(valid.astype(jnp.float32))
        return carry, est0

    def stage_local(field, carry, key_data, iter_idx, kill):
        keys = jax.vmap(jax.random.wrap_key_data)(key_data)
        carry, packed = tracker._trace_stage(field[0], keys, carry, iter_idx, kill)
        return carry, packed

    cspec = (P(axis),) * 6
    init_fn = shard_map(
        init_local,
        mesh=mesh,
        in_specs=(P(axis),) * 5,
        out_specs=(cspec, P(axis)),
        check_vma=False,  # tube-map / exact Pallas kernels inside
    )
    stage_fn = shard_map(
        stage_local,
        mesh=mesh,
        in_specs=(P(axis), cspec, P(axis), P(None), P(axis)),
        out_specs=(cspec, P(axis)),
        check_vma=False,  # tube-map / exact Pallas kernels inside
    )
    return jax.jit(init_fn), jax.jit(stage_fn)


def reconstruction_batch_dp(
    vols,
    cfg: PNRConfig,
    mesh,
    verbose: bool = False,
    key: Optional[jax.Array] = None,
    _key_offset: int = 0,
) -> List[ReconstructionResult]:
    """Reconstruct up to `mesh.size` equal-shape stacks, one per device.

    Returns results in input order; SWCs equal `reconstruction_batch`
    run with the same key. Soma extraction (host CC) and the graph
    stages stay per-stack on the host.
    """
    from pnr_tpu import native
    from pnr_tpu.pipeline.reconstruct import _StageTimer, _score_seeds
    from pnr_tpu.seeds.extract import decode_directions_device, max_points_device, max_points_host
    from pnr_tpu.smc.tracker import BatchedTracker

    vols = [as_u8_volume(v) for v in vols]
    n_dev = int(mesh.devices.size)
    if not vols:
        return []
    shape = vols[0].shape
    if any(v.shape != shape for v in vols):
        raise ValueError("reconstruction_batch_dp requires equal-shape stacks")
    if key is None:
        key = jax.random.key(cfg.seed)
    if len(vols) > n_dev:
        # recurse in mesh-size groups; stack PRNG substreams keep their
        # GLOBAL index (fold_in(key, i)) so SWCs equal sequential runs
        out = []
        for beg in range(0, len(vols), n_dev):
            out.extend(
                reconstruction_batch_dp(
                    vols[beg : beg + n_dev], cfg, mesh, verbose,
                    key=key, _key_offset=_key_offset + beg,
                )
            )
        return out
    nb = len(vols)
    # pad the batch to the mesh size with copies of stack 0 (discarded)
    batch = np.stack(vols + [vols[0]] * (n_dev - nb))
    axis = mesh.axis_names[0]
    sharding = NamedSharding(mesh, P(axis))
    vb = jax.device_put(jnp.asarray(batch), sharding)

    tm = _StageTimer(verbose)
    is2d = shape[0] == 1
    tracker = BatchedTracker(cfg, is2d)

    # soma (host, per stack)
    nodes = [NodeList() for _ in range(nb)]
    smaps = [None] * nb
    if cfg.somaradius > 0:
        tm.start("soma extraction (batch)")
        for i in range(nb):
            smaps[i] = soma_extraction(vols[i], cfg, nodes[i])
        tm.stop()

    tm.start("frangi (batch)")
    filt = build_batch_filter(cfg, mesh, is2d)
    j8b, vxb, vyb, vzb = filt(vb)
    j8_np = np.asarray(j8b)
    tm.stop()

    tm.start("fields (batch)")
    fields = build_batch_fields(tracker, mesh)(vb)
    tm.stop()

    tm.start("seeds + scoring (batch)")
    per_stack = []
    for i in range(nb):
        if native.have_native():
            mask = max_points_host(j8_np[i], float(cfg.tolerance))
        else:
            mask = np.asarray(max_points_device(j8b[i], float(cfg.tolerance)))
        zz, yy, xx = np.nonzero(mask)
        pos = np.stack([xx, yy, zz], axis=-1).astype(np.float32)
        dirs = np.asarray(
            decode_directions_device(vxb[i], vyb[i], vzb[i], pos)
        )
        if smaps[i] is not None and len(pos):
            zi = np.floor(pos[:, 2] + 0.5).astype(int)
            yi = np.floor(pos[:, 1] + 0.5).astype(int)
            xi = np.floor(pos[:, 0] + 0.5).astype(int)
            out = smaps[i][zi, yi, xi] == 0
            pos, dirs = pos[out], dirs[out]
        if len(pos):
            corr = _score_seeds(fields[i], pos, dirs, tracker)
            keep = corr >= cfg.znccth
            pos, dirs, corr = pos[keep], dirs[keep], corr[keep]
            order = np.argsort(-corr, kind="stable")
            pos, dirs, corr = pos[order], dirs[order], corr[order]
        else:
            corr = np.zeros(0, np.float32)
        per_stack.append((pos, dirs, corr))
    tm.stop()

    tm.start("tracing (batch, lockstep waves)")
    wave = max(1, cfg.wave_size)
    lanes = 2 * wave
    init, stage = build_batch_tracer(tracker, cfg, mesh, lanes)
    stage_iters = tracker.STAGE_ITERS
    ni = cfg.ni
    committers = [
        TraceCommitter(shape, cfg.vol, cfg.nodepervol, nodes[i], smaps[i])
        for i in range(nb)
    ]
    stack_keys = [jax.random.fold_in(key, _key_offset + i) for i in range(n_dev)]
    idxs = [0] * nb
    trace_counts = [0] * nb

    def next_wave(i):
        """Select stack i's next wave of allowed seeds (None when done)."""
        pos = per_stack[i][0]
        batch_sel = []
        while idxs[i] < len(pos) and len(batch_sel) < wave:
            if trace_counts[i] > cfg.max_trace_count:
                return None
            if committers[i].seed_allowed(pos[idxs[i]]):
                batch_sel.append(idxs[i])
            idxs[i] += 1
        return batch_sel or None

    active = list(range(nb))
    while active:
        waves = {}
        for i in list(active):
            w = next_wave(i)
            if w is None:
                active.remove(i)
            else:
                waves[i] = np.asarray(w)
        if not waves:
            break
        # assemble the (n_dev, lanes) batch; inactive devices get dead lanes
        sp = np.zeros((n_dev, lanes, 3), np.float32)
        sd = np.zeros((n_dev, lanes, 3), np.float32)
        sd[..., 0] = 1.0
        valid = np.zeros((n_dev, lanes), bool)
        tids = np.zeros((n_dev, lanes), np.int64)
        for i, sel in waves.items():
            pos, dirs, _ = per_stack[i]
            t_real = 2 * len(sel)
            sp[i, :t_real] = np.repeat(pos[sel], 2, axis=0)
            sd[i, 0:t_real:2] = dirs[sel]
            sd[i, 1:t_real:2] = -dirs[sel]
            tids[i, 0:t_real:2] = 2 * sel
            tids[i, 1:t_real:2] = 2 * sel + 1
            valid[i, :t_real] = True
        key_data = np.stack(
            [
                np.asarray(
                    jax.vmap(
                        lambda t, k=stack_keys[i]: jax.random.key_data(
                            jax.random.fold_in(k, t)
                        )
                    )(jnp.asarray(tids[i], jnp.uint32))
                )
                for i in range(n_dev)
            ]
        )
        carry, est0 = init(
            fields,
            jnp.asarray(sp.reshape(n_dev * lanes, 3)),
            jnp.asarray(sd.reshape(n_dev * lanes, 3)),
            jnp.asarray(key_data.reshape(n_dev * lanes, -1)),
            jnp.asarray(valid.reshape(-1)),
        )
        est = np.zeros((n_dev, lanes, ni, 9), np.float32)
        est[:, :, 0] = np.asarray(est0).reshape(n_dev, lanes, 9)

        cursors = {
            (i, int(t)): committers[i].begin_trace()
            for i, sel in waves.items()
            for t in np.concatenate([2 * sel, 2 * sel + 1])
        }
        finished = {k: False for k in cursors}
        commit_orders = {
            i: [t for s in sel for t in (2 * int(s), 2 * int(s) + 1)]
            for i, sel in waves.items()
        }
        commit_ptrs = {i: 0 for i in waves}
        seed_started = {i: set() for i in waves}
        kill = np.zeros((n_dev, lanes), bool)
        kill[~valid.reshape(n_dev, lanes)] = True

        def advance(i, avail):
            order = commit_orders[i]
            while commit_ptrs[i] < len(order):
                tid = order[commit_ptrs[i]]
                si = tid // 2
                if tid % 2 == 0 and si not in seed_started[i]:
                    if trace_counts[i] > cfg.max_trace_count:
                        return
                    seed_started[i].add(si)
                    if not committers[i].seed_allowed(per_stack[i][0][si]):
                        for t2 in (tid, tid + 1):
                            finished[(i, t2)] = True
                            lane = np.nonzero(tids[i] == t2)[0]
                            kill[i, lane] = True
                        commit_ptrs[i] += 2
                        continue
                    trace_counts[i] += 1
                cur = cursors[(i, tid)]
                lane = int(np.nonzero((tids[i] == tid) & valid[i])[0][0])
                e = est[i, lane]
                committers[i].commit_steps(
                    cur, e[:, 0:3], e[:, 3:6], e[:, 6], e[:, 7], e[:, 8], avail
                )
                if cur["finished"] or cur["i"] >= ni:
                    committers[i].finish_trace(cur)
                    finished[(i, tid)] = True
                    kill[i, lane] = True
                    commit_ptrs[i] += 1
                else:
                    break

        it_done = 1
        while True:
            for i in waves:
                advance(i, it_done)
            all_done = all(
                commit_ptrs[i] >= len(commit_orders[i]) for i in waves
            )
            if all_done or it_done >= ni:
                break
            n_it = min(stage_iters, ni - it_done)
            carry, packed = stage(
                fields, carry,
                jnp.asarray(key_data.reshape(n_dev * lanes, -1)),
                jnp.arange(it_done, it_done + stage_iters),
                jnp.asarray(kill.reshape(-1)),
            )
            est[:, :, it_done : it_done + n_it] = np.asarray(packed).reshape(
                n_dev, lanes, stage_iters, 9
            )[:, :, :n_it]
            it_done += n_it
        for i in waves:
            advance(i, it_done)
    tm.stop()

    results = []
    tm.start("reconstruct (batch)")
    for i in range(nb):
        tree = reconstruct_graph(nodes[i].copy(), cfg)
        results.append(
            ReconstructionResult(
                tree=tree,
                n0=nodes[i],
                seeds_pos=per_stack[i][0],
                seeds_corr=per_stack[i][2],
                trace_count=trace_counts[i],
                timings=dict(tm.timings),
                j8=j8_np[i],
            )
        )
    tm.stop()
    return results


def split_mesh(mesh, groups: int):
    """Split a 1-D mesh into `groups` equal contiguous 1-D submeshes."""
    from jax.sharding import Mesh

    n_dev = int(mesh.devices.size)
    if groups < 1 or n_dev % groups:
        raise ValueError(
            f"split_mesh: {groups} groups must divide the {n_dev}-device mesh"
        )
    k = n_dev // groups
    axis = mesh.axis_names[0]
    devs = mesh.devices.reshape(-1)
    return [Mesh(devs[g * k : (g + 1) * k], (axis,)) for g in range(groups)]


def reconstruction_batch_sharded(
    vols,
    cfg: PNRConfig,
    mesh,
    groups: Optional[int] = None,
    verbose: bool = False,
) -> List[ReconstructionResult]:
    """DP x spatial composition (SURVEY.md §2b, both axes at once).

    Splits the mesh's devices into `groups` equal spatial submeshes and
    streams the stack batch through them: group g runs the FULL
    spatially-sharded pipeline (`reconstruction_func_sharded` — halo
    Frangi, per-shard seeds, boundary-handoff tracing) on its own
    submesh while the other groups process other stacks concurrently,
    each driven by its own host thread (device work overlaps across
    disjoint device sets; the per-wave host commit is cheap and
    interleaves). Unlike `reconstruction_batch_dp`, a stack need not
    fit one device — this is the serving layout for batches of
    larger-than-HBM stacks.

    `groups` defaults to the largest divisor of the mesh size that is
    <= len(vols). Results return in input order and are IDENTICAL to
    sequential `reconstruction_func_sharded` runs on a same-size mesh
    (each stack's PRNG streams derive from cfg.seed exactly as there;
    scheduling cannot reorder anything within a stack).
    """
    import queue
    import threading

    from pnr_tpu.pipeline.sharded_reconstruct import reconstruction_func_sharded

    vols = [as_u8_volume(v) for v in vols]
    if not vols:
        return []
    n_dev = int(mesh.devices.size)
    if groups is None:
        groups = max(g for g in range(1, min(len(vols), n_dev) + 1) if n_dev % g == 0)
    submeshes = split_mesh(mesh, groups)

    q: "queue.SimpleQueue[int]" = queue.SimpleQueue()
    for i in range(len(vols)):
        q.put(i)
    results: List[Optional[ReconstructionResult]] = [None] * len(vols)
    errors: List[BaseException] = []

    def worker(g: int):
        try:
            while True:
                try:
                    i = q.get_nowait()
                except queue.Empty:
                    return
                results[i] = reconstruction_func_sharded(
                    vols[i], cfg, submeshes[g], verbose=verbose
                )
        except BaseException as e:  # surface to the caller
            errors.append(e)

    threads = [
        threading.Thread(target=worker, args=(g,), daemon=True)
        for g in range(groups)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if errors:
        raise errors[0]
    return results  # type: ignore[return-value]
