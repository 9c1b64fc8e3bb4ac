"""Distributed tracing with boundary handoff between Z-shards.

`build_local_trace_step` (parallel/sharded.py) truncates a trace at the
edge of its shard's halo. This module migrates the FULL particle-filter
state instead: every `stage_iters` iterations each shard inspects its
traces' centroids, and a trace whose centroid crossed into a
neighbouring Z-slab ships its entire carry (particle positions,
directions, weights, resampling state, PRNG key, trace id) to that
neighbour over ICI (`lax.ppermute`) and continues there in lockstep.

Because every shard advances the same absolute iteration range each
stage and the PRNG streams key on (trace id, absolute iteration), a
migrated trace consumes exactly the stream it would have on a single
device — the distributed trace is BITWISE equal to the single-device
trace provided each trace's template samples stay inside exact map
territory, i.e.

    trace_halo >= conv_reach + sample_reach + stage_iters * 2 * step

(conv_reach: the tube-map convolutions see clamped borders inside the
halo-padded slab, exact at >= ceil(3*sigma_max) from the padded edge;
sample_reach: template line extent + interpolation margin; the last
term bounds centroid drift between handoff opportunities).

Lane management (zero loss): each shard owns a fixed batch of T lanes.
Before any state moves, the shards run a capacity handshake — per-
direction mover counts travel to the receiving neighbour, the receiver
grants up to its free-lane count (up-arrivals first, then down), and
the grants travel back — so a sender only releases traces the receiver
can seat. Movers that exceed capacity STAY on their shard and keep
tracing against the halo-padded slab (counted in `kept_local`): beyond
the drift budget their samples may read approximate map territory near
the halo edge, a bounded divergence instead of the trace silently
vanishing. They retry migration at the next stage.

The staged API (`build_handoff_tracer`) exposes (init, stage) so the
host can commit estimates between stages and feed a kill mask back —
the same stop-early compute economy as the single-device staged wave
(pipeline/reconstruct.py): killed lanes cost no further device work and
their lanes free up for arrivals. `build_handoff_trace_step` keeps the
one-shot all-stages API on top of it.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import PartitionSpec as P
from jax import shard_map

from pnr_tpu.config import PNRConfig
from pnr_tpu.parallel.halo import halo_exchange_z


def required_trace_halo(cfg: PNRConfig, stage_iters: int) -> int:
    """Minimum halo for bitwise single-device equality (see module doc)."""
    smax = max(cfg.sigmas)
    conv_reach = int(math.ceil(3.0 * smax))
    sample_reach = int(math.ceil(1.0 * smax)) + 2
    drift = stage_iters * 2 * cfg.step
    return conv_reach + sample_reach + drift


def build_handoff_tracer(
    cfg: PNRConfig,
    mesh,
    lanes_per_shard: int,
    stage_iters: int = 4,
    trace_halo: int | None = None,
    z_total: int | None = None,
    is2d: bool = False,
):
    """Staged distributed tracer. Returns (init, stage, n_stages).

    init(vol_sharded, seed_pos, seed_dir, trace_ids, valid, base_key)
        -> (state, est0 (L, 9), ids0 (L,), field) — `field` is the
        per-shard likelihood field (built once; pass it to every stage)
    stage(vol_sharded, field, state, iter_idx (stage_iters,), kill (L,))
        -> (state, packed (L, stage_iters, 9), ids (L,), live (L,),
            kept_local (n_shards,))

    L = n_shards * lanes_per_shard; all lane-indexed arrays are sharded
    over the mesh axis. seed_pos are GLOBAL (x, y, z), pre-bucketed per
    shard (`_bucket` in the sharded pipeline); `valid` masks pad lanes.
    Estimates come back in global coordinates. `kill` retires traces
    whose committed prefix already stopped. `z_total` bounds the global
    stop check along the sharded coordinate (defaults to the sharded
    volume's extent — pass the original extent when the volume was
    padded to divide the mesh).

    With `is2d`, a single-slice (1, Y, X) image shards over Y instead:
    `vol_sharded` holds the TRANSPOSED (Y, 1, X) representation (axis 0
    is always the mesh axis), traces migrate on their centroid's y, and
    `z_total` bounds global Y. The reference treats 2-D as first-class
    (Advantra_plugin.cpp:2339, frangi2d); this is its scale-out analog.
    """
    from pnr_tpu.smc.tracker import BatchedTracker

    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
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
    ci = 1 if is2d else 2  # migrating coordinate in (x, y, z) estimates
    if trace_halo is None:
        trace_halo = required_trace_halo(cfg, stage_iters)
    ni = cfg.ni
    n_stages = -(-(ni - 1) // stage_iters)
    t_lanes = lanes_per_shard

    def _local_field(vol_local):
        idx = lax.axis_index(axis)
        zl = vol_local.shape[0]
        padded = halo_exchange_z(vol_local, trace_halo, axis)
        if is2d:
            # restore (1, Y_local+2h, X) for the tracker's (x, y, z=0)
            # coordinate frame
            padded = jnp.transpose(padded, (1, 0, 2))
        field = tracker.prepare_field(padded)
        z_off = (idx * zl - trace_halo).astype(jnp.float32)
        return field, z_off, zl

    def _zbound(z, zmax):
        zr = jnp.where(z >= 0, jnp.floor(z + 0.5), jnp.ceil(z - 0.5))
        return (zr >= 0) & (zr < zmax)

    def init_local(vol_local, sp, sd, ids, valid, key_data):
        field, z_off, zl = _local_field(vol_local)
        field_out = field[None]  # leading per-shard axis for out_specs
        zmax = float(z_total if z_total is not None else n_dev * vol_local.shape[0])
        keys = jax.vmap(jax.random.wrap_key_data)(key_data)
        sp_local = sp - jnp.zeros((3,), jnp.float32).at[ci].set(z_off)[None, :]
        carry, est0 = tracker._trace_init(field, sp_local, sd, keys)
        est0 = est0.at[:, ci].add(z_off)
        okg0 = _zbound(est0[:, ci], zmax)
        est0 = est0.at[:, 8].multiply((valid & okg0).astype(jnp.float32))
        live = valid
        state = carry + (key_data, ids, live, est0[:, ci])
        return state, est0, jnp.where(live, ids, -1), field_out

    def stage_local(vol_local, field_in, state, iter_idx, kill):
        # the likelihood field (halo slab -> tube maps / channel volume)
        # is built ONCE in init_local and passed back in: rebuilding it
        # per stage launch cost ~40% of the whole tracing stage at
        # 52 Mvox (PARITY.md round 3). vol_local rides along only for
        # its static shape / dtype bookkeeping.
        field = field_in[0]
        idx0 = lax.axis_index(axis)
        zl = vol_local.shape[0]
        z_off = (idx0 * zl - trace_halo).astype(jnp.float32)
        zmax = float(z_total if z_total is not None else n_dev * vol_local.shape[0])
        idx = lax.axis_index(axis)
        (pos, dirs, wgt, resampled, res_idx, alive,
         key_data, ids, live, last_cz) = state
        live = live & ~kill

        # ---- capacity-handshake migration (zero loss) ----
        fwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        bwd = [(i, (i - 1) % n_dev) for i in range(n_dev)]
        owner = jnp.clip(jnp.floor(last_cz / zl).astype(jnp.int32), 0, n_dev - 1)
        moving = live & alive & (owner != idx)
        go_up = moving & (owner > idx)
        go_dn = moving & (owner < idx)
        free_n = jnp.sum((~live).astype(jnp.int32))
        up_in = jnp.where(idx > 0, lax.ppermute(jnp.sum(go_up.astype(jnp.int32)), axis, fwd), 0)
        dn_in = jnp.where(idx < n_dev - 1, lax.ppermute(jnp.sum(go_dn.astype(jnp.int32)), axis, bwd), 0)
        accept_up = jnp.minimum(up_in, free_n)          # up-arrivals seat first
        accept_dn = jnp.minimum(dn_in, free_n - accept_up)
        my_up_grant = lax.ppermute(accept_up, axis, bwd)  # grant from idx+1
        my_dn_grant = lax.ppermute(accept_dn, axis, fwd)  # grant from idx-1
        rank_up = jnp.cumsum(go_up.astype(jnp.int32)) - 1
        rank_dn = jnp.cumsum(go_dn.astype(jnp.int32)) - 1
        go_up = go_up & (rank_up < my_up_grant)
        go_dn = go_dn & (rank_dn < my_dn_grant)
        kept_local = (jnp.sum(moving.astype(jnp.int32))
                      - jnp.sum(go_up.astype(jnp.int32))
                      - jnp.sum(go_dn.astype(jnp.int32))).reshape(1)

        payload = (pos, dirs, wgt, resampled, res_idx, alive, key_data, ids)

        def send(direction_mask, perm, dz):
            sent = [lax.ppermute(p, axis, perm) for p in payload]
            sent_mask = lax.ppermute(direction_mask, axis, perm)
            sent_pos = sent[0].at[:, :, ci].add(dz)
            return (sent_pos,) + tuple(sent[1:]), sent_mask

        up_payload, up_mask = send(go_up, fwd, -float(zl))
        dn_payload, dn_mask = send(go_dn, bwd, float(zl))
        up_mask = up_mask & (idx > 0)
        dn_mask = dn_mask & (idx < n_dev - 1)

        live = live & ~(go_up | go_dn)

        def fill(live, payload_in, mask_in, carry_arrs, key_data, ids):
            # rank-match arrivals to free lanes; the handshake guarantees
            # arrivals <= free lanes, so nothing drops
            arr_rank = jnp.cumsum(mask_in.astype(jnp.int32)) - 1
            free_lanes = jnp.nonzero(~live, size=t_lanes, fill_value=t_lanes)[0]
            dest = jnp.where(
                mask_in, free_lanes[jnp.clip(arr_rank, 0, t_lanes - 1)], t_lanes
            )

            def scat(dst_arr, src_arr):
                return dst_arr.at[dest].set(src_arr, mode="drop")

            new_carr = tuple(scat(d, s) for d, s in zip(carry_arrs, payload_in[:6]))
            key_data = scat(key_data, payload_in[6])
            ids = scat(ids, payload_in[7])
            live = live.at[dest].set(True, mode="drop")
            return live, new_carr, key_data, ids

        carry_arrs = (pos, dirs, wgt, resampled, res_idx, alive)
        live, carry_arrs, key_data, ids = fill(
            live, up_payload, up_mask, carry_arrs, key_data, ids
        )
        live, carry_arrs, key_data, ids = fill(
            live, dn_payload, dn_mask, carry_arrs, key_data, ids
        )
        carry = carry_arrs[:5] + (carry_arrs[5] & live,)

        # ---- advance stage_iters iterations ----
        keys_cur = jax.vmap(jax.random.wrap_key_data)(key_data)
        carry, packed = tracker._trace_stage(field, keys_cur, carry, iter_idx, ~live)
        packed = packed.at[:, :, ci].add(z_off)
        # the local in-bounds check ran against the halo-padded slab;
        # re-impose the GLOBAL bound along the sharded coordinate so
        # stop semantics match the single-device tracker (the other
        # bounds are identical). Validity is a prefix property
        # downstream, so one masked iteration invalidates the tail
        # exactly like the alive chain would.
        okg = _zbound(packed[:, :, ci], zmax)
        packed = packed.at[:, :, 8].multiply(
            okg.astype(jnp.float32) * live.astype(jnp.float32)[:, None]
        )
        last_cz = packed[:, -1, ci]
        state = carry + (key_data, ids, live, last_cz)
        return state, packed, jnp.where(live, ids, -1), live, kept_local

    state_spec = (P(axis),) * 10
    init_fn = shard_map(
        init_local,
        mesh=mesh,
        in_specs=(P(axis),) * 6,
        out_specs=(state_spec, P(axis), P(axis), P(axis)),
        check_vma=False,  # tube-map / exact Pallas kernels inside
    )
    stage_fn = shard_map(
        stage_local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), state_spec, P(None), P(axis)),
        out_specs=(state_spec, P(axis), P(axis), P(axis), P(axis)),
        check_vma=False,  # tube-map / exact Pallas kernels inside
    )

    def init(vol_sharded, seed_pos, seed_dir, trace_ids, valid, base_key):
        keys = jax.vmap(lambda i: jax.random.fold_in(base_key, i))(
            jnp.asarray(trace_ids, jnp.uint32)
        )
        key_data = jax.vmap(jax.random.key_data)(keys)
        return init_fn(
            vol_sharded,
            jnp.asarray(seed_pos, jnp.float32),
            jnp.asarray(seed_dir, jnp.float32),
            jnp.asarray(trace_ids, jnp.int32),
            jnp.asarray(valid),
            key_data,
        )

    return jax.jit(init), jax.jit(stage_fn), n_stages


def build_handoff_trace_step(
    cfg: PNRConfig,
    mesh,
    lanes_per_shard: int,
    stage_iters: int = 4,
    trace_halo: int | None = None,
):
    """One-shot API over `build_handoff_tracer`: run every stage with no
    kill feedback and return the stacked per-stage blocks.

    Returns step(vol_sharded, seed_pos, seed_dir, trace_ids, valid,
    base_key) -> (packed (S+1, L, stage_iters, 9), ids (S+1, L),
    live (S+1, L), lost (n_shards,)) — `lost` is now always zero (the
    capacity handshake keeps overflow traces local instead of dropping
    them; their count is in the final `kept_local`, also returned via
    the live/ids bookkeeping) and retained for API compatibility.
    """
    init, stage, n_stages = build_handoff_tracer(
        cfg, mesh, lanes_per_shard, stage_iters, trace_halo
    )
    ni = cfg.ni
    n_dev = mesh.devices.size

    def step(vol_sharded, seed_pos, seed_dir, trace_ids, valid, base_key):
        state, est0, ids0, field = init(
            vol_sharded, seed_pos, seed_dir, trace_ids, valid, base_key
        )
        lanes = est0.shape[0]
        packs = [jnp.pad(est0[:, None, :], ((0, 0), (0, stage_iters - 1), (0, 0)))]
        ids_all = [ids0]
        live_all = [state[8]]
        no_kill = jnp.zeros(lanes, bool)
        it = 1
        for s in range(n_stages):
            n_it = min(stage_iters, ni - it)
            state, packed, ids, live, _kept = stage(
                vol_sharded, field, state,
                jnp.arange(it, it + stage_iters), no_kill,
            )
            if n_it < stage_iters:
                packed = packed.at[:, n_it:, 8].set(0.0)
            packs.append(packed)
            ids_all.append(ids)
            live_all.append(live)
            it += n_it
        lost = jnp.zeros(n_dev, jnp.int32)
        return jnp.stack(packs), jnp.stack(ids_all), jnp.stack(live_all), lost

    return step, n_stages, stage_iters


def stitch_estimates(
    packs: np.ndarray, ids: np.ndarray, ni: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Reassemble per-trace estimate records from per-stage blocks.

    packs (S+1, L, stage_iters, 9), ids (S+1, L) with -1 for empty
    lanes. Returns (est (n_traces, ni, 9), trace_ids (n_traces,)) in
    ascending trace-id order; iteration 0 comes from stage block 0.
    """
    s_tot, lanes, stage_iters, _ = packs.shape
    all_ids = np.unique(ids[ids >= 0])
    est = np.zeros((len(all_ids), ni, 9), np.float32)
    id_to_row = {int(t): r for r, t in enumerate(all_ids)}
    for s in range(s_tot):
        it0 = 0 if s == 0 else 1 + (s - 1) * stage_iters
        n_it = 1 if s == 0 else min(stage_iters, ni - it0)
        if n_it <= 0:
            continue
        for lane in range(lanes):
            t = int(ids[s, lane])
            if t < 0:
                continue
            est[id_to_row[t], it0 : it0 + n_it] = packs[s, lane, :n_it]
    # validity is a prefix property (the tracker's alive chain): one
    # invalid iteration invalidates everything after it
    est[:, :, 8] = np.minimum.accumulate(est[:, :, 8], axis=1)
    return est, all_ids
