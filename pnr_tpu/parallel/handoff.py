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

Lane management: each shard owns a fixed batch of T lanes. Departing
traces free their lane; arrivals fill free lanes in rank order (rank
of arrival matched to rank of free lane — pure scatter, no host). If
arrivals exceed free lanes the overflow traces are dropped and counted
in the returned `lost` array (size the lanes generously).

Reassembly: the step returns per-stage packed estimate blocks plus the
lane->trace-id map per stage; `stitch_estimates` reassembles each
trace's (ni, 9) record on the host.
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


def build_handoff_trace_step(
    cfg: PNRConfig,
    mesh,
    lanes_per_shard: int,
    stage_iters: int = 4,
    trace_halo: int | None = None,
):
    """Returns step(vol_sharded, seed_pos, seed_dir, trace_ids, valid,
    base_key) -> (packed (S, n*T, stage, 9), ids (S, n*T), live (S, n*T),
    lost (n_shards,)) with S = number of stages.

    seed_pos are GLOBAL (x, y, z); they must be pre-bucketed per shard
    (`assign_seeds_to_shards`), `valid` masking pad lanes. Estimates
    come back in global coordinates.
    """
    from pnr_tpu.smc.tracker import BatchedTracker

    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    tracker = BatchedTracker(cfg, is2d=False)
    if trace_halo is None:
        trace_halo = required_trace_halo(cfg, stage_iters)
    ni = cfg.ni
    n_stages = -(-(ni - 1) // stage_iters)
    t_lanes = lanes_per_shard

    def local_fn(vol_local, sp, sd, ids, valid, key_data):
        idx = lax.axis_index(axis)
        zl = vol_local.shape[0]
        fwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        bwd = [(i, (i - 1) % n_dev) for i in range(n_dev)]

        padded = halo_exchange_z(vol_local, trace_halo, axis)
        field = tracker.prepare_field(padded)
        z_off = (idx * zl - trace_halo).astype(jnp.float32)

        keys = jax.vmap(jax.random.wrap_key_data)(key_data)
        sp_local = sp - jnp.stack(
            [jnp.zeros_like(z_off), jnp.zeros_like(z_off), z_off]
        )[None, :]
        carry, est0 = tracker._trace_init(field, sp_local, sd, keys)
        est0 = est0.at[:, 2].add(z_off)
        zr0 = jnp.where(
            est0[:, 2] >= 0,
            jnp.floor(est0[:, 2] + 0.5),
            jnp.ceil(est0[:, 2] - 0.5),
        )
        okg0 = (zr0 >= 0) & (zr0 < n_dev * zl)
        est0 = est0.at[:, 8].multiply(
            (valid & okg0).astype(jnp.float32)
        )
        live = valid
        lost = jnp.zeros((1,), jnp.int32)  # per-shard dropped-arrival count

        stage_packs = [jnp.pad(est0[:, None, :], ((0, 0), (0, stage_iters - 1), (0, 0)))]
        stage_ids = [jnp.where(live, ids, -1)]
        stage_live = [live]

        def migrate(carry, key_data, ids, live, cz_global, lost):
            """Hand traces whose centroid left the owned slab to the
            Z-neighbour that now owns them."""
            pos, dirs, wgt, resampled, res_idx, alive = carry
            owner = jnp.clip(
                jnp.floor(cz_global / zl).astype(jnp.int32), 0, n_dev - 1
            )
            moving = live & alive & (owner != idx)
            go_up = moving & (owner > idx)
            go_dn = moving & (owner < idx)

            payload = (
                pos, dirs, wgt, resampled, res_idx, alive, key_data, ids,
            )

            def send(direction_mask, perm, dz):
                # ship ALL lanes + the mask; the receiver selects
                sent = [lax.ppermute(p, axis, perm) for p in payload]
                sent_mask = lax.ppermute(direction_mask, axis, perm)
                # re-localize particle z into the receiver's frame
                sent_pos = sent[0].at[:, :, 2].add(dz)
                return (sent_pos,) + tuple(sent[1:]), sent_mask

            # +1 neighbours: what shard idx-1 sent up arrives here
            up_payload, up_mask = send(go_up, fwd, -float(zl))
            dn_payload, dn_mask = send(go_dn, bwd, float(zl))
            # edge shards never receive across the global boundary
            up_mask = up_mask & (idx > 0)
            dn_mask = dn_mask & (idx < n_dev - 1)

            live = live & ~moving

            def fill(live, lost, payload_in, mask_in, carry_arrs, key_data, ids):
                # rank-match arrivals to free lanes (pure scatter)
                arr_rank = jnp.cumsum(mask_in.astype(jnp.int32)) - 1
                free_lanes = jnp.nonzero(
                    ~live, size=t_lanes, fill_value=t_lanes
                )[0]
                n_free = jnp.sum((~live).astype(jnp.int32))
                takes = mask_in & (arr_rank < n_free)
                dest = jnp.where(
                    takes, free_lanes[jnp.clip(arr_rank, 0, t_lanes - 1)], t_lanes
                )  # t_lanes = out of range -> dropped by the scatter
                lost = lost + jnp.sum((mask_in & ~takes).astype(jnp.int32))

                def scat(dst_arr, src_arr):
                    return dst_arr.at[dest].set(src_arr, mode="drop")

                new_carr = tuple(scat(d, s) for d, s in zip(carry_arrs, payload_in[:6]))
                key_data = scat(key_data, payload_in[6])
                ids = scat(ids, payload_in[7])
                live = live.at[dest].set(True, mode="drop")
                return live, lost, new_carr, key_data, ids

            carry_arrs = (pos, dirs, wgt, resampled, res_idx, alive)
            live, lost, carry_arrs, key_data, ids = fill(
                live, lost, up_payload, up_mask, carry_arrs, key_data, ids
            )
            live, lost, carry_arrs, key_data, ids = fill(
                live, lost, dn_payload, dn_mask, carry_arrs, key_data, ids
            )
            # lanes not live carry no work
            carry = carry_arrs[:5] + (carry_arrs[5] & live,)
            return carry, key_data, ids, live, lost

        it = 1
        key_data_cur = key_data
        ids_cur = ids
        last_cz = est0[:, 2]
        for s in range(n_stages):
            # migrate based on the latest centroid (global z)
            carry, key_data_cur, ids_cur, live, lost = migrate(
                carry, key_data_cur, ids_cur, live, last_cz, lost
            )
            keys_cur = jax.vmap(jax.random.wrap_key_data)(key_data_cur)
            n_it = min(stage_iters, ni - it)
            carry, packed = tracker._trace_stage(
                field, keys_cur, carry, jnp.arange(it, it + n_it), ~live
            )
            packed = packed.at[:, :, 2].add(z_off)
            # the local in-bounds check runs against the halo-padded
            # slab; re-impose the GLOBAL z bound so stop semantics match
            # the single-device tracker (x/y bounds are identical). The
            # stitcher takes the running prefix, so one masked iteration
            # invalidates the tail exactly like the alive chain would.
            zr = jnp.where(
                packed[:, :, 2] >= 0,
                jnp.floor(packed[:, :, 2] + 0.5),
                jnp.ceil(packed[:, :, 2] - 0.5),
            )
            okg = (zr >= 0) & (zr < n_dev * zl)
            packed = packed.at[:, :, 8].multiply(
                okg.astype(jnp.float32) * live.astype(jnp.float32)[:, None]
            )
            last_cz = packed[:, n_it - 1, 2]
            if n_it < stage_iters:
                packed = jnp.pad(packed, ((0, 0), (0, stage_iters - n_it), (0, 0)))
            stage_packs.append(packed)
            stage_ids.append(jnp.where(live, ids_cur, -1))
            stage_live.append(live)
            it += n_it

        return (
            jnp.stack(stage_packs),   # (S+1, T, stage_iters, 9)
            jnp.stack(stage_ids),     # (S+1, T)
            jnp.stack(stage_live),    # (S+1, T)
            lost,
        )

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(None, axis), P(None, axis), P(None, axis), P(axis)),
    )

    def step(vol_sharded, seed_pos, seed_dir, trace_ids, valid, base_key):
        keys = jax.vmap(lambda i: jax.random.fold_in(base_key, i))(
            jnp.asarray(trace_ids, jnp.uint32)
        )
        key_data = jax.vmap(jax.random.key_data)(keys)
        return fn(
            vol_sharded,
            jnp.asarray(seed_pos, jnp.float32),
            jnp.asarray(seed_dir, jnp.float32),
            jnp.asarray(trace_ids, jnp.int32),
            jnp.asarray(valid),
            key_data,
        )

    return jax.jit(step), n_stages, stage_iters


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
