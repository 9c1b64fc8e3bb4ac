"""Sharded pipeline stages over a device mesh.

TPU-native redesign of the reference's single-address-space assumption
(SURVEY.md §2b): the voxel grid shards along Z over a 1-D mesh with
halo exchange for the dense stencils; the J8 normalization's global
min/max become mesh reductions (pmin/pmax); seed scoring and SMC
tracing run data-parallel over the trace batch against the (replicated)
volume. XLA inserts the ICI collectives from the shardings.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from pnr_tpu.config import PNRConfig
from pnr_tpu.ops.frangi import frangi3d
from pnr_tpu.parallel.halo import halo_exchange_z, halo_exchange_z_aligned


def make_mesh(n_devices: int | None = None, axis: str = "z") -> Mesh:
    """1-D mesh over the first n_devices. Fails loudly (never silently
    truncates) when the backend exposes fewer devices than requested —
    a silently smaller mesh would void every multi-chip correctness
    signal downstream."""
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(
                f"make_mesh({n_devices}): only {len(devs)} "
                f"{jax.default_backend()} device(s) available; for a virtual "
                "mesh set XLA_FLAGS=--xla_force_host_platform_device_count="
                f"{n_devices} with JAX_PLATFORMS=cpu before importing jax"
            )
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def frangi_halo(sigmas: Sequence[float], zdist: float) -> int:
    """Ghost slices needed in Z: Gaussian z-kernel + two first-difference passes."""
    smax = max(sigmas)
    return int(math.ceil(3.0 * smax / zdist)) + 2


def frangi3d_sharded(
    vol: jax.Array,
    sigmas: Tuple[float, ...],
    zdist: float,
    mesh: Mesh,
    alpha: float = 0.5,
    beta: float = 0.5,
    c: float = 500.0,
):
    """Multi-scale Frangi over a Z-sharded volume; returns sharded outputs.

    Bitwise-matches the unsharded `frangi3d`: interior shard boundaries
    exchange halos over ICI, and the windows of the first/last shard
    are ALIGNED to the global borders (`halo_exchange_z_aligned`) so
    the one-sided border differences of the Hessian (frangi.cpp:305-381)
    fire exactly where the unsharded op fires them. Jmin/Jmax are
    global (psum-tree reductions; min over the final response — equal
    to the reference's first-scale running min whenever any voxel hits
    the lambda sign cut, i.e. always in practice).
    """
    halo = frangi_halo(sigmas, zdist)
    axis = mesh.axis_names[0]

    def local_fn(v):
        slab, off = halo_exchange_z_aligned(v, halo, axis)
        zl = v.shape[0]
        if slab.size > 80_000_000:
            # large shards hit the same ~180 B/voxel transient peak as
            # the monolithic path (pipeline/reconstruct.py): stream the
            # halo slab through tiles — identical results, tile-sized
            # temp arena (see parallel.plan for the per-shard budget).
            # 2-axis aligned-window tiling when divisors allow (required
            # for pod-shard planes like 2048^2, where Z-only tiles
            # exceed HBM at any usable bz); Z-only streaming otherwise.
            from pnr_tpu.ops.frangi_blocked import (
                frangi3d_blocked,
                frangi3d_tiled,
                pick_blocks,
            )

            blocks = pick_blocks(slab.shape, sigmas, zdist)
            if blocks is not None:
                j, _, _, vx, vy, vz = frangi3d_tiled(
                    slab, sigmas, zdist, alpha, beta, c,
                    block_z=blocks[0], block_y=blocks[1],
                )
            else:
                j, _, _, vx, vy, vz = frangi3d_blocked(
                    slab, sigmas, zdist, alpha, beta, c
                )
        else:
            j, _, _, vx, vy, vz = frangi3d(slab, sigmas, zdist, alpha, beta, c)
        j, vx, vy, vz = (
            lax.dynamic_slice_in_dim(a, off, zl, 0) for a in (j, vx, vy, vz)
        )
        jmin = lax.pmin(jnp.min(j), axis)
        jmax = lax.pmax(jnp.max(j), axis)
        return j, jmin, jmax, vx, vy, vz

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=P(mesh.axis_names[0]),
        out_specs=(P(axis), P(), P(), P(axis), P(axis), P(axis)),
        check_vma=False,  # Pallas conv inside; vma inference unsupported
    )
    return fn(vol)


def frangi2d_halo(sigmas: Sequence[float]) -> int:
    """Ghost rows needed in Y: Gaussian kernel + two first-difference passes."""
    return int(math.ceil(3.0 * max(sigmas))) + 2


def frangi2d_sharded(
    vol_t: jax.Array,
    sigmas: Tuple[float, ...],
    mesh: Mesh,
    beta_one: float = 0.5,
    beta_two: float = 15.0,
):
    """Multi-scale 2-D Frangi over a Y-sharded single-slice image.

    `vol_t` is the TRANSPOSED (Y, 1, X) representation of a (1, Y, X)
    stack, sharded over axis 0 — the 2-D analog of `frangi3d_sharded`:
    the same 1-D mesh machinery with halo exchange along Y. Outputs stay
    in the transposed layout; Jmin/Jmax are global mesh reductions.
    Matches the unsharded `frangi2d` (frangi.cpp:392-505) on the
    original image.
    """
    from pnr_tpu.ops.frangi import frangi2d

    halo = frangi2d_halo(sigmas)
    axis = mesh.axis_names[0]

    def local_fn(v):
        slab, off = halo_exchange_z_aligned(v, halo, axis)
        yl = v.shape[0]
        if slab.size > 80_000_000:
            # gigapixel Y-slabs: the same O(tile) aligned-window tiler
            # as the monolithic 2-D path (bitwise frangi2d)
            from pnr_tpu.ops.frangi_blocked import (
                frangi2d_tiled,
                pick_blocks_2d,
            )

            by, bx = pick_blocks_2d(
                (slab.shape[0], slab.shape[2]), tuple(sigmas)
            )
            j, _jmin, _jmax, vx, vy = frangi2d_tiled(
                slab[:, 0, :], tuple(sigmas), beta_one, beta_two,
                block_y=by, block_x=bx,
            )
            vz = jnp.zeros_like(vx)
        else:
            j, _jmin, _jmax, vx, vy, vz = frangi2d(
                slab[:, 0, :], tuple(sigmas), beta_one, beta_two
            )
        j, vx, vy, vz = (
            lax.dynamic_slice_in_dim(a, off, yl, 0)[:, None, :]
            for a in (j, vx, vy, vz)
        )
        jmin = lax.pmin(jnp.min(j), axis)
        jmax = lax.pmax(jnp.max(j), axis)
        return j, jmin, jmax, vx, vy, vz

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=P(axis),
        out_specs=(P(axis), P(), P(), P(axis), P(axis), P(axis)),
        check_vma=False,  # Pallas conv inside; vma inference unsupported
    )
    return fn(vol_t)


def normalize_to_u8_sharded(j, jmin, jmax):
    """J8 quantization on sharded inputs — the ONE normalization rule
    (ops/frangi.normalize_to_u8; elementwise, so it shards for free).
    Delegating keeps the sharded pipeline bitwise-locked to any future
    change of the quantization semantics."""
    from pnr_tpu.ops.frangi import normalize_to_u8

    return normalize_to_u8(j, jmin, jmax)


def shard_volume(vol: np.ndarray, mesh: Mesh) -> jax.Array:
    """Place a (Z, Y, X) volume Z-sharded on the mesh (Z must divide evenly).

    On a multi-process mesh (`init_multihost`) each process materializes
    only the slabs its local devices own; `vol` must then hold the same
    full value on every process (or support `vol[idx]` slicing, e.g. a
    memory map — see `multihost.shard_volume_global`)."""
    if jax.process_count() > 1:
        from pnr_tpu.parallel.multihost import shard_volume_global

        return shard_volume_global(np.asarray(vol), mesh)
    sharding = NamedSharding(mesh, P(mesh.axis_names[0]))
    return jax.device_put(jnp.asarray(vol), sharding)


def seeds_sharded(
    j8, vx_u8, vy_u8, vz_u8, tolerance: float, mesh: Mesh, cap_per_shard: int
):
    """MaximumFinder seed extraction over a Z-sharded J8 volume.

    The tolerance flood is strictly per-z-slice (seed.cpp:574), so
    running the device label-propagation on each shard's slab is EXACT
    by construction — no halo needed. Per shard the strongest
    `cap_per_shard` MAX_POINTs (by J8 value) are emitted with their
    decoded Frangi directions; `found` reports the true per-shard seed
    count so callers can detect cap overflow.

    Returns (pos (n*cap, 3) global xyz, dirs (n*cap, 3), valid (n*cap,),
    found (n_shards,)) — all sharded over the mesh axis.
    """
    from pnr_tpu.seeds.extract import _slice_max_points

    axis = mesh.axis_names[0]

    def local_fn(j8_l, vx_l, vy_l, vz_l):
        zl, h, w = j8_l.shape
        mask = jax.vmap(lambda s: _slice_max_points(s, tolerance))(j8_l)
        score = jnp.where(mask, j8_l.astype(jnp.int32) + 1, 0).reshape(-1)
        vals, idx = lax.top_k(score, cap_per_shard)
        valid = vals > 0
        z = idx // (h * w)
        rem = idx % (h * w)
        y = rem // w
        x = rem % w
        ex = vx_l.reshape(-1)[idx].astype(jnp.float32) / 255.0 * 2.0 - 1.0
        ey = vy_l.reshape(-1)[idx].astype(jnp.float32) / 255.0 * 2.0 - 1.0
        ez = vz_l.reshape(-1)[idx].astype(jnp.float32) / 255.0 * 2.0 - 1.0
        nrm = jnp.sqrt(ex * ex + ey * ey + ez * ez)
        nrm = jnp.where(nrm > 0, nrm, 1.0)
        dirs = jnp.stack([ex / nrm, ey / nrm, ez / nrm], axis=-1)
        z_glob = (z + lax.axis_index(axis) * zl).astype(jnp.float32)
        pos = jnp.stack([x.astype(jnp.float32), y.astype(jnp.float32), z_glob], -1)
        found = jnp.sum(mask.astype(jnp.int32)).reshape(1)
        return pos, dirs, valid, found

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis), P(axis)),
    )
    return fn(j8, vx_u8, vy_u8, vz_u8)


# ---------------------------------------------------------------------------
# one full sharded pipeline step (filter + seeds + one trace wave)


def build_sharded_step(cfg: PNRConfig, mesh: Mesh, wave: int = 8):
    """A jittable full pipeline step over the mesh: sharded Frangi ->
    global J8 -> per-shard MaximumFinder seed extraction (exact, the
    flood is per-z-slice) -> shard-local SMC tracing with boundary
    handoff (the volume never replicates). Used by `dryrun_multichip`
    and as the template for the production multi-chip driver.
    """
    from pnr_tpu.parallel.handoff import build_handoff_trace_step

    n_dev = mesh.devices.size
    # round UP: a wave the mesh does not divide must not silently lose
    # seed lanes (wave=8 on 3 devices gets 3x3, not 3x2=6)
    per_shard = max(1, -(-wave // n_dev))
    # lane headroom: migrating traces need free lanes on the receiving
    # shard beyond its own seeds, or arrivals drop as handoff-lost
    lanes = 2 * per_shard + 2
    handoff_step, n_stages, stage_iters = build_handoff_trace_step(
        cfg, mesh, lanes_per_shard=lanes, stage_iters=4
    )

    def step(vol_sharded, key):
        j, jmin, jmax, vx, vy, vz = frangi3d_sharded(
            vol_sharded, cfg.sigmas, cfg.zdist, mesh,
            cfg.frangi_alpha, cfg.frangi_beta, cfg.frangi_c,
        )
        j8 = normalize_to_u8_sharded(j, jmin, jmax)

        seed_pos, seed_dir, valid, found = seeds_sharded(
            j8, vx, vy, vz, cfg.tolerance, mesh, per_shard
        )

        # pad each shard's seed block from per_shard to `lanes`
        def pad_lanes(a, fill=0.0):
            a2 = a.reshape((n_dev, per_shard) + a.shape[1:])
            widths = ((0, 0), (0, lanes - per_shard)) + ((0, 0),) * (a.ndim - 1)
            return jnp.pad(a2, widths, constant_values=fill).reshape(
                (n_dev * lanes,) + a.shape[1:]
            )

        sp = pad_lanes(seed_pos)
        sd = pad_lanes(seed_dir)
        val = pad_lanes(valid, fill=False)
        ids = jnp.arange(n_dev * lanes, dtype=jnp.int32)
        packs, est_ids, live, lost = handoff_step(
            vol_sharded, sp, sd, ids, val, key
        )
        return {
            "j8": j8,
            "seed_pos": seed_pos,
            "seed_valid": valid,
            "seeds_found": found,
            "est_packs": packs,       # (S+1, n*T, stage_iters, 9)
            "est_ids": est_ids,       # (S+1, n*T)
            "trace_valid": packs[..., 8] > 0.5,
            "handoff_lost": lost,
        }

    return jax.jit(step)


def build_local_trace_step(cfg: PNRConfig, mesh: Mesh, seeds_per_shard: int, trace_halo: int | None = None):
    """Shard-local tracing: the volume NEVER replicates.

    Each shard traces the seeds that fall in its Z-slab against its
    halo-extended local volume (ghost slices over ICI via ppermute);
    the tube-ZNCC maps are built per shard on the padded slab, so map
    convolutions see real neighbour data. Traces that wander past the
    halo terminate there (the estimate leaves the local bounds) —
    boundary handoff to the neighbouring shard is a documented future
    extension; choose trace_halo generously for the expected wander.

    Seeds arrive Z-sharded as (n_shards * seeds_per_shard, 3) global
    (x, y, z) positions (use `assign_seeds_to_shards`); estimates come
    back in GLOBAL coordinates as the packed (T, ni, 9) buffer.
    """
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
    tracker = BatchedTracker(cfg, is2d=False)
    if trace_halo is None:
        # template reach (~4.4 sigma, see ops/zncc.py) + transition steps
        trace_halo = int(math.ceil(4.5 * max(cfg.sigmas))) + 4 * cfg.step

    def local_fn(vol_local, sp, sd, keys):
        idx = lax.axis_index(axis)
        zl = vol_local.shape[0]
        padded = halo_exchange_z(vol_local, trace_halo, axis)
        field = tracker.prepare_field(padded)
        z_off = (idx * zl - trace_halo).astype(jnp.float32)
        sp_local = sp - jnp.stack(
            [jnp.zeros_like(z_off), jnp.zeros_like(z_off), z_off]
        )[None, :]
        carry, est0 = tracker._trace_init(field, sp_local, sd, keys)
        _, packed = tracker._trace_stage(
            field, keys, carry, jnp.arange(1, cfg.ni),
            jnp.zeros(sp.shape[0], jnp.bool_),
        )
        all_est = jnp.concatenate([est0[:, None, :], packed], axis=1)
        # back to global z
        all_est = all_est.at[:, :, 2].add(z_off)
        return all_est

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,  # tube-map / exact Pallas kernels inside
    )

    def step(vol_sharded, seed_pos, seed_dir, base_key):
        n = seed_pos.shape[0]
        keys = jax.vmap(lambda i: jax.random.fold_in(base_key, i))(
            jnp.arange(n, dtype=jnp.uint32)
        )
        return fn(vol_sharded, jnp.asarray(seed_pos), jnp.asarray(seed_dir), keys)

    return jax.jit(step)


def assign_seeds_to_shards(
    pos: np.ndarray, dirs: np.ndarray, z_total: int, n_shards: int, seeds_per_shard: int
):
    """Bucket seeds by the Z-slab containing them, padded/truncated to a
    fixed count per shard. Returns (pos (n_shards*k, 3), dirs, valid mask)."""
    zl = z_total // n_shards
    out_p = np.zeros((n_shards * seeds_per_shard, 3), np.float32)
    out_d = np.zeros((n_shards * seeds_per_shard, 3), np.float32)
    out_d[:, 0] = 1.0
    valid = np.zeros(n_shards * seeds_per_shard, bool)
    for s in range(n_shards):
        lo, hi = s * zl, (s + 1) * zl if s < n_shards - 1 else z_total
        m = (pos[:, 2] >= lo) & (pos[:, 2] < hi)
        sel = np.nonzero(m)[0][:seeds_per_shard]
        k = len(sel)
        out_p[s * seeds_per_shard : s * seeds_per_shard + k] = pos[sel]
        out_d[s * seeds_per_shard : s * seeds_per_shard + k] = dirs[sel]
        valid[s * seeds_per_shard : s * seeds_per_shard + k] = True
    return out_p, out_d, valid
