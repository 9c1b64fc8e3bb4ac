"""Z-blocked Frangi for volumes whose working set exceeds HBM.

The fused multi-scale graph peaks at ~180 transient bytes/voxel; a
single chip therefore caps out around 80 Mvoxels. This variant streams
the volume through `lax.map` over overlapping Z-tiles (the single-chip
analog of the mesh-sharded version in pnr_tpu.parallel): peak memory
drops to tile-sized at the cost of recomputing the halo slices. Results
match the unfused `frangi3d` exactly (the halo covers the full stencil
receptive field and global Jmin/Jmax are reduced across tiles).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from pnr_tpu.ops.frangi import frangi3d


def frangi_halo_z(sigmas, zdist) -> int:
    return int(math.ceil(3.0 * max(sigmas) / zdist)) + 2


@partial(
    jax.jit,
    static_argnames=("sigmas", "zdist", "alpha", "beta", "c", "block_z"),
)
def frangi3d_blocked(
    vol: jax.Array,
    sigmas: Tuple[float, ...],
    zdist: float,
    alpha: float = 0.5,
    beta: float = 0.5,
    c: float = 500.0,
    block_z: int = 32,
):
    """Same contract as `frangi3d`, O(block) peak memory."""
    z, y, x = vol.shape
    halo = frangi_halo_z(sigmas, zdist)
    if z <= 2 * (halo + 4):
        # too shallow to both tile and keep exact true borders — and by
        # construction small enough for the monolithic path
        return frangi3d(vol, sigmas, zdist, alpha, beta, c)
    nblk = -(-z // block_z)
    zpad = nblk * block_z - z

    vp = jnp.pad(vol, ((halo, halo + zpad), (0, 0), (0, 0)), mode="edge")
    border_fix = z > 2 * (halo + 4)  # static: thin-slab pass will run

    def one_tile(i):
        tile = jax.lax.dynamic_slice(
            vp, (i * block_z, 0, 0), (block_z + 2 * halo, y, x)
        )
        j, _, _, vx, vy, vz = frangi3d(tile, sigmas, zdist, alpha, beta, c)
        sl = slice(halo, halo + block_z)
        jc = j[sl]
        # Jmin/Jmax over the CROPPED interior only (halo values carry
        # boundary effects). Note: the unblocked frangi3d tracks Jmin over
        # the first-scale response; here it is the min of the final J —
        # both are 0 for any volume with background (documented).
        zi = jax.lax.broadcasted_iota(jnp.int32, jc.shape, 0) + i * block_z
        in_range = zi < z
        if border_fix:
            # the 2 slices at each global border carry in-tile padded
            # border semantics; they are recomputed exactly below and
            # folded into the reductions there
            in_range &= (zi >= 2) & (zi < z - 2)
        jmin = jnp.min(jnp.where(in_range, jc, jnp.inf))
        jmax = jnp.max(jnp.where(in_range, jc, -jnp.inf))
        return jc, jmin, jmax, vx[sl], vy[sl], vz[sl]

    j, jmins, jmaxs, vx, vy, vz = jax.lax.map(one_tile, jnp.arange(nblk))
    j = j.reshape(nblk * block_z, y, x)[:z]
    vx = vx.reshape(nblk * block_z, y, x)[:z]
    vy = vy.reshape(nblk * block_z, y, x)[:z]
    vz = vz.reshape(nblk * block_z, y, x)[:z]
    jmin, jmax = jnp.min(jmins), jnp.max(jmaxs)

    # True-border fix: inside a tile the replicate-padded halo turns the
    # reference's one-sided border difference (frangi.cpp:305-330,
    # jnp.gradient semantics) into central/2, so global slices 0..1 and
    # z-2..z-1 come out wrong. Recompute them on thin slabs whose edge
    # IS the true border (the slab is deep enough that its far edge
    # cannot contaminate the kept slices) — the result is then bitwise
    # `frangi3d`. Mirrors halo_exchange_z_aligned in the sharded path.
    fix = halo + 4
    if border_fix:
        jh, _, _, vxh, vyh, vzh = frangi3d(vol[:fix], sigmas, zdist, alpha, beta, c)
        jt, _, _, vxt, vyt, vzt = frangi3d(vol[z - fix:], sigmas, zdist, alpha, beta, c)
        j = j.at[:2].set(jh[:2]).at[z - 2:].set(jt[-2:])
        vx = vx.at[:2].set(vxh[:2]).at[z - 2:].set(vxt[-2:])
        vy = vy.at[:2].set(vyh[:2]).at[z - 2:].set(vyt[-2:])
        vz = vz.at[:2].set(vzh[:2]).at[z - 2:].set(vzt[-2:])
        # the interior tiles' min/max skipped the corrected slices'
        # final values; fold them in (min stays the documented
        # final-response min)
        jmin = jnp.minimum(jmin, jnp.minimum(jnp.min(jh[:2]), jnp.min(jt[-2:])))
        jmax = jnp.maximum(jmax, jnp.maximum(jnp.max(jh[:2]), jnp.max(jt[-2:])))
    return j, jmin, jmax, vx, vy, vz
