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


def frangi_halo_y(sigmas) -> int:
    #: xy Gaussian reach (ceil(3*sigma) half-width) + the two chained
    #: central-difference taps of the Hessian
    return int(math.ceil(3.0 * max(sigmas))) + 2


def pick_blocks(
    shape: Tuple[int, int, int],
    sigmas: Tuple[float, ...],
    zdist: float,
    tile_vox_budget: int = 32 * 1024 * 1024,
):
    """(block_z, block_y) for `frangi3d_tiled` so one tile's working set
    stays near `tile_vox_budget` voxels (~94 B/voxel of temp arena at 3
    sigmas — see parallel/plan.py), preferring large Y tiles (less halo
    re-compute). Returns None only when even a minimal (1, 8) tile
    exceeds the budget (absurdly wide X — caller falls back)."""
    z, y, x = shape
    hz, hy = frangi_halo_z(sigmas, zdist), frangi_halo_y(sigmas)
    by_max = tile_vox_budget // ((min(z, 32) + 2 * hz) * x) - 2 * hy
    by = min(y, max(8, by_max // 8 * 8))
    bz_max = tile_vox_budget // ((min(by, y) + 2 * hy) * x) - 2 * hz
    bz = min(z, max(1, bz_max))
    if (min(bz, z) + 2 * hz) * (min(by, y) + 2 * hy) * x > tile_vox_budget * 1.5:
        return None
    return bz, by


def pick_blocks_2d(
    shape_yx: Tuple[int, int],
    sigmas: Tuple[float, ...],
    tile_pix_budget: int = 32 * 1024 * 1024,
):
    """(block_y, block_x) for `frangi2d_tiled` with a ~32-Mpix tile."""
    h = frangi_halo_y(sigmas)
    y, x = shape_yx
    side = max(256, int(tile_pix_budget**0.5) - 2 * h)
    by = min(y, side)
    bx = min(x, max(256, tile_pix_budget // (by + 2 * h) - 2 * h))
    return by, bx


@partial(
    jax.jit,
    static_argnames=("sigmas", "beta_one", "beta_two", "block_y", "block_x"),
)
def frangi2d_tiled(
    img: jax.Array,
    sigmas: Tuple[float, ...],
    beta_one: float = 0.5,
    beta_two: float = 15.0,
    block_y: int = 4096,
    block_x: int = 4096,
):
    """2-axis tiled 2-D Frangi over a (Y, X) image, BITWISE-exact vs
    `ops.frangi.frangi2d` (borders included) with an O(tile) temp arena
    — the gigapixel-slide variant of `frangi3d_tiled` (the reference's
    P == 1 path is first-class, Advantra_plugin.cpp:2339; its images
    can exceed the f32 working set of a whole-slide jit).

    Same aligned-window + in-place fori-loop carry design as the 3-D
    tiler; see its docstring for the exactness argument.
    Returns (J, Jmin, Jmax, Vx, Vy) — the caller adds the zero Vz.
    """
    from pnr_tpu.ops.frangi import frangi2d

    y, x = img.shape
    h = frangi_halo_y(sigmas)
    by, bx = min(block_y, y), min(block_x, x)
    wy, wx = min(by + 2 * h, y), min(bx + 2 * h, x)
    ny, nx = -(-y // by), -(-x // bx)
    if ny * nx == 1:
        j, jmin, jmax, vx, vy, _vz = frangi2d(img, sigmas, beta_one, beta_two)
        return j, jmin, jmax, vx, vy

    init = (
        jnp.zeros((y, x), jnp.float32),
        jnp.float32(jnp.inf),
        jnp.float32(-jnp.inf),
        jnp.zeros((y, x), jnp.uint8),
        jnp.zeros((y, x), jnp.uint8),
    )

    def body(i, carry):
        j_o, jmin, jmax, vx_o, vy_o = carry
        iy, ix = i // nx, i % nx
        y0 = jnp.minimum(iy * by, y - by)
        x0 = jnp.minimum(ix * bx, x - bx)
        sy = jnp.clip(y0 - h, 0, y - wy)
        sx = jnp.clip(x0 - h, 0, x - wx)
        tile = jax.lax.dynamic_slice(img, (sy, sx), (wy, wx))
        j, _, _, vx, vy, _vz, v1 = frangi2d(
            tile, sigmas, beta_one, beta_two, keep_first_scale=True
        )

        def crop(a):
            return jax.lax.dynamic_slice(a, (y0 - sy, x0 - sx), (by, bx))

        def put(o, a):
            return jax.lax.dynamic_update_slice(o, a, (y0, x0))

        jc = crop(j)
        # Jmin reduces the FIRST-scale response over the kept block
        # (reference running-min semantics, frangi.cpp:392-505) — the
        # kept region's v1 is bitwise the monolithic first-scale
        # response, so the tile-reduced min is bitwise frangi2d's Jmin.
        return (
            put(j_o, jc),
            jnp.minimum(jmin, jnp.min(crop(v1))),
            jnp.maximum(jmax, jnp.max(jc)),
            put(vx_o, crop(vx)),
            put(vy_o, crop(vy)),
        )

    return jax.lax.fori_loop(0, ny * nx, body, init)


@partial(
    jax.jit,
    static_argnames=("sigmas", "zdist", "alpha", "beta", "c", "block_z", "block_y"),
)
def frangi3d_tiled(
    vol: jax.Array,
    sigmas: Tuple[float, ...],
    zdist: float,
    alpha: float = 0.5,
    beta: float = 0.5,
    c: float = 500.0,
    block_z: int = 16,
    block_y: int = 256,
):
    """2-axis tiled Frangi, BITWISE-exact vs `frangi3d` (borders
    included) with an O(outputs + tile) peak memory.

    Aligned-window tiling (the halo_exchange_z_aligned trick from the
    sharded path, applied per tile in Z AND Y): each tile's fetch
    window is shifted to stay inside the volume, so a window edge
    coincides with the true volume border exactly when the kept region
    is close enough to be affected — the one-sided border differences
    (frangi.cpp:305-381 / jnp.gradient semantics) then fire at true
    borders and nowhere else, and interior voxels see a full stencil
    halo of REAL data (no padding anywhere). Arbitrary extents: tail
    tiles clamp their kept start (z0 = min(i*bz, z-bz)), recomputing a
    few overlap rows with identical values.

    Tiles stream through a `fori_loop` whose carries ARE the output
    volumes (`dynamic_update_slice` writes each kept block in place —
    XLA aliases loop carries, so no stacked per-tile copies and no
    assembly transpose exist). This is what makes pod-shard planes
    (2048^2+) feasible: the Z-only streaming variant needs
    (bz + 2*halo_z) full planes of temp arena, which at 4.2-Mvox planes
    exceeds HBM at every usable bz (measured on v5e via
    memory_analysis: 18.7-23.7 GiB at bz 4-16, compiler crash at 32;
    the lax.map formulation of THIS tiler measured 11.15 GiB — the
    fori_loop one cuts the stacked-output term as well).
    """
    z, y, x = vol.shape
    hz = frangi_halo_z(sigmas, zdist)
    hy = frangi_halo_y(sigmas)
    bz, by = min(block_z, z), min(block_y, y)
    wz = min(bz + 2 * hz, z)
    wy = min(by + 2 * hy, y)
    nz, ny = -(-z // bz), -(-y // by)
    if nz * ny == 1:
        return frangi3d(vol, sigmas, zdist, alpha, beta, c)

    init = (
        jnp.zeros((z, y, x), jnp.float32),
        jnp.float32(jnp.inf),
        jnp.float32(-jnp.inf),
        jnp.zeros((z, y, x), jnp.uint8),
        jnp.zeros((z, y, x), jnp.uint8),
        jnp.zeros((z, y, x), jnp.uint8),
    )

    def body(i, carry):
        j_o, jmin, jmax, vx_o, vy_o, vz_o = carry
        iz, iy = i // ny, i % ny
        z0 = jnp.minimum(iz * bz, z - bz)
        y0 = jnp.minimum(iy * by, y - by)
        sz = jnp.clip(z0 - hz, 0, z - wz)
        sy = jnp.clip(y0 - hy, 0, y - wy)
        tile = jax.lax.dynamic_slice(vol, (sz, sy, 0), (wz, wy, x))
        j, _, _, vx, vy, vz, v1 = frangi3d(
            tile, sigmas, zdist, alpha, beta, c, keep_first_scale=True
        )

        def crop(a):
            return jax.lax.dynamic_slice(
                a, (z0 - sz, y0 - sy, 0), (bz, by, x)
            )

        def put(o, a):
            return jax.lax.dynamic_update_slice(o, a, (z0, y0, 0))

        jc = crop(j)
        # overlap rows recompute identical values: min/max unaffected.
        # Jmin reduces the FIRST-scale response over the kept block
        # (reference running-min semantics): the kept region's v1 is
        # bitwise the monolithic first-scale response (same aligned-
        # window argument as J), so the reduced min is bitwise
        # frangi3d's Jmin.
        return (
            put(j_o, jc),
            jnp.minimum(jmin, jnp.min(crop(v1))),
            jnp.maximum(jmax, jnp.max(jc)),
            put(vx_o, crop(vx)),
            put(vy_o, crop(vy)),
            put(vz_o, crop(vz)),
        )

    j, jmin, jmax, vx, vy, vz = jax.lax.fori_loop(
        0, nz * ny, body, init
    )
    return j, jmin, jmax, vx, vy, vz


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
        j, _, _, vx, vy, vz, v1 = frangi3d(
            tile, sigmas, zdist, alpha, beta, c, keep_first_scale=True
        )
        sl = slice(halo, halo + block_z)
        jc = j[sl]
        # Jmin/Jmax over the CROPPED interior only (halo values carry
        # boundary effects). Jmin reduces the FIRST-scale response
        # (reference running-min semantics, matching frangi3d bitwise);
        # Jmax the final response.
        zi = jax.lax.broadcasted_iota(jnp.int32, jc.shape, 0) + i * block_z
        in_range = zi < z
        if border_fix:
            # the 2 slices at each global border carry in-tile padded
            # border semantics; they are recomputed exactly below and
            # folded into the reductions there
            in_range &= (zi >= 2) & (zi < z - 2)
        jmin = jnp.min(jnp.where(in_range, v1[sl], jnp.inf))
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
        jh, _, _, vxh, vyh, vzh, v1h = frangi3d(
            vol[:fix], sigmas, zdist, alpha, beta, c, keep_first_scale=True
        )
        jt, _, _, vxt, vyt, vzt, v1t = frangi3d(
            vol[z - fix:], sigmas, zdist, alpha, beta, c, keep_first_scale=True
        )
        j = j.at[:2].set(jh[:2]).at[z - 2:].set(jt[-2:])
        vx = vx.at[:2].set(vxh[:2]).at[z - 2:].set(vxt[-2:])
        vy = vy.at[:2].set(vyh[:2]).at[z - 2:].set(vyt[-2:])
        vz = vz.at[:2].set(vzh[:2]).at[z - 2:].set(vzt[-2:])
        # the interior tiles' reductions skipped the corrected slices;
        # fold them in (min over the first-scale response, like the
        # interior tiles)
        jmin = jnp.minimum(
            jnp.minimum(jmin, jnp.min(v1h[:2])), jnp.min(v1t[-2:])
        )
        jmax = jnp.maximum(jmax, jnp.maximum(jnp.max(jh[:2]), jnp.max(jt[-2:])))
    return j, jmin, jmax, vx, vy, vz
