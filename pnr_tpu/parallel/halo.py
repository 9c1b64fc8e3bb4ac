"""Halo exchange for sharded stencil computation.

The reference holds the whole volume in one address space
(SURVEY.md §5 long-context analog); volumes beyond one chip's HBM shard
along Z across a `jax.sharding.Mesh`. Stencils (Gaussian, Hessian) need
`halo` ghost slices from the Z-neighbours: interior shard boundaries
receive real neighbour data over ICI (`lax.ppermute`), global volume
boundaries replicate the edge slice — reproducing the unsharded
clamped-border convolution bit-for-bit when halo >= receptive field.

Halos larger than one shard (small shards / large sigma) take multiple
ppermute hops; out-of-range global slices resolve by clamping into the
assembled neighbour stack, which realizes edge replication without a
special boundary path.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax


def halo_exchange_z_aligned(x: jax.Array, halo: int, axis_name: str = "z"):
    """Aligned-window halo exchange for border-sensitive stencils.

    Returns (slab, crop_off): a local slab of static shape
    (zl + 2*halo, Y, X) covering global slices [w0, w0 + S) with
    w0 = clamp(g0 - halo, 0, Ztot - S) — shifted INTO the volume at the
    global edges so every slab edge coincides with a TRUE global border.
    Operators whose border rule is not equivalent to edge replication
    (the reference's one-sided first difference at borders,
    frangi.cpp:305-381 — `jnp.gradient` semantics) then apply their edge
    case exactly where the unsharded op would, making the cropped result
    bitwise equal to single-device even in the first/last shard's border
    slices. `crop_off = g0 - w0` is where the shard's own rows start in
    the slab (crop with `lax.dynamic_slice_in_dim`).

    Plain `halo_exchange_z` replicates edge slices instead, which is
    exact only for clamp-equivalent operators (convolution with edge
    padding, min/max windows, clamped interpolation).

    When the volume is smaller than the slab (tiny shards / huge halo)
    this degrades to a full `all_gather` — slab = the whole volume,
    crop_off = g0 — which is trivially exact.
    """
    zl = x.shape[0]
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    s_len = zl + 2 * halo
    z_tot = n * zl

    if n == 1 or s_len >= z_tot:
        full = lax.all_gather(x, axis_name, axis=0, tiled=True)
        return full, idx * zl

    # edge shards reach up to 2*halo past their own slab on one side
    hops = min(int(math.ceil(2 * halo / zl)), n - 1)
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    prev_slabs = []
    nxt_slabs = []
    cur_p, cur_n = x, x
    for _ in range(hops):
        cur_p = lax.ppermute(cur_p, axis_name, perm=fwd)
        cur_n = lax.ppermute(cur_n, axis_name, perm=bwd)
        prev_slabs.insert(0, cur_p)
        nxt_slabs.append(cur_n)
    stack = jnp.concatenate(prev_slabs + [x] + nxt_slabs, axis=0)
    # stack[k] holds global slice g0 - hops*zl + k; wrapped slabs carry
    # out-of-range garbage but w0 below never selects them
    g0 = idx * zl
    w0 = jnp.clip(g0 - halo, 0, z_tot - s_len)
    start = w0 - (g0 - hops * zl)
    slab = lax.dynamic_slice_in_dim(stack, start, s_len, axis=0)
    return slab, g0 - w0


def halo_exchange_z(x: jax.Array, halo: int, axis_name: str = "z") -> jax.Array:
    """Pad a local (Zl, Y, X) shard with `halo` ghost slices on both Z sides.

    Must run inside shard_map over a 1-D mesh axis `axis_name`. Supports
    halo > shard depth via multiple ppermute hops.
    """
    zl = x.shape[0]
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)

    if n == 1:
        top = jnp.repeat(x[:1], halo, axis=0)
        bot = jnp.repeat(x[-1:], halo, axis=0)
        return jnp.concatenate([top, x, bot], axis=0)

    hops = min(int(math.ceil(halo / zl)), n - 1)
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]

    # Neighbour stacks: prev_stack covers global [g0 - hops*zl, g0),
    # next_stack covers [g0 + zl, g0 + (hops+1)*zl). Slabs that wrap
    # around the ring carry out-of-range garbage, but the clamped index
    # below never selects them.
    prev_slabs = []
    nxt_slabs = []
    cur_p, cur_n = x, x
    for _ in range(hops):
        cur_p = lax.ppermute(cur_p, axis_name, perm=fwd)
        cur_n = lax.ppermute(cur_n, axis_name, perm=bwd)
        prev_slabs.insert(0, cur_p)
        nxt_slabs.append(cur_n)

    stack = jnp.concatenate(prev_slabs + [x] + nxt_slabs, axis=0)
    # stack[k] holds global slice g0 - hops*zl + k (where valid)
    g0 = idx * zl
    zmax = n * zl - 1

    t = jnp.arange(-halo, zl + halo)  # wanted global offsets relative to g0
    gz = jnp.clip(g0 + t, 0, zmax)  # clamp = edge replication
    local_k = gz - (g0 - hops * zl)
    return jnp.take(stack, local_k, axis=0)
