"""Clamped trilinear / bilinear image sampling.

Parity target: `Tracker::interp` (pnr-vaa3d/tracker.cpp:2138-2215):
coordinates are clamped to [0, dim-1.001] before the floor, so the two
gather corners always stay in range and out-of-volume queries sample
the nearest edge. For single-slice volumes (l==1) the z coordinate is
ignored (bilinear).

TPU design: the 8 corner reads collapse into 4 gathers of x-contiguous
(1, 2) slices — measured ~3x faster than 8 pointwise gathers on TPU
(XLA lowers contiguous-pair slices onto wider loads), and all gather
indices are flattened to 1-D, which avoids a pathological XLA:TPU
compile-time blowup observed with multi-dimensional index tensors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _pair_gather(v2: jax.Array, row: jax.Array, col: jax.Array) -> jax.Array:
    """Gather x-contiguous pairs v2[row, col:col+2] -> (..., 2), clipped."""
    idx = jnp.stack([row, col], axis=-1)
    dn = lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0, 1)
    )
    return lax.gather(v2, idx, dn, slice_sizes=(1, 2), mode="clip")[:, 0, :]


def trilinear(vol: jax.Array, x: jax.Array, y: jax.Array, z: jax.Array) -> jax.Array:
    """Sample (Z, Y, X) `vol` at float coordinates; shapes of x/y/z broadcast.

    Returns float32 samples with the reference's clamping semantics.
    """
    l, h, w = vol.shape
    v2 = vol.reshape(l * h, w).astype(jnp.float32)

    x, y, z = jnp.broadcast_arrays(x, y, z)
    out_shape = x.shape
    x = x.reshape(-1)
    y = y.reshape(-1)
    z = z.reshape(-1)

    xc = jnp.clip(x, 0.0, w - 1.001)
    x1 = jnp.floor(xc).astype(jnp.int32)
    xf = xc - x1

    yc = jnp.clip(y, 0.0, h - 1.001)
    y1 = jnp.floor(yc).astype(jnp.int32)
    yf = yc - y1

    if l == 1:
        r1 = _pair_gather(v2, y1, x1)
        r2 = _pair_gather(v2, y1 + 1, x1)
        out = (1 - yf) * ((1 - xf) * r1[:, 0] + xf * r1[:, 1]) + yf * (
            (1 - xf) * r2[:, 0] + xf * r2[:, 1]
        )
        return out.reshape(out_shape)

    zc = jnp.clip(z, 0.0, l - 1.001)
    z1 = jnp.floor(zc).astype(jnp.int32)
    zf = zc - z1

    row11 = z1 * h + y1
    r11 = _pair_gather(v2, row11, x1)
    r21 = _pair_gather(v2, row11 + 1, x1)
    row12 = row11 + h
    r12 = _pair_gather(v2, row12, x1)
    r22 = _pair_gather(v2, row12 + 1, x1)

    plane1 = (1 - yf) * ((1 - xf) * r11[:, 0] + xf * r11[:, 1]) + yf * (
        (1 - xf) * r21[:, 0] + xf * r21[:, 1]
    )
    plane2 = (1 - yf) * ((1 - xf) * r12[:, 0] + xf * r12[:, 1]) + yf * (
        (1 - xf) * r22[:, 0] + xf * r22[:, 1]
    )
    out = (1 - zf) * plane1 + zf * plane2
    return out.reshape(out_shape)


def interpz(vol: jax.Array, x: jax.Array, y: jax.Array, z: jax.Array) -> jax.Array:
    """Interpolate along z only at integer (x, y) (Frangi::interpz,
    pnr-vaa3d/frangi.cpp:1201-1228)."""
    l, h, w = vol.shape
    v = vol.astype(jnp.float32)
    xi = jnp.asarray(x, jnp.int32)
    yi = jnp.asarray(y, jnp.int32)
    if l == 1:
        return v[0, yi, xi]
    z1 = jnp.clip(jnp.asarray(z, jnp.int32), 0, l - 2)
    zf = jnp.clip(z - z1, 0.0, 1.0)
    i1 = v[z1, yi, xi]
    i2 = v[z1 + 1, yi, xi]
    return (1 - zf) * i1 + zf * i2
