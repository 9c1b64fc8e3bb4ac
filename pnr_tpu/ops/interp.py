"""Clamped trilinear / bilinear image sampling.

Parity target: `Tracker::interp` (pnr-vaa3d/tracker.cpp:2138-2215):
coordinates are clamped to [0, dim-1.001] before the floor, so the two
gather corners always stay in range and out-of-volume queries sample
the nearest edge. For single-slice volumes (l==1) the z coordinate is
ignored (bilinear).

TPU design: one vectorized 8-corner gather over an arbitrary batch of
query points. On TPU the gathers dominate; the flattened-index form
below gives XLA a single gather dimension to vectorize.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def trilinear(vol: jax.Array, x: jax.Array, y: jax.Array, z: jax.Array) -> jax.Array:
    """Sample (Z, Y, X) `vol` at float coordinates; shapes of x/y/z broadcast.

    Returns float32 samples with the reference's clamping semantics.
    """
    l, h, w = vol.shape
    v = vol.reshape(-1).astype(jnp.float32)

    xc = jnp.clip(x, 0.0, w - 1.001)
    x1 = jnp.floor(xc).astype(jnp.int32)
    xf = xc - x1

    yc = jnp.clip(y, 0.0, h - 1.001)
    y1 = jnp.floor(yc).astype(jnp.int32)
    yf = yc - y1

    if l == 1:
        base = y1 * w + x1
        i11 = v[base]
        i12 = v[base + 1]
        i21 = v[base + w]
        i22 = v[base + w + 1]
        return (1 - yf) * ((1 - xf) * i11 + xf * i12) + yf * ((1 - xf) * i21 + xf * i22)

    zc = jnp.clip(z, 0.0, l - 1.001)
    z1 = jnp.floor(zc).astype(jnp.int32)
    zf = zc - z1

    base = (z1 * h + y1) * w + x1
    i11_1 = v[base]
    i12_1 = v[base + 1]
    i21_1 = v[base + w]
    i22_1 = v[base + w + 1]
    base2 = base + h * w
    i11_2 = v[base2]
    i12_2 = v[base2 + 1]
    i21_2 = v[base2 + w]
    i22_2 = v[base2 + w + 1]

    plane1 = (1 - yf) * ((1 - xf) * i11_1 + xf * i12_1) + yf * ((1 - xf) * i21_1 + xf * i22_1)
    plane2 = (1 - yf) * ((1 - xf) * i11_2 + xf * i12_2) + yf * ((1 - xf) * i21_2 + xf * i22_2)
    return (1 - zf) * plane1 + zf * plane2
