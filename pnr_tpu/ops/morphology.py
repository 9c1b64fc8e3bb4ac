"""Separable grayscale morphology (erosion / dilation).

Parity targets: `Frangi::imerode` (pnr-vaa3d/frangi.cpp:879-1108) and
`Frangi::imdilate` (:1110-1199): 1-D min/max filters of half-width
ceil(rad) along x and y (and ceil(rad/zdist) along z for the xyz
variant) with clamped borders. A min/max over a clamped-index window
equals the min/max over the in-range portion of the window, so
`lax.reduce_window` with identity padding is exact parity.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


def _window_reduce(vol: jax.Array, half: int, axis: int, op: str) -> jax.Array:
    dims = [1] * vol.ndim
    dims[axis] = 2 * half + 1
    pad = [(0, 0)] * vol.ndim
    pad[axis] = (half, half)
    if op == "min":
        init = jnp.asarray(jnp.iinfo(vol.dtype).max if jnp.issubdtype(vol.dtype, jnp.integer) else jnp.inf, vol.dtype)
        fn = jax.lax.min
    else:
        init = jnp.asarray(jnp.iinfo(vol.dtype).min if jnp.issubdtype(vol.dtype, jnp.integer) else -jnp.inf, vol.dtype)
        fn = jax.lax.max
    return jax.lax.reduce_window(
        vol, init, fn, window_dimensions=tuple(dims), window_strides=(1,) * vol.ndim,
        padding=tuple(pad),
    )


@partial(jax.jit, static_argnames=("rad",))
def imerode_xy(vol: jax.Array, rad: float) -> jax.Array:
    """Per-slice xy erosion of a (Z, Y, X) volume (frangi.cpp:879-969)."""
    half = int(math.ceil(rad))
    v = _window_reduce(vol, half, axis=2, op="min")
    v = _window_reduce(v, half, axis=1, op="min")
    return v


@partial(jax.jit, static_argnames=("rad", "zdist"))
def imerode_xyz(vol: jax.Array, rad: float, zdist: float) -> jax.Array:
    """3-D erosion with z radius scaled by 1/zdist (frangi.cpp:971-1108)."""
    half = int(math.ceil(rad))
    v = _window_reduce(vol, half, axis=2, op="min")
    v = _window_reduce(v, half, axis=1, op="min")
    if vol.shape[0] > 1:
        half_z = int(math.ceil(rad / zdist))
        v = _window_reduce(v, half_z, axis=0, op="min")
    return v


@partial(jax.jit, static_argnames=("rad",))
def imdilate_xy(vol: jax.Array, rad: float) -> jax.Array:
    """Per-slice xy dilation of a (Z, Y, X) volume (frangi.cpp:1110-1199)."""
    half = int(math.ceil(rad))
    v = _window_reduce(vol, half, axis=2, op="max")
    v = _window_reduce(v, half, axis=1, op="max")
    return v
