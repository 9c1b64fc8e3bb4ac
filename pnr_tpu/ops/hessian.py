"""Hessian of the Gaussian-smoothed volume via repeated first differences.

Parity target: `Frangi::hessian3d` (pnr-vaa3d/frangi.cpp:291-390) and
`hessian2d` (:507-561): each second derivative is the first-difference
operator applied twice (central differences in the interior, one-sided
at the borders — exactly `jnp.gradient` semantics), scaled by sigma^2
(gamma-normalization). Cross terms derive from the same intermediate
first derivative as the reference (Dyz from Dy; Dxy, Dxz from Dx).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from pnr_tpu.ops.gaussian import imgaussian2d, imgaussian3d


def _d(f: jax.Array, axis: int) -> jax.Array:
    """First difference: central interior, one-sided borders (frangi.cpp:306-311)."""
    return jnp.gradient(f, axis=axis)


@partial(jax.jit, static_argnames=("sigma", "zdist"))
def hessian3d(
    vol: jax.Array, sigma: float, zdist: float
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Scaled Hessian components of a (Z, Y, X) volume.

    Returns (Dzz, Dyy, Dyz, Dxx, Dxy, Dxz), each * sigma^2.
    """
    f = imgaussian3d(vol, sigma, zdist)
    s2 = jnp.float32(float(sigma) * float(sigma))

    dz = _d(f, 0)
    dzz = _d(dz, 0) * s2

    dy = _d(f, 1)
    dyy = _d(dy, 1) * s2
    dyz = _d(dy, 0) * s2

    dx = _d(f, 2)
    dxx = _d(dx, 2) * s2
    dxy = _d(dx, 1) * s2
    dxz = _d(dx, 0) * s2

    return dzz, dyy, dyz, dxx, dxy, dxz


@partial(jax.jit, static_argnames=("sigma",))
def hessian2d(img: jax.Array, sigma: float) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Scaled Hessian components of a (Y, X) image: (Dyy, Dxy, Dxx) * sigma^2."""
    f = imgaussian2d(img, sigma)
    s2 = jnp.float32(float(sigma) * float(sigma))

    dy = _d(f, 0)
    dyy = _d(dy, 0) * s2

    dx = _d(f, 1)
    dxx = _d(dx, 1) * s2
    dxy = _d(dx, 0) * s2

    return dyy, dxy, dxx
