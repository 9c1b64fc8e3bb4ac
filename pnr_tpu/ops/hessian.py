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

    On TPU every difference pass runs as a Pallas 3-tap conv with
    `jnp.gradient` border semantics (read-once/write-once HBM traffic;
    see ops/pallas_conv.py); the sigma^2 gamma-normalization folds into
    the second pass' taps so no extra elementwise pass is needed.
    """
    from pnr_tpu.ops.pallas_conv import mosaic_available, pallas_conv1d_along_axis

    f = imgaussian3d(vol, sigma, zdist)
    s2 = float(sigma) * float(sigma)

    if f.ndim == 3 and mosaic_available():
        g1 = (-0.5, 0.0, 0.5)
        g2 = (-0.5 * s2, 0.0, 0.5 * s2)

        def d1(a, axis):
            return pallas_conv1d_along_axis(a, g1, axis, grad_border=True)

        def d2(a, axis):
            return pallas_conv1d_along_axis(a, g2, axis, grad_border=True)

        dz = d1(f, 0)
        dzz = d2(dz, 0)
        dy = d1(f, 1)
        dyy = d2(dy, 1)
        dyz = d2(dy, 0)
        dx = d1(f, 2)
        dxx = d2(dx, 2)
        dxy = d2(dx, 1)
        dxz = d2(dx, 0)
        return dzz, dyy, dyz, dxx, dxy, dxz

    s2 = jnp.float32(s2)
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
