"""Multi-scale Frangi vesselness with principal-direction output.

Parity targets: `Frangi::frangi3d` (pnr-vaa3d/frangi.cpp:152-289) and
`Frangi::frangi2d` (:392-505). Per voxel per scale the 3-D variant
computes Ra=|l2|/|l3|, Rb=|l1|/sqrt(|l2 l3|), S=||lambda|| and

    J = (1 - exp(-Ra^2/2a^2)) * exp(-Rb^2/2b^2) * (1 - exp(-S^2/2C^2)),

zeroed where l2>0 or l3>0 (bright ridges on dark background,
blackwhite=false), NaN->0; the max over scales wins and its
lambda-smallest eigenvector is quantized to uint8 via (v+1)/2*255
(frangi.cpp:240-250).

TPU design: scales are a static Python loop (unrolled under jit); each
scale is one fused stencil + elementwise pass, with the per-voxel
eigensolve done analytically on the VPU (see eig3.py) instead of the
reference's scalar QL iteration.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from pnr_tpu.ops.eig3 import eigh3x3_vessel
from pnr_tpu.ops.hessian import hessian2d, hessian3d

_FLT_MIN = 1.175494e-38


def _quantize_dir(v: jax.Array) -> jax.Array:
    """uint8 direction quantization: round((v+1)/2*255), clamped (frangi.cpp:240-242)."""
    val = jnp.round(((v + 1.0) / 2.0) * 255.0)
    return jnp.clip(val, 0.0, 255.0).astype(jnp.uint8)


def _vesselness3d_scale(
    vol: jax.Array,
    sigma: float,
    zdist: float,
    alpha: float,
    beta: float,
    c: float,
    blackwhite: bool,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    dzz, dyy, dyz, dxx, dxy, dxz = hessian3d(vol, sigma, zdist)
    lam1, lam2, lam3, vx, vy, vz = eigh3x3_vessel(dxx, dyy, dzz, dxy, dxz, dyz)

    a1 = jnp.abs(lam1)
    a2 = jnp.abs(lam2)
    a3 = jnp.abs(lam3)

    ra = a2 / a3
    rb = a1 / jnp.sqrt(a2 * a3)
    s = jnp.sqrt(a1 * a1 + a2 * a2 + a3 * a3)

    exp_ra = 1.0 - jnp.exp(-(ra * ra) / (2.0 * alpha * alpha))
    exp_rb = jnp.exp(-(rb * rb) / (2.0 * beta * beta))
    exp_s = 1.0 - jnp.exp(-(s * s) / (2.0 * c * c))

    v = exp_ra * exp_rb * exp_s
    if blackwhite:
        v = jnp.where((lam2 < 0) | (lam3 < 0), 0.0, v)
    else:
        v = jnp.where((lam2 > 0) | (lam3 > 0), 0.0, v)
    v = jnp.where(jnp.isnan(v), 0.0, v)
    return v, vx, vy, vz


@partial(
    jax.jit,
    static_argnames=(
        "sigmas", "zdist", "alpha", "beta", "c", "blackwhite",
        "keep_first_scale",
    ),
)
def frangi3d(
    vol: jax.Array,
    sigmas: Sequence[float],
    zdist: float,
    alpha: float = 0.5,
    beta: float = 0.5,
    c: float = 500.0,
    blackwhite: bool = False,
    keep_first_scale: bool = False,
):
    """Multi-scale 3-D Frangi over a (Z, Y, X) volume.

    Returns (J, Jmin, Jmax, Vx, Vy, Vz): float32 vesselness, its
    min/max (reference running-min/max semantics: min over the
    first-scale response, max over the final response — values only
    grow across scales), and uint8-quantized directions.

    keep_first_scale=True appends the first scale's response volume
    (the one Jmin reduces) so tiled/blocked engines can reduce an
    EXACT Jmin over their kept region instead of the final-response
    min — costs one tile-sized f32 live across the scale loop.
    """
    j = None
    out_vx = out_vy = out_vz = None
    jmin = v1 = None
    for si, sig in enumerate(sigmas):
        v, vx, vy, vz = _vesselness3d_scale(
            vol, float(sig), float(zdist), alpha, beta, c, blackwhite
        )
        if si == 0:
            j = v
            v1 = v
            jmin = jnp.min(v)
            out_vx = _quantize_dir(vx)
            out_vy = _quantize_dir(vy)
            out_vz = _quantize_dir(vz)
        else:
            upd = v > j
            j = jnp.where(upd, v, j)
            out_vx = jnp.where(upd, _quantize_dir(vx), out_vx)
            out_vy = jnp.where(upd, _quantize_dir(vy), out_vy)
            out_vz = jnp.where(upd, _quantize_dir(vz), out_vz)
    jmax = jnp.max(j)
    if keep_first_scale:
        return j, jmin, jmax, out_vx, out_vy, out_vz, v1
    return j, jmin, jmax, out_vx, out_vy, out_vz


@partial(
    jax.jit,
    static_argnames=(
        "sigmas", "beta_one", "beta_two", "blackwhite", "keep_first_scale",
    ),
)
def frangi2d(
    img: jax.Array,
    sigmas: Sequence[float],
    beta_one: float = 0.5,
    beta_two: float = 15.0,
    blackwhite: bool = False,
    keep_first_scale: bool = False,
):
    """Multi-scale 2-D Frangi over a (Y, X) image (frangi.cpp:392-505).

    Replicates the reference's intentional eigen-axis swap
    (frangi.cpp:444): Lambda1 carries the larger |mu|; the emitted
    direction is the eigenvector v2 when the swap triggers.
    Returns (J, Jmin, Jmax, Vx, Vy, Vz) with Vz == 0;
    keep_first_scale appends the first scale's response (see frangi3d).
    """
    beta_term = 2.0 * beta_one * beta_one
    c_term = 2.0 * beta_two * beta_two

    j = None
    out_vx = out_vy = None
    jmin = v1 = None
    for si, sig in enumerate(sigmas):
        dyy, dxy, dxx = hessian2d(img, float(sig))

        tmp = jnp.sqrt((dxx - dyy) ** 2 + 4.0 * dxy * dxy)
        v2x = 2.0 * dxy
        v2y = dyy - dxx + tmp
        mag = jnp.sqrt(v2x * v2x + v2y * v2y)
        safe = mag > 0
        v2x = jnp.where(safe, v2x / jnp.where(safe, mag, 1.0), v2x)
        v2y = jnp.where(safe, v2y / jnp.where(safe, mag, 1.0), v2y)
        v1x = -v2y
        v1y = v2x

        mu1 = 0.5 * (dxx + dyy + tmp)
        mu2 = 0.5 * (dxx + dyy - tmp)

        check = jnp.abs(mu1) < jnp.abs(mu2)
        lam1 = jnp.where(check, mu2, mu1)
        lam2 = jnp.where(check, mu1, mu2)
        vecx = jnp.where(check, v2x, v1x)
        vecy = jnp.where(check, v2y, v1y)

        lam1 = jnp.where(lam1 == 0, _FLT_MIN, lam1)
        rb = (lam2 / lam1) ** 2
        s2 = lam1 * lam1 + lam2 * lam2
        v = jnp.exp(-rb / beta_term) * (1.0 - jnp.exp(-s2 / c_term))
        if blackwhite:
            v = jnp.where(lam1 < 0, 0.0, v)
        else:
            v = jnp.where(lam1 > 0, 0.0, v)

        vecn = jnp.sqrt(vecx * vecx + vecy * vecy)
        vecn = jnp.where(vecn > 0, vecn, 1.0)
        qx = _quantize_dir(vecx / vecn)
        qy = _quantize_dir(vecy / vecn)

        if si == 0:
            j = v
            v1 = v
            jmin = jnp.min(v)
            out_vx, out_vy = qx, qy
        else:
            upd = v > j
            j = jnp.where(upd, v, j)
            out_vx = jnp.where(upd, qx, out_vx)
            out_vy = jnp.where(upd, qy, out_vy)
    jmax = jnp.max(j)
    out_vz = jnp.zeros_like(out_vx)
    if keep_first_scale:
        return j, jmin, jmax, out_vx, out_vy, out_vz, v1
    return j, jmin, jmax, out_vx, out_vy, out_vz


@jax.jit
def normalize_to_u8(j: jax.Array, jmin: jax.Array, jmax: jax.Array) -> jax.Array:
    """Min-max normalize float J to uint8 J8 (Advantra_plugin.cpp:2499-2512)."""
    span = jmax - jmin
    degenerate = jnp.abs(span) <= _FLT_MIN
    val = jnp.round(((j - jmin) / jnp.where(degenerate, 1.0, span)) * 255.0)
    val = jnp.clip(val, 0.0, 255.0)
    return jnp.where(degenerate, 0.0, val).astype(jnp.uint8)
