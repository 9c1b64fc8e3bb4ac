"""Batched analytic symmetric 3x3 eigendecomposition for vesselness.

The reference diagonalizes one 3x3 Hessian per voxel with an EISPACK
tred2/tql2 port (pnr-vaa3d/frangi.cpp:1269-1493) inside a scalar loop —
the hottest loop of the whole filter. Here every voxel is solved at
once on the VPU with the closed-form trigonometric method for symmetric
3x3 matrices (Cardano / Smith), plus a cross-product eigenvector
recovery. Eigenvalues are returned sorted by |lambda| ascending, and
the eigenvector of the |lambda|-smallest eigenvalue (the vessel
direction) is recovered — matching the sort in `eigen_decomposition`
(frangi.cpp:1286-1304) and the use of Davec[:,0] (frangi.cpp:240-250).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_EPS = 1e-20


def _eigenvalues3(a11, a22, a33, a12, a13, a23):
    """Closed-form eigenvalues of a symmetric 3x3, ascending order."""
    p1 = a12 * a12 + a13 * a13 + a23 * a23
    q = (a11 + a22 + a33) / 3.0
    b11, b22, b33 = a11 - q, a22 - q, a33 - q
    p2 = b11 * b11 + b22 * b22 + b33 * b33 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 0.0))
    psafe = jnp.maximum(p, _EPS)
    # det((A - q I) / p) / 2
    c11, c22, c33 = b11 / psafe, b22 / psafe, b33 / psafe
    c12, c13, c23 = a12 / psafe, a13 / psafe, a23 / psafe
    detb = (
        c11 * (c22 * c33 - c23 * c23)
        - c12 * (c12 * c33 - c23 * c13)
        + c13 * (c12 * c23 - c22 * c13)
    )
    r = jnp.clip(detb / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    e_hi = q + 2.0 * p * jnp.cos(phi)
    e_lo = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e_mid = 3.0 * q - e_hi - e_lo
    # p ~ 0 => (near-)diagonal with equal entries: all eigenvalues = q.
    diag = p2 <= _EPS
    e_lo = jnp.where(diag, q, e_lo)
    e_mid = jnp.where(diag, q, e_mid)
    e_hi = jnp.where(diag, q, e_hi)
    return e_lo, e_mid, e_hi  # ascending


def _eigenvector3(a11, a22, a33, a12, a13, a23, lam):
    """Eigenvector for eigenvalue `lam`: largest cross product of rows of A - lam I."""
    r1 = (a11 - lam, a12, a13)
    r2 = (a12, a22 - lam, a23)
    r3 = (a13, a23, a33 - lam)

    def cross(u, v):
        return (
            u[1] * v[2] - u[2] * v[1],
            u[2] * v[0] - u[0] * v[2],
            u[0] * v[1] - u[1] * v[0],
        )

    c1 = cross(r1, r2)
    c2 = cross(r1, r3)
    c3 = cross(r2, r3)
    n1 = c1[0] * c1[0] + c1[1] * c1[1] + c1[2] * c1[2]
    n2 = c2[0] * c2[0] + c2[1] * c2[1] + c2[2] * c2[2]
    n3 = c3[0] * c3[0] + c3[1] * c3[1] + c3[2] * c3[2]

    use2 = n2 > n1
    vx = jnp.where(use2, c2[0], c1[0])
    vy = jnp.where(use2, c2[1], c1[1])
    vz = jnp.where(use2, c2[2], c1[2])
    nbest = jnp.where(use2, n2, n1)
    use3 = n3 > nbest
    vx = jnp.where(use3, c3[0], vx)
    vy = jnp.where(use3, c3[1], vy)
    vz = jnp.where(use3, c3[2], vz)
    nbest = jnp.where(use3, n3, nbest)

    # Degenerate (repeated eigenvalue / zero matrix): direction is not
    # meaningful for vesselness there (response gated to ~0); emit +x.
    degen = nbest <= _EPS
    inv = jax.lax.rsqrt(jnp.maximum(nbest, _EPS))
    vx = jnp.where(degen, 1.0, vx * inv)
    vy = jnp.where(degen, 0.0, vy * inv)
    vz = jnp.where(degen, 0.0, vz * inv)
    return vx, vy, vz


def eigh3x3_vessel(
    dxx: jax.Array,
    dyy: jax.Array,
    dzz: jax.Array,
    dxy: jax.Array,
    dxz: jax.Array,
    dyz: jax.Array,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Per-element eigensolve of [[dxx,dxy,dxz],[dxy,dyy,dyz],[dxz,dyz,dzz]].

    Returns (lam1, lam2, lam3, vx, vy, vz) where |lam1|<=|lam2|<=|lam3|
    and (vx,vy,vz) is the unit eigenvector of lam1 (vessel direction).
    All inputs/outputs share an arbitrary common shape.
    """
    a11 = dxx.astype(jnp.float32)
    a22 = dyy.astype(jnp.float32)
    a33 = dzz.astype(jnp.float32)
    a12 = dxy.astype(jnp.float32)
    a13 = dxz.astype(jnp.float32)
    a23 = dyz.astype(jnp.float32)

    e_lo, e_mid, e_hi = _eigenvalues3(a11, a22, a33, a12, a13, a23)

    # Sort the three eigenvalues by absolute value (ascending).
    ab_lo, ab_mid, ab_hi = jnp.abs(e_lo), jnp.abs(e_mid), jnp.abs(e_hi)

    def pick2(c, a, b):
        return jnp.where(c, a, b)

    # Enumerate the 3! orderings via pairwise comparisons.
    # Stage 1: order (e_lo, e_mid) by abs.
    s1 = ab_lo <= ab_mid
    p0, p1 = pick2(s1, e_lo, e_mid), pick2(s1, e_mid, e_lo)
    q0, q1 = pick2(s1, ab_lo, ab_mid), pick2(s1, ab_mid, ab_lo)
    # Stage 2: insert e_hi.
    s2 = ab_hi < q0
    s3 = ab_hi < q1
    lam1 = pick2(s2, e_hi, p0)
    lam2 = pick2(s2, p0, pick2(s3, e_hi, p1))
    lam3 = pick2(s2, p1, pick2(s3, p1, e_hi))
    del q0, q1

    vx, vy, vz = _eigenvector3(a11, a22, a33, a12, a13, a23, lam1)
    return lam1, lam2, lam3, vx, vy, vz
