"""Zero-mean NCC of trilinearly sampled patches against cylinder templates.

Parity target: `Tracker::znccBBB` (pnr-vaa3d/tracker.cpp:1891-1964)
with its template tables built in the Tracker constructor
(tracker.cpp:178-232): per sigma, offsets live on a local (v, u, w)
frame — v along the test direction in [-round(1*sigma), +round],
u and w orthogonal in [-round(3*sigma), +round] — on a fractional grid
of pitch max(1, 3*sigma/12); template weights are the cylindrical
Gaussian exp(-(u^2+w^2)/(2 sigma^2)). The local frame derives from the
direction exactly as the reference (tracker.cpp:1893-1917), including
its non-standard w-vector sign convention. The returned correlation is
the max over sigmas; the argmax sigma is the radius estimate.

TPU design: one batched evaluation for an arbitrary number of query
(position, direction) pairs. Offsets per sigma are padded to a common
K and masked; sigmas are unrolled (a static loop) so each scale is one
fused gather + reduction, keeping peak memory at B x K. The template
auto-correlation term (corrc) is constant per sigma and precomputed.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pnr_tpu.ops.interp import trilinear

_FLT_MIN = 1.175494e-38


# Model tables live in the jax-free ops/zncc_model.py (shared with the
# host one-shot engine); re-exported here for compatibility.
from pnr_tpu.ops.zncc_model import ZnccTemplates, _frac_range  # noqa: F401


def local_frame(
    vx: jax.Array, vy: jax.Array, vz: jax.Array, is2d: bool
) -> Tuple[jax.Array, jax.Array]:
    """(u, w) orthogonal frame for direction v (tracker.cpp:1893-1917).

    Returns u, w each of shape (..., 3). Note the reference's w is not a
    standard cross product (the y component has a flipped sign); we
    reproduce it verbatim for parity.
    """
    nrm = jnp.sqrt(vx * vx + vy * vy)
    planar = nrm > 1e-4
    safe = jnp.where(planar, nrm, 1.0)
    sg = jnp.where(vy < 0, -1.0, 1.0)
    ux = jnp.where(planar, sg * (vy / safe), 1.0)
    uy = jnp.where(planar, -sg * (vx / safe), 0.0)
    uz = jnp.zeros_like(ux)
    if is2d:
        wx = wy = wz = jnp.zeros_like(ux)
    else:
        wx = uy * vz - uz * vy
        wy = -ux * vz + uz * vx
        wz = ux * vy - uy * vx
    u = jnp.stack([ux, uy, uz], axis=-1)
    w = jnp.stack([wx, wy, wz], axis=-1)
    return u, w


def zncc_batch(
    img: jax.Array,
    pos: jax.Array,
    dirs: jax.Array,
    offs: jax.Array,
    wgt: jax.Array,
    mask: jax.Array,
    cnt: jax.Array,
    avg: jax.Array,
    corrc: jax.Array,
    sigmas: Tuple[float, ...],
    is2d: bool,
) -> Tuple[jax.Array, jax.Array]:
    """Batched znccBBB: max correlation over sigmas and the argmax sigma.

    img: (Z, Y, X) volume (any dtype, sampled as float).
    pos: (B, 3) query positions in (x, y, z) order.
    dirs: (B, 3) unit directions in (vx, vy, vz) order.
    Template arrays as built by ZnccTemplates.
    Returns (corr (B,), sig (B,)).
    """
    vx, vy, vz = dirs[:, 0], dirs[:, 1], dirs[:, 2]
    u, w = local_frame(vx, vy, vz, is2d)  # (B, 3)
    neg_v = -dirs  # template's v axis points against the direction (tracker.cpp:1931)

    best_corr = jnp.full((pos.shape[0],), -jnp.inf, jnp.float32)
    best_sig = jnp.ones((pos.shape[0],), jnp.float32)

    for si in range(len(sigmas)):
        o = offs[si]  # (K, 3) in (v, u, w) local coords
        m = mask[si]  # (K,)
        g = wgt[si]  # (K,)
        k_cnt = cnt[si]

        # world = pos + v_off * (-dir) + u_off * u + w_off * w
        world = (
            pos[:, None, :]
            + o[None, :, 0:1] * neg_v[:, None, :]
            + o[None, :, 1:2] * u[:, None, :]
            + o[None, :, 2:3] * w[:, None, :]
        )  # (B, K, 3)
        vals = trilinear(img, world[..., 0], world[..., 1], world[..., 2])  # (B, K)
        vals = vals * m[None, :]

        ag = jnp.sum(vals, axis=1) / k_cnt  # (B,)
        dv = (vals - ag[:, None]) * m[None, :]
        dw = (g - avg[si]) * m
        corra = jnp.sum(dv * dw[None, :], axis=1)
        corrb = jnp.sum(dv * dv, axis=1)
        denom = corrb * corrc[si]
        corr = jnp.where(denom > _FLT_MIN, corra / jnp.sqrt(jnp.maximum(denom, _FLT_MIN)), 0.0)

        take = corr > best_corr
        best_corr = jnp.where(take, corr, best_corr)
        best_sig = jnp.where(take, jnp.float32(sigmas[si]), best_sig)

    return best_corr, best_sig


#: Fixed internal batch: XLA:TPU compile time for the fused gather+reduce
#: graph is wildly shape-dependent (measured: B=512 -> 4 s, B=256 -> 315 s);
#: all public entry points pad/chunk to this shape so only one body compiles.
ZNCC_CHUNK = 512


def make_zncc_fn(templates: ZnccTemplates, chunk: int = ZNCC_CHUNK):
    """Bind template constants into a jittable (img, pos, dirs) -> (corr, sig).

    Arbitrary batch sizes are handled by padding to `chunk` and scanning
    chunks with `lax.map`, so the compiled body has a single, known-good
    shape regardless of the caller's B.
    """
    offs = jnp.asarray(templates.offs)
    wgt = jnp.asarray(templates.wgt)
    mask = jnp.asarray(templates.mask)
    cnt = jnp.asarray(templates.cnt)
    avg = jnp.asarray(templates.avg)
    corrc = jnp.asarray(templates.corrc)
    sigmas = templates.sigmas
    is2d = templates.is2d

    def body(img, pos, dirs):
        return zncc_batch(img, pos, dirs, offs, wgt, mask, cnt, avg, corrc, sigmas, is2d)

    def fn(img, pos, dirs):
        b = pos.shape[0]
        if b == chunk:
            return body(img, pos, dirs)
        nchunk = -(-b // chunk)
        pad = nchunk * chunk - b
        pos_p = jnp.pad(pos, ((0, pad), (0, 0))).reshape(nchunk, chunk, 3)
        dirs_p = jnp.pad(dirs, ((0, pad), (0, 0)), constant_values=1.0).reshape(
            nchunk, chunk, 3
        )
        if nchunk == 1:
            corr, sig = body(img, pos_p[0], dirs_p[0])
        else:
            corr, sig = jax.lax.map(lambda ab: body(img, ab[0], ab[1]), (pos_p, dirs_p))
            corr = corr.reshape(-1)
            sig = sig.reshape(-1)
        return corr[:b], sig[:b]

    return fn
