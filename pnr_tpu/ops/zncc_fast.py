"""Fast tube-approximation ZNCC: likelihood from precomputed maps.

TPU-native redesign of the ZNCC likelihood (znccBBB,
pnr-vaa3d/tracker.cpp:1891-1964). The exact template evaluation gathers
~2.5k trilinear samples per query per sigma — random-access bound on
TPU. This variant restructures the computation so the heavy work is
dense convolutions (MXU/VPU-friendly, done ONCE per volume) and each
query costs only ~n_v map samples:

The template is a cylinder: weights g(u,w) = exp(-(u^2+w^2)/(2 s^2))
independent of v. Writing the correlation through three image sums
  T1 = sum_k I_k g_k,  T2 = sum_k I_k,  T3 = sum_k I_k^2,
each is a sum over the v-axis of a plane integral perpendicular to the
direction. Those plane integrals are approximated by ISOTROPIC 3-D
convolutions (exact when the image is locally invariant along the
direction — the tube hypothesis the tracker tests):

  T1(p) ~= a1 * sum_v M1(p + v*dir),  M1 = I  (*) exp(-|r|^2/2s^2)
  T2(p) ~= a2 * sum_v M2(p + v*dir),  M2 = I  (*) box_{3s}
  T3(p) ~= a2 * sum_v M3(p + v*dir),  M3 = I^2(*) box_{3s}

with constants a1, a2 fixed by matching the I==1 response (lattice
kernel sums). The construction is affine-covariant in the image, so
the resulting correlation retains ZNCC's invariance to brightness and
contrast. corr = (T1 - gbar*T2) / sqrt((T3 - T2^2/N) * corrc), max
over sigmas, argmax sigma as the radius estimate — the same public
contract as the exact `zncc` (select with PNRConfig.zncc_mode).
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pnr_tpu.ops.gaussian import conv1d_along_axis
from pnr_tpu.ops.interp import trilinear
from pnr_tpu.ops.zncc import _frac_range

_FLT_MIN = 1.175494e-38


class TubeZnccModel:
    """Per-sigma constants for the tube ZNCC (host-precomputed)."""

    def __init__(self, sigmas: Sequence[float], is2d: bool, samples_per_3sig: int = 12):
        self.sigmas = tuple(float(s) for s in sigmas)
        self.is2d = bool(is2d)
        s = len(self.sigmas)

        self.v_grids = []  # per sigma: v-axis sample offsets
        self.alpha1 = np.zeros(s, np.float32)
        self.alpha2 = np.zeros(s, np.float32)
        self.gbar = np.zeros(s, np.float32)
        self.n = np.zeros(s, np.float32)
        self.corrc = np.zeros(s, np.float32)
        self.gauss_kernels = []  # unnormalized exp(-t^2/2s^2) 1-D kernels
        self.box_half = []

        for i, sig in enumerate(self.sigmas):
            v2 = int(round(1.0 * sig))
            u2 = int(round(3.0 * sig))
            pitch = max(1.0, (3.0 * sig) / samples_per_3sig)
            vv = _frac_range(v2, pitch)
            uu = _frac_range(u2, pitch)
            self.v_grids.append(vv)

            if self.is2d:
                u_g = uu
                g = np.exp(-(u_g**2) / (2.0 * sig * sig))
            else:
                u_g, w_g = np.meshgrid(uu, uu, indexing="ij")
                g = np.exp(-(u_g**2 + w_g**2) / (2.0 * sig * sig)).reshape(-1)
            n_uw = g.size
            n_total = len(vv) * n_uw
            gsum = float(g.sum())
            gbar = gsum / n_uw  # template mean per v-plane == overall mean
            self.n[i] = n_total
            self.gbar[i] = gbar
            # template auto-correlation sum_k (g_k - gbar)^2 over ALL samples
            self.corrc[i] = float(len(vv) * np.sum((g - gbar) ** 2))

            half = int(math.ceil(3.0 * sig))
            t = np.arange(-half, half + 1, dtype=np.float64)
            k1 = np.exp(-(t * t) / (2.0 * sig * sig))
            self.gauss_kernels.append(k1.astype(np.float32))
            s1d = float(k1.sum())
            dims = 2 if self.is2d else 3
            # match I==1: sum_v M1 = n_v * s1d^dims  ->  a1 * that == n_v * gsum
            self.alpha1[i] = gsum / (s1d**dims)

            bh = u2
            self.box_half.append(bh)
            box_total = float((2 * bh + 1) ** dims)
            self.alpha2[i] = n_uw / box_total


def _box_filter(vol: jax.Array, half: int, is2d: bool) -> jax.Array:
    k = np.ones(2 * half + 1, np.float32)
    v = conv1d_along_axis(vol, k, axis=2)
    v = conv1d_along_axis(v, k, axis=1)
    if not is2d:
        v = conv1d_along_axis(v, k, axis=0)
    return v


def build_tube_maps(img: jax.Array, model: TubeZnccModel) -> jax.Array:
    """Precompute the (3*S, Z, Y, X) planar map stack for a uint8 volume.

    Dense separable convolutions — the once-per-volume cost that buys
    ~100x fewer gathers per tracker query. Maps are PLANAR: measured on
    TPU, three (1,2)-pair gathers beat one interleaved (1,6)-slice
    gather 7x, and a trailing channel axis would be lane-tiled to 128
    and waste 42x memory.
    """
    f = img.astype(jnp.float32)
    f2 = f * f
    per_sig = []
    for i, sig in enumerate(model.sigmas):
        k1 = model.gauss_kernels[i]
        m1 = conv1d_along_axis(f, k1, axis=2)
        m1 = conv1d_along_axis(m1, k1, axis=1)
        if not model.is2d:
            m1 = conv1d_along_axis(m1, k1, axis=0)
        bh = model.box_half[i]
        m2 = _box_filter(f, bh, model.is2d)
        m3 = _box_filter(f2, bh, model.is2d)
        per_sig += [m1, m2, m3]
    return jnp.stack(per_sig)  # (3S, Z, Y, X)


def make_tube_zncc_fn(model: TubeZnccModel):
    """(maps, pos, dirs) -> (corr, sig); same contract as the exact zncc."""
    sigmas = model.sigmas
    v_grids = [jnp.asarray(v) for v in model.v_grids]
    a1 = model.alpha1
    a2 = model.alpha2
    gbar = model.gbar
    ntot = model.n
    corrc = model.corrc

    def fn(maps, pos, dirs):
        best_corr = jnp.full((pos.shape[0],), -jnp.inf, jnp.float32)
        best_sig = jnp.ones((pos.shape[0],), jnp.float32)
        for si in range(len(sigmas)):
            vv = v_grids[si]  # (n_v,)
            # sample points p + v * dir (note: the exact template offsets
            # use v * (-dir); the v grid is symmetric so the sign is moot)
            pts = pos[:, None, :] + vv[None, :, None] * dirs[:, None, :]
            x = pts[..., 0]
            y = pts[..., 1]
            z = pts[..., 2]
            s1 = trilinear(maps[3 * si], x, y, z).sum(axis=1) * a1[si]
            s2 = trilinear(maps[3 * si + 1], x, y, z).sum(axis=1) * a2[si]
            s3 = trilinear(maps[3 * si + 2], x, y, z).sum(axis=1) * a2[si]

            corra = s1 - gbar[si] * s2
            corrb = jnp.maximum(s3 - (s2 * s2) / ntot[si], 0.0)
            denom = corrb * corrc[si]
            corr = jnp.where(
                denom > _FLT_MIN, corra / jnp.sqrt(jnp.maximum(denom, _FLT_MIN)), 0.0
            )
            take = corr > best_corr
            best_corr = jnp.where(take, corr, best_corr)
            best_sig = jnp.where(take, jnp.float32(sigmas[si]), best_sig)
        return best_corr, best_sig

    return fn
