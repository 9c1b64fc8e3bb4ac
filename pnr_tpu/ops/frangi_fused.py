"""Fully-fused multi-scale Frangi: one Pallas kernel, one volume read.

Parity target: `Frangi::frangi3d` (pnr-vaa3d/frangi.cpp:152-289) == the
XLA composition in ops/frangi.py (imgaussian3d -> hessian3d -> eig3 ->
vesselness -> max-over-scales merge). The unfused path moves ~100+
B/voxel through HBM (every Gaussian/difference pass is a read+write);
this kernel is the round-3 hand fusion: the raw uint8 volume is read
ONCE, all per-scale smoothing, Hessian, eigensolve, vesselness and the
cross-scale merge happen in VMEM, and only J (f32) + packed directions
(i32) leave the chip -- ~15 B/voxel of kernel traffic plus the padding
prologue and unpack epilogue.

Structure (grid = (y-tiles, z-tiles), z innermost; scratch persists
across sequential grid steps):

* Per grid step the kernel DMAs the new raw z-planes for this tile
  column (double-buffered, uint8, 8-aligned y windows, full 128-aligned
  lanes), casts u8->i32->f32, and runs the per-sigma separable x+y
  Gaussian on each plane with static lane/sublane tap slices. Smoothed
  planes land in per-sigma mod-addressed VMEM rings sized
  bz + HZ + hz_sigma + 4 (hz = ceil(3*sigma/zdist), HZ = max over
  sigmas): wide enough to hold both the current tile's z window and the
  planes arriving at the shared max-sigma processing front, which later
  tiles will read. A z-tile step only pays `bz` new planes, so the
  z-halo costs no extra HBM traffic (the round-2 VMEM blocker for a
  tile-halo formulation).
* Per output plane, the z Gaussian contracts each sigma's ring into a
  5-deep F window (mod-5 scratch ring), from which central differences
  build the 6 gamma-scaled Hessian components with `jnp.gradient`
  border semantics (clamped stage values + doubled one-sided borders,
  reproduced with static border-row/lane fixes and iota masks).
* The closed-form symmetric 3x3 eigensolve runs per plane on the VPU;
  Mosaic has no `acos`, so the trigonometric method uses an
  Abramowitz-Stegun 4.4.45-style polynomial acos (|err| < 2e-8, below
  f32 noise). Vesselness, NaN gating, the strictly-greater
  max-over-scales merge and the (v+1)/2*255 direction quantization all
  happen in registers; directions leave packed as vx|vy<<8|vz<<16.
* Per-tile masked min/max rows make Jmin (first-scale min, the
  reference's running-min semantics) and Jmax free.

The public `frangi3d_fused` matches `frangi3d`'s contract exactly and
falls back to it when Mosaic is unavailable, the volume is 2-D/tiny,
or the rings would not fit VMEM.
"""

from __future__ import annotations

import functools
import math
import os
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pnr_tpu.ops.gaussian import gaussian_kernel

from pnr_tpu.utils.jax_setup import stabilize_pallas_cache_keys

stabilize_pallas_cache_keys()

#: bz=16,by=32 (est 13.5 MB) and bz=4,by=64 (est 14.6 MB) crash the
#: v5e compiler; bz=4,by=48 (est 11.2 MB, the round-3 sweep's fastest:
#: 879 Mvox/s chained vs 840 at 8x32 — throughput is flat in geometry,
#: the floor is per-plane DMA/op granularity) is validated — the
#: estimate undercounts Mosaic's transient allocations, so the gate
#: stays below the observed failures
_VMEM_BUDGET = 12 * 1024 * 1024
_EPS = 1e-20
_PI = math.pi

#: profiling-only ablation knob (set before first trace): "none" |
#: "noeig" (skip eigensolve+vesselness) | "smooth" (skip Hessian too) —
#: isolates the smoothing / derivative / eigen cost shares on hardware
_ABLATE = "none"


def _ru(v: int, m: int) -> int:
    return -(-v // m) * m


def _acos_poly(x):
    """Branch-free acos via the A&S 4.4.45-style 7-term polynomial.

    |error| <= ~2e-8 rad on [-1, 1] -- below float32 resolution of the
    downstream cos(), standing in for Mosaic's missing `acos`.
    """
    xa = jnp.abs(x)
    p = jnp.float32(-0.0012624911)
    for coef in (0.0066700901, -0.0170881256, 0.0308918810,
                 -0.0501743046, 0.0889789874, -0.2145988016,
                 1.5707963050):
        p = p * xa + jnp.float32(coef)
    r = jnp.sqrt(jnp.maximum(1.0 - xa, 0.0)) * p
    return jnp.where(x < 0, jnp.float32(_PI) - r, r)


def _eig3_vessel_plane(a11, a22, a33, a12, a13, a23):
    """Per-element |lambda|-sorted eigensolve (ops/eig3.py, acos-free)."""
    p1 = a12 * a12 + a13 * a13 + a23 * a23
    q = (a11 + a22 + a33) / 3.0
    b11, b22, b33 = a11 - q, a22 - q, a33 - q
    p2 = b11 * b11 + b22 * b22 + b33 * b33 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 0.0))
    psafe = jnp.maximum(p, _EPS)
    c11, c22, c33 = b11 / psafe, b22 / psafe, b33 / psafe
    c12, c13, c23 = a12 / psafe, a13 / psafe, a23 / psafe
    detb = (
        c11 * (c22 * c33 - c23 * c23)
        - c12 * (c12 * c33 - c23 * c13)
        + c13 * (c12 * c23 - c22 * c13)
    )
    r = jnp.clip(detb / 2.0, -1.0, 1.0)
    phi = _acos_poly(r) / 3.0
    e_hi = q + 2.0 * p * jnp.cos(phi)
    e_lo = q + 2.0 * p * jnp.cos(phi + jnp.float32(2.0 * _PI / 3.0))
    e_mid = 3.0 * q - e_hi - e_lo
    diag = p2 <= _EPS
    e_lo = jnp.where(diag, q, e_lo)
    e_mid = jnp.where(diag, q, e_mid)
    e_hi = jnp.where(diag, q, e_hi)

    ab_lo, ab_mid, ab_hi = jnp.abs(e_lo), jnp.abs(e_mid), jnp.abs(e_hi)
    s1 = ab_lo <= ab_mid
    p0 = jnp.where(s1, e_lo, e_mid)
    p1_ = jnp.where(s1, e_mid, e_lo)
    q0 = jnp.where(s1, ab_lo, ab_mid)
    q1 = jnp.where(s1, ab_mid, ab_lo)
    s2 = ab_hi < q0
    s3 = ab_hi < q1
    lam1 = jnp.where(s2, e_hi, p0)
    lam2 = jnp.where(s2, p0, jnp.where(s3, e_hi, p1_))
    lam3 = jnp.where(s2, p1_, jnp.where(s3, p1_, e_hi))

    # eigenvector of lam1: largest cross product of rows of A - lam1 I
    r1 = (a11 - lam1, a12, a13)
    r2 = (a12, a22 - lam1, a23)
    r3 = (a13, a23, a33 - lam1)

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
    degen = nbest <= _EPS
    inv = jax.lax.rsqrt(jnp.maximum(nbest, _EPS))
    vx = jnp.where(degen, 1.0, vx * inv)
    vy = jnp.where(degen, 0.0, vy * inv)
    vz = jnp.where(degen, 0.0, vz * inv)
    return lam1, lam2, lam3, vx, vy, vz


def _qpack(vx, vy, vz):
    """uint8 direction quantization packed into one int32 lane."""

    def q(v):
        return jnp.clip(jnp.round(((v + 1.0) / 2.0) * 255.0), 0.0, 255.0).astype(
            jnp.int32
        )

    return q(vx) | (q(vy) << 8) | (q(vz) << 16)


class _Geom:
    """Static geometry shared by trace-time code and the kernel."""

    def __init__(self, shape, sigmas, zdist, bz, by):
        self.Z, self.Y, self.X = shape
        self.bz, self.by = bz, by
        self.sigmas = tuple(float(s) for s in sigmas)
        self.zdist = float(zdist)
        self.hxy = [int(math.ceil(3.0 * s)) for s in self.sigmas]
        self.hz = [int(math.ceil(3.0 * s / self.zdist)) for s in self.sigmas]
        self.kxy = [tuple(float(t) for t in gaussian_kernel(s)) for s in self.sigmas]
        self.kz = [
            tuple(float(t) for t in gaussian_kernel(s / self.zdist))
            for s in self.sigmas
        ]
        self.HXY = max(self.hxy)
        self.HZ = max(self.hz)
        self.Zp = _ru(self.Z, bz)
        self.Yp = _ru(self.Y, by)
        self.nz = self.Zp // bz
        self.ny = self.Yp // by
        self.PZ0 = self.HZ + 2
        self.PY0 = _ru(self.HXY + 2, 8)
        self.PX0 = self.HXY + 2
        self.Xc = self.X + 4
        self.Xe = _ru(self.X + self.PX0 + self.HXY + 2, 128)
        self.EY = _ru(self.PY0 + by + self.HXY + 2, 8)
        self.YT = (self.ny - 1) * by + self.EY
        self.Rmax = bz + 2 * self.HZ + 4
        self.ZT = (self.nz - 1) * bz + self.Rmax
        # Ring capacity per sigma: every padded plane is DMA'd and
        # xy-smoothed exactly ONCE, at the max-sigma processing front
        # [z0 + 2*HZ + 4, z0 + 2*HZ + 4 + bz). A sigma with hz < HZ
        # needs those front planes only at a LATER z-tile, so its ring
        # must span from the current tile's window start
        # (z0 + HZ - hz) through the front end — bz + HZ + hz + 4
        # planes — or the front stores would clobber planes the current
        # tile still reads (the old bz + 2*hz + 4 sizing forced a store
        # gate that instead dropped the front planes for hz < HZ,
        # leaving ring slots one lap stale for every tile after the
        # first; sigmas with hz == HZ are unaffected).
        self.R = [bz + self.HZ + h + 4 for h in self.hz]

    def y_band_matrices(self) -> np.ndarray:
        """Banded y-Gaussian operators, 3-way bf16-split for the MXU.

        Row j of B_sigma holds kxy_sigma at columns r0+j .. r0+j+2h, so
        ys = B @ raw runs the y pass as one matmul; splitting the f32
        weights into three bf16 parts (hi + lo + lo2) keeps the
        accumulated weight error ~2^-26, below f32 noise (the raw data
        side is uint8 integers -- exact in bf16)."""
        ns = len(self.sigmas)
        RY = self.by + 4
        out = np.zeros((ns * 3, RY, self.EY), np.float32)
        for si in range(ns):
            b = np.zeros((RY, self.EY), np.float64)
            r0 = self.PY0 - 2 - self.hxy[si]
            for j in range(RY):
                for t, w in enumerate(self.kxy[si]):
                    b[j, r0 + j + t] += w
            import ml_dtypes

            bf = ml_dtypes.bfloat16
            hi = b.astype(np.float32).astype(bf).astype(np.float64)
            lo = (b - hi).astype(np.float32).astype(bf).astype(np.float64)
            lo2 = (b - hi - lo).astype(np.float32)
            out[3 * si + 0] = hi.astype(np.float32)
            out[3 * si + 1] = lo.astype(np.float32)
            out[3 * si + 2] = lo2
        return out

    def vmem_bytes(self) -> int:
        ring = sum(r * (self.by + 4) * self.Xe for r in self.R) * 4
        fring = len(self.sigmas) * 5 * (self.by + 4) * self.Xc * 4
        pbuf = 2 * self.EY * self.Xe
        outs = 2 * 2 * self.bz * self.by * _ru(self.X, 128) * 4
        transient = 18 * (self.by + 4) * self.Xc * 4
        return ring + fring + pbuf + outs + transient


def _kernel(geom: _Geom, alpha, beta, c, blackwhite):
    g = geom
    bz, by = g.bz, g.by
    ns = len(g.sigmas)
    RY = by + 4

    def kern(raw_ref, yband_ref, oj_ref, ovp_ref, ost_ref, *scr):
        rings = scr[:ns]
        frings = scr[ns : 2 * ns]
        pbuf = scr[2 * ns]
        sem = scr[2 * ns + 1]
        jy = pl.program_id(0)
        jz = pl.program_id(1)
        y0 = jy * by
        z0 = jz * bz  # global tile origin; padded plane q = global + PZ0

        # ----- plane DMA + xy smoothing into the sigma rings -----
        def dma(k, base):
            return pltpu.make_async_copy(
                raw_ref.at[pl.ds(base + k, 1), pl.ds(y0, g.EY), :],
                pbuf.at[pl.ds(jnp.remainder(k, 2), 1)],
                sem.at[jnp.remainder(k, 2)],
            )

        def smooth_store(q, slot):
            """xy-smooth padded plane q (dynamic) into each sigma ring.

            The y pass runs as ONE banded matmul on the MXU for ALL
            (sigma, bf16-part) pairs — the 3*ns*RY band rows stack along
            M (9 separate (RY, EY) dots measured dominated by per-dot
            fixed cost at 28% M-utilization; the stacked dot is bitwise
            identical since K and the part-sum order are unchanged). The
            x pass follows on the VPU over the already-narrow RY rows."""
            rawb = (
                pbuf[slot].astype(jnp.int32).astype(jnp.float32)
                .astype(jnp.bfloat16)
            )  # (EY, Xe), integers: exact in bf16
            t_all = jax.lax.dot_general(
                yband_ref[...].reshape(3 * ns * RY, g.EY).astype(jnp.bfloat16),
                rawb,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (3*ns*RY, Xe)
            row_i = jax.lax.broadcasted_iota(jnp.int32, (RY, g.Xc), 0)
            lane_i = jax.lax.broadcasted_iota(jnp.int32, (RY, g.Xc), 1)
            # store into EVERY sigma's ring unconditionally: each plane
            # passes through here exactly once, and the per-sigma ring
            # sizing (see _Geom.R) guarantees the store never clobbers a
            # plane the current tile still reads
            for si in range(ns):
                hs = g.hxy[si]

                def _store(si=si, hs=hs):
                    taps = g.kxy[si]
                    r0 = 3 * si * RY
                    t_ = (
                        t_all[r0 : r0 + RY]
                        + t_all[r0 + RY : r0 + 2 * RY]
                        + t_all[r0 + 2 * RY : r0 + 3 * RY]
                    )  # (RY, Xe) f32
                    x0 = g.PX0 - 2 - hs
                    ys = jnp.float32(taps[0]) * t_[:, x0 : x0 + g.Xc]
                    for t in range(1, len(taps)):
                        ys = ys + jnp.float32(taps[t]) * t_[
                            :, x0 + t : x0 + t + g.Xc
                        ]
                    # border clamp semantics for the downstream diffs:
                    # x: lanes 0,1 <-> global -2,-1 := global 0 (lane 2);
                    #    lanes X+2,X+3 <-> >= X := global X-1 (lane X+1)
                    ys = jnp.where(lane_i <= 1, ys[:, 2:3], ys)
                    ys = jnp.where(lane_i >= g.X + 2, ys[:, g.X + 1 : g.X + 2], ys)
                    # y: same, at the true volume edges only
                    ys = jnp.where((row_i <= 1) & (jy == 0), ys[2:3, :], ys)
                    rl = g.Y + 1 - (g.ny - 1) * by  # row of global Y-1, last tile
                    if rl + 1 < RY:
                        ys = jnp.where(
                            (row_i > rl) & (jy == g.ny - 1), ys[rl : rl + 1, :], ys
                        )
                    rings[si][jnp.remainder(q, g.R[si])] = ys

                _store()

        def proc_loop(n, base):
            def body(k, carry):
                @pl.when(k + 1 < n)
                def _pre():
                    dma(k + 1, base).start()

                dma(k, base).wait()
                smooth_store(base + k, jnp.remainder(k, 2))
                return carry

            dma(0, base).start()
            jax.lax.fori_loop(0, n, body, 0)

        @pl.when(jz == 0)
        def _prime():
            proc_loop(g.Rmax, z0)

        @pl.when(jz > 0)
        def _steady():
            proc_loop(bz, z0 + g.Rmax - bz)

        # ----- F window: z-Gaussian of each ring, 5-deep mod rings -----
        def f_plane(si, zg_nominal):
            """F_sigma at clamp(zg_nominal): (RY, Xc)."""
            zc = jnp.clip(zg_nominal, 0, g.Z - 1)
            taps = g.kz[si]
            base = zc + g.PZ0 - g.hz[si]
            acc = jnp.float32(taps[0]) * rings[si][jnp.remainder(base, g.R[si])]
            for t in range(1, len(taps)):
                acc = acc + jnp.float32(taps[t]) * rings[si][
                    jnp.remainder(base + t, g.R[si])
                ]
            return acc

        def f_store(si, znom):
            frings[si][jnp.remainder(znom, 5)] = f_plane(si, znom)

        def f_get(si, znom):
            return frings[si][jnp.remainder(znom, 5)]

        for si in range(ns):
            for r in range(4):  # prime F(z0-2 .. z0+1)
                f_store(si, z0 - 2 + r)

        row_c = jax.lax.broadcasted_iota(jnp.int32, (by, g.X), 0)
        lane_c = jax.lax.broadcasted_iota(jnp.int32, (by, g.X), 1)
        row_d = jax.lax.broadcasted_iota(jnp.int32, (by + 2, g.Xc), 0)

        bw = bool(blackwhite)
        a2 = 2.0 * float(alpha) * float(alpha)
        b2 = 2.0 * float(beta) * float(beta)
        c2 = 2.0 * float(c) * float(c)

        def ydiff(f, r0, rows, double_borders):
            """(f[r+1]-f[r-1])/2 over `rows` rows starting at index r0 of
            a (RY- or smaller)-row array; rows r0+i map to global
            y0 - 2 + (r0 + i) when f spans RY rows."""
            d = (f[r0 + 1 : r0 + 1 + rows] - f[r0 - 1 : r0 - 1 + rows]) * 0.5
            if double_borders:
                gy = jax.lax.broadcasted_iota(jnp.int32, d.shape, 0) + (
                    y0 - 2 + r0
                )
                d = jnp.where((gy == 0) | (gy == g.Y - 1), 2.0 * d, d)
            return d

        def xdiff(f, l0, lanes, double_borders):
            d = (f[:, l0 + 1 : l0 + 1 + lanes] - f[:, l0 - 1 : l0 - 1 + lanes]) * 0.5
            if double_borders:
                gx = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1) + (l0 - 2)
                d = jnp.where((gx == 0) | (gx == g.X - 1), 2.0 * d, d)
            return d

        def one_plane(p, carry):
            min0, maxf = carry
            zg = z0 + p
            for si in range(ns):
                f_store(si, zg + 2)

            vbest = None
            packbest = None
            v0_plane = None
            for si in range(ns):
                if _ABLATE == "smooth":  # profiling: smoothing cost only
                    v = f_get(si, zg)[2 : 2 + by, 2 : 2 + g.X]
                    pack = v.astype(jnp.int32)
                    if si == 0:
                        vbest, packbest, v0_plane = v, pack, v
                    else:
                        vbest = jnp.maximum(vbest, v)
                    continue
                s2 = jnp.float32(g.sigmas[si] * g.sigmas[si])

                def dz_at(znom):
                    """d/dz of F_si at clamp(znom), center rows/lanes +1 halo."""
                    zc = jnp.clip(znom, 0, g.Z - 1)
                    fp = f_get(si, zc + 1)
                    fm = f_get(si, zc - 1)
                    d = (fp - fm) * 0.5
                    d = jnp.where((zc == 0) | (zc == g.Z - 1), 2.0 * d, d)
                    return d  # (RY, Xc)

                dz_m = dz_at(zg - 1)
                dz_0 = dz_at(zg)
                dz_p = dz_at(zg + 1)
                dzz = (dz_p[2 : 2 + by, 2 : 2 + g.X] - dz_m[2 : 2 + by, 2 : 2 + g.X]) * 0.5
                dzz = jnp.where((zg == 0) | (zg == g.Z - 1), 2.0 * dzz, dzz) * s2

                f0 = f_get(si, zg)
                fzm = f_get(si, jnp.clip(zg - 1, 0, g.Z - 1))
                fzp = f_get(si, jnp.clip(zg + 1, 0, g.Z - 1))

                # dy chain: dy extent (by+2, Xc), rows <-> global y0-1 ..
                dy0 = ydiff(f0, 1, by + 2, True)
                # clamp dy rows at true y borders before the second diff
                dy0 = jnp.where((row_d == 0) & (jy == 0), dy0[1:2, :], dy0)
                rl2 = g.Y + 1 - (g.ny - 1) * by  # row of global Y in dy coords
                if rl2 < by + 2:
                    dy0 = jnp.where(
                        (row_d >= rl2) & (jy == g.ny - 1),
                        dy0[rl2 - 1 : rl2, :],
                        dy0,
                    )
                dyy = (dy0[2:, 2 : 2 + g.X] - dy0[:-2, 2 : 2 + g.X]) * 0.5
                gy_c = row_c + y0
                dyy = jnp.where((gy_c == 0) | (gy_c == g.Y - 1), 2.0 * dyy, dyy) * s2

                dy_zm = ydiff(fzm, 2, by, True)[:, 2 : 2 + g.X]
                dy_zp = ydiff(fzp, 2, by, True)[:, 2 : 2 + g.X]
                dyz = (dy_zp - dy_zm) * 0.5
                dyz = jnp.where((zg == 0) | (zg == g.Z - 1), 2.0 * dyz, dyz) * s2

                # dx chain: dx extent (by+2, X+2), lanes <-> global -1 ..
                dx0 = xdiff(f0[1 : by + 3], 1, g.X + 2, True)
                dx0 = jnp.concatenate(
                    [dx0[:, 1:2], dx0[:, 1:-1], dx0[:, -2:-1]], axis=1
                )  # clamp lanes at global -1 / X
                dxx = (dx0[1 : 1 + by, 2:] - dx0[1 : 1 + by, :-2]) * 0.5
                gx_c = lane_c
                dxx = jnp.where((gx_c == 0) | (gx_c == g.X - 1), 2.0 * dxx, dxx) * s2
                dxy = (dx0[2:, 1 : 1 + g.X] - dx0[:-2, 1 : 1 + g.X]) * 0.5
                dxy = jnp.where((gy_c == 0) | (gy_c == g.Y - 1), 2.0 * dxy, dxy) * s2
                dx_zm = xdiff(fzm[2 : by + 2], 2, g.X, True)
                dx_zp = xdiff(fzp[2 : by + 2], 2, g.X, True)
                dxz = (dx_zp - dx_zm) * 0.5
                dxz = jnp.where((zg == 0) | (zg == g.Z - 1), 2.0 * dxz, dxz) * s2

                if _ABLATE == "noeig":  # profiling: derivatives cost only
                    v = dxx + dyy + dzz + dxy + dxz + dyz
                    pack = v.astype(jnp.int32)
                    if si == 0:
                        vbest, packbest, v0_plane = v, pack, v
                    else:
                        vbest = jnp.maximum(vbest, v)
                    continue
                lam1, lam2, lam3, vx, vy, vz = _eig3_vessel_plane(
                    dxx, dyy, dzz, dxy, dxz, dyz
                )
                aa1 = jnp.abs(lam1)
                aa2 = jnp.abs(lam2)
                aa3 = jnp.abs(lam3)
                ra = aa2 / aa3
                rb = aa1 / jnp.sqrt(aa2 * aa3)
                s_ = jnp.sqrt(aa1 * aa1 + aa2 * aa2 + aa3 * aa3)
                v = (
                    (1.0 - jnp.exp(-(ra * ra) / a2))
                    * jnp.exp(-(rb * rb) / b2)
                    * (1.0 - jnp.exp(-(s_ * s_) / c2))
                )
                if bw:
                    v = jnp.where((lam2 < 0) | (lam3 < 0), 0.0, v)
                else:
                    v = jnp.where((lam2 > 0) | (lam3 > 0), 0.0, v)
                v = jnp.where(v != v, 0.0, v)  # NaN -> 0
                pack = _qpack(vx, vy, vz)
                if si == 0:
                    vbest, packbest, v0_plane = v, pack, v
                else:
                    upd = v > vbest
                    vbest = jnp.where(upd, v, vbest)
                    packbest = jnp.where(upd, pack, packbest)

            oj_ref[pl.ds(p, 1)] = vbest[None]
            ovp_ref[pl.ds(p, 1)] = packbest[None]

            valid = (row_c + y0 < g.Y) & (zg < g.Z)
            pmin = jnp.min(jnp.where(valid, v0_plane, jnp.inf))
            pmax = jnp.max(jnp.where(valid, vbest, -jnp.inf))
            return (jnp.minimum(min0, pmin), jnp.maximum(maxf, pmax))

        min0 = jnp.float32(jnp.inf)
        maxf = jnp.float32(-jnp.inf)
        min0, maxf = jax.lax.fori_loop(0, bz, one_plane, (min0, maxf))
        row = jnp.concatenate(
            [min0.reshape(1, 1), maxf.reshape(1, 1),
             jnp.zeros((1, 6), jnp.float32)],
            axis=1,
        )
        ost_ref[0, 0] = row

    return kern


@functools.partial(
    jax.jit,
    static_argnames=(
        "sigmas", "zdist", "alpha", "beta", "c", "blackwhite", "bz", "by",
        "interpret",
    ),
)
def _frangi3d_fused_impl(
    vol, sigmas, zdist, alpha, beta, c, blackwhite, bz, by, interpret
):
    g = _Geom(vol.shape, sigmas, zdist, bz, by)
    vp = jnp.pad(
        vol.astype(jnp.uint8),
        (
            (g.PZ0, g.ZT - g.Z - g.PZ0),
            (g.PY0, g.YT - g.Y - g.PY0),
            (g.PX0, g.Xe - g.X - g.PX0),
        ),
        mode="edge",
    )
    kern = _kernel(g, alpha, beta, c, blackwhite)
    yband = jnp.asarray(g.y_band_matrices())
    scratch = (
        [pltpu.VMEM((r, by + 4, g.Xc), jnp.float32) for r in g.R]
        + [pltpu.VMEM((5, by + 4, g.Xc), jnp.float32) for _ in g.sigmas]
        + [pltpu.VMEM((2, g.EY, g.Xe), jnp.uint8), pltpu.SemaphoreType.DMA((2,))]
    )
    j, vp_packed, stats = pl.pallas_call(
        kern,
        grid=(g.ny, g.nz),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                yband.shape, lambda jy, jz: (0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec((bz, by, g.X), lambda jy, jz: (jz, jy, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bz, by, g.X), lambda jy, jz: (jz, jy, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, 8), lambda jy, jz: (jz, jy, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((g.Zp, g.Yp, g.X), jnp.float32),
            jax.ShapeDtypeStruct((g.Zp, g.Yp, g.X), jnp.int32),
            jax.ShapeDtypeStruct((g.nz, g.ny, 1, 8), jnp.float32),
        ],
        scratch_shapes=scratch,
        interpret=interpret,
    )(vp, yband)
    j = j[: g.Z, : g.Y]
    vp_packed = vp_packed[: g.Z, : g.Y]
    jmin = jnp.min(stats[..., 0])
    jmax = jnp.max(stats[..., 1])
    vx = (vp_packed & 0xFF).astype(jnp.uint8)
    vy = ((vp_packed >> 8) & 0xFF).astype(jnp.uint8)
    vz = ((vp_packed >> 16) & 0xFF).astype(jnp.uint8)
    return j, jmin, jmax, vx, vy, vz


def fits_fused(shape, sigmas, zdist, bz: int = 4, by: int = 48) -> bool:
    """Can the fused kernel run this config within the VMEM budget?"""
    z, y, x = shape
    if z < bz or z < 5 or y < 8 or x < 8:
        return False
    g = _Geom(shape, sigmas, zdist, bz, by)
    return g.vmem_bytes() <= _VMEM_BUDGET


#: geometry ladder, fastest first (throughput is flat in geometry on
#: this runtime — see PARITY.md round-3 ablation — so smaller tiles
#: cost little; wide X / large sigma configs land lower on the ladder)
_GEOM_LADDER = ((4, 48), (4, 32), (8, 32), (4, 24), (8, 24), (4, 16), (8, 16))


def best_fused_geom(shape, sigmas, zdist):
    """First ladder geometry that fits VMEM, or None (use the XLA path)."""
    for bz, by in _GEOM_LADDER:
        if fits_fused(shape, sigmas, zdist, bz, by):
            return bz, by
    return None


def frangi3d_fused(
    vol: jax.Array,
    sigmas: Sequence[float],
    zdist: float,
    alpha: float = 0.5,
    beta: float = 0.5,
    c: float = 500.0,
    blackwhite: bool = False,
    bz: int = 4,
    by: int = 48,
    interpret: bool = False,
):
    """Drop-in fused `frangi3d` (same contract). When the requested
    (bz, by) tile does not fit VMEM, walks the geometry ladder for one
    that does; falls back to the XLA composition when Mosaic is
    unavailable or no geometry fits."""
    from pnr_tpu.ops.frangi import frangi3d
    from pnr_tpu.ops.pallas_conv import mosaic_available

    sigmas = tuple(float(s) for s in sigmas)
    if vol.ndim == 3 and not fits_fused(vol.shape, sigmas, zdist, bz, by):
        geom = best_fused_geom(vol.shape, sigmas, zdist)
        if geom is not None:
            bz, by = geom
    if (
        vol.ndim != 3
        or not (interpret or mosaic_available())
        or not fits_fused(vol.shape, sigmas, zdist, bz, by)
    ):
        return frangi3d(vol, sigmas, float(zdist), alpha, beta, c, blackwhite)
    return _frangi3d_fused_impl(
        vol, sigmas, float(zdist), float(alpha), float(beta), float(c),
        bool(blackwhite), int(bz), int(by), bool(interpret),
    )


def fused_frangi_enabled() -> bool:
    """Flag gate for the live pipeline (off by default)."""
    return os.environ.get("PNR_TPU_FUSED_FRANGI", "0") not in ("0", "", "false")
