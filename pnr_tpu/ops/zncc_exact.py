"""Fast EXACT template ZNCC: per-trace-patch Pallas engine.

Parity target: `Tracker::znccBBB` (pnr-vaa3d/tracker.cpp:1891-1964) —
the same cylindrical-Gaussian template sums as ops/zncc.py, evaluated
at full sample count (no tube approximation), restructured for the MXU.

Why the tube engine's hat-matmul cannot be ported directly (the
approach sketched as "tile the samples through the same contraction"):
the tube engine materializes a combined (M, pz*py) hat-weight matrix
per trace in HBM. Tube M = np*nv ~ 1.4e2 per trace; exact M = np*K
~ 7e4 (K ~ 3.4e3 template samples per query at the default sigmas), so
the weight matrix alone would be ~0.8 GB per trace-iteration — dead on
HBM bandwidth before FLOPs enter. A workable exact engine must
(a) never let weights touch HBM and (b) shrink the per-sample
contraction from the whole patch to a local window. Both force a fused
Pallas kernel.

Design (one Pallas program per (trace, particle); the trace's patch
block stays VMEM-resident across its particles):
* The template's u axis is always xy-planar (uz == 0,
  tracker.cpp:1899-1906), so a sample's z coordinate depends only on
  its (v, w) offsets. Sorting each sigma's lattice by (w, v, u) bounds
  the z-spread of any 512-sample block by sqrt(dv^2 + dw^2), letting
  each block contract against a thin z-window of the patch (window
  start = scalar arithmetic on static block centroids) instead of the
  full pz.
* Per (sigma, block): separable z/y hat factors build on the VPU
  ((zw,1,K) x (1,py,K) broadcast — tiny), reshape to the (zw*py, 512)
  weight block (layout-free since py % 8 == 0), and one MXU
  contraction (px, zw*py) @ (zw*py, 512) with bf16 hi/lo weight
  splitting. Window values are uint8 integers — exactly representable
  in bf16, so the image side needs no split. The x hat and the
  template reductions run on the VPU.
* Each particle reduces to three sums per sigma: A = sum(I - m0),
  B = sum((I - m0)^2), C = sum((I - m0)*g), with m0 the image value at
  the particle — a variance-preserving shift that sidesteps the
  one-pass B - A^2/K cancellation. corra = C - gavg*A and
  corrb = B - A^2/K are shift-invariant, so the znccBBB correlation
  (tracker.cpp:1936-1955) follows exactly; kernel output is
  (T, B, S, 4) scalars — HBM write traffic is nil.

Approximation boundary (same contract as the tube patch engine):
samples are clamped to the volume (reference interp semantics,
tracker.cpp:2142-2150) AND into the per-trace patch; the patch is
sized to template reach + 3*step + 1 around the per-iteration cloud
mean, so patch clamping only affects stray particles far outside the
cloud, whose weights are negligible. On volumes small enough for the
patch to cover them entirely the engine IS the global evaluation.
"""

from __future__ import annotations

import functools
import math
from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pnr_tpu.ops.interp import trilinear
from pnr_tpu.ops.zncc import ZnccTemplates, local_frame, _FLT_MIN

from pnr_tpu.utils.jax_setup import stabilize_pallas_cache_keys

stabilize_pallas_cache_keys()

KBLK = 512
#: ~16 MB VMEM/core on v5e; leave headroom for Pallas block
#: double-buffering of the patch stream
_VMEM_SOFT_CAP = 13 * 1024 * 1024

# qinfo scalar columns
_Q_RZ, _Q_NDZ, _Q_WZ = 0, 1, 2
_Q_RY, _Q_NDY, _Q_WY = 3, 4, 5
_Q_RX, _Q_NDX, _Q_WX = 6, 7, 8
_Q_UY, _Q_UX = 9, 10
_Q_M0, _Q_ZHI, _Q_YHI, _Q_XHI = 11, 12, 13, 14
_QCOLS = 16


def _roundup(v: int, m: int) -> int:
    return -(-v // m) * m


class ExactBank(NamedTuple):
    """Per-sigma template tables re-sorted for blockwise z-locality."""

    #: per sigma: (nblk, 5, KBLK) rows [v, u, w, g, mask]
    tables: Tuple[np.ndarray, ...]
    #: per sigma: (nblk, 2) block centroids [v_bar, w_bar] (static)
    centers: Tuple[np.ndarray, ...]
    #: per sigma: static z-window height for the block contraction
    zws: Tuple[int, ...]
    #: per sigma: static y-window height (8-aligned dynamic start)
    yws: Tuple[int, ...]
    cnt: np.ndarray
    avg: np.ndarray
    corrc: np.ndarray
    sigmas: Tuple[float, ...]
    #: patch reach (z, xy) in voxels (template extent upper bounds)
    reach_z: int
    reach_xy: int


def build_exact_bank(templates: ZnccTemplates) -> ExactBank:
    """Sort each sigma's lattice by (w, v, u) and cut KBLK blocks."""
    tables = []
    centers = []
    zws = []
    yws = []
    rz_max = 1.0
    rxy_max = 1.0
    for i in range(len(templates.sigmas)):
        k = int(templates.cnt[i])
        offs = templates.offs[i, :k]  # (K, 3) in (v, u, w)
        wgt = templates.wgt[i, :k]
        order = np.lexsort((offs[:, 1], offs[:, 0], offs[:, 2]))
        offs = offs[order]
        wgt = wgt[order]
        v2 = float(np.abs(offs[:, 0]).max())
        u2 = float(np.abs(offs[:, [1, 2]]).max())
        rz_max = max(rz_max, math.sqrt(v2 * v2 + u2 * u2))
        rxy_max = max(rxy_max, v2 + math.sqrt(2.0) * u2)

        nblk = max(1, -(-k // KBLK))
        tab = np.zeros((nblk, 5, KBLK), np.float32)
        ctr = np.zeros((nblk, 2), np.float32)
        span = 0.0
        yspan = 0.0
        for b in range(nblk):
            blk = slice(b * KBLK, min((b + 1) * KBLK, k))
            o = offs[blk]
            n = o.shape[0]
            tab[b, 0, :n] = o[:, 0]
            tab[b, 1, :n] = o[:, 1]
            tab[b, 2, :n] = o[:, 2]
            tab[b, 3, :n] = wgt[blk]
            tab[b, 4, :n] = 1.0
            ctr[b, 0] = 0.5 * float(o[:, 0].min() + o[:, 0].max())
            ctr[b, 1] = 0.5 * float(o[:, 2].min() + o[:, 2].max())
            dv = 0.5 * float(o[:, 0].max() - o[:, 0].min())
            dw = 0.5 * float(o[:, 2].max() - o[:, 2].min())
            # |rz - c0| <= |dz|*dv + |wz|*dw <= sqrt(dv^2 + dw^2)
            # (the template's u axis has uz == 0)
            span = max(span, math.sqrt(dv * dv + dw * dw))
            # the (d, u, w) frame is orthonormal, so its y components
            # form a unit vector: |ry - yc| <= sqrt(dv^2 + u2^2 + dw^2)
            # about the block centroid yc = ryp + ndy*vbar + wy*wbar
            # (u is symmetric in the full rows, so ubar = 0 and the u
            # extent folds into the span)
            yspan = max(yspan, math.sqrt(dv * dv + u2 * u2 + dw * dw))
        # hats reach floor(c0 - span) .. floor(c0 + span) + 1
        zws.append(int(math.ceil(2.0 * span + 4.0)))
        yws.append(_roundup(int(math.ceil(2.0 * yspan)) + 4, 8))
        tables.append(tab)
        centers.append(ctr)
    return ExactBank(
        tables=tuple(tables),
        centers=tuple(centers),
        zws=tuple(zws),
        yws=tuple(yws),
        cnt=templates.cnt.copy(),
        avg=templates.avg.copy(),
        corrc=templates.corrc.copy(),
        sigmas=templates.sigmas,
        reach_z=int(math.ceil(rz_max)) + 1,
        reach_xy=int(math.ceil(rxy_max)) + 1,
    )


def fits_exact(pz: int, py: int, px: int, bank: ExactBank) -> bool:
    q = max(
        min(z, pz) * min(yw, py) for z, yw in zip(bank.zws, bank.yws)
    )
    lanes_k = _roundup(KBLK, 128)
    lanes_x = _roundup(px, 128)
    vmem = 4 * (
        pz * py * lanes_x  # patch
        + 2 * q * lanes_k  # wf f32 + bf16 hi/lo
        + 2 * q * lanes_x  # window + transpose
        + 3 * lanes_x * lanes_k  # a, wx, product
        + sum(t.shape[0] * 8 * lanes_k for t in bank.tables)  # tables
    )
    return py % 8 == 0 and vmem <= _VMEM_SOFT_CAP


# ---------------------------------------------------------------------------
# Pallas kernel


def _exact_kernel(
    qs_ref,  # scalar prefetch, flat (T*B*6,): only the window-start
    # scalars live in SMEM (1 MB budget; SMEM also pads a trailing
    # structure axis to 128 lanes, hence the flat layout)
    qv_ref,  # (1, 1, 8, 16) per-program VMEM block (the 8-row sublane
    # replication satisfies Mosaic's (8, ==last) block tiling rule)
    pat_ref,  # (1, pz, py, px) f32
    *tabs_and_out,
    nb: int,
    py: int,
    px: int,
    zws: Tuple[int, ...],
    yws: Tuple[int, ...],
    centers,
    single_pass: bool,
):
    ns = len(zws)
    tab_refs = tabs_and_out[:ns]
    out_ref = tabs_and_out[ns]
    pz = pat_ref.shape[1]
    ti = pl.program_id(0)
    pi = pl.program_id(1)
    base = (ti * nb + pi) * 6

    # scalar lane (window starts): rzp/ndz/wz and ryp/ndy/wy
    rzp_s, ndz_s, wzv_s = qs_ref[base + 0], qs_ref[base + 1], qs_ref[base + 2]
    ryp_s, ndy_s, wyv_s = qs_ref[base + 3], qs_ref[base + 4], qs_ref[base + 5]
    # vector lane: (1,)-shaped slices of the per-particle VMEM row
    q = qv_ref[0, 0, 0]
    rzp, ndz, wzv = q[_Q_RZ : _Q_RZ + 1], q[_Q_NDZ : _Q_NDZ + 1], q[_Q_WZ : _Q_WZ + 1]
    ryp, ndy, wyv = q[_Q_RY : _Q_RY + 1], q[_Q_NDY : _Q_NDY + 1], q[_Q_WY : _Q_WY + 1]
    rxp, ndx, wxv = q[_Q_RX : _Q_RX + 1], q[_Q_NDX : _Q_NDX + 1], q[_Q_WX : _Q_WX + 1]
    uy, ux = q[_Q_UY : _Q_UY + 1], q[_Q_UX : _Q_UX + 1]
    m0 = q[_Q_M0 : _Q_M0 + 1]
    zhi, yhi, xhi = q[_Q_ZHI : _Q_ZHI + 1], q[_Q_YHI : _Q_YHI + 1], q[_Q_XHI : _Q_XHI + 1]

    rows = []
    for s in range(ns):
        zw = min(zws[s], pz)
        yw = yws[s] if yws[s] < py else py
        tab = tab_refs[s]
        zi = jax.lax.broadcasted_iota(jnp.int32, (zw, 1, KBLK), 0).astype(jnp.float32)
        yi = jax.lax.broadcasted_iota(jnp.int32, (1, yw, KBLK), 1).astype(jnp.float32)
        xi = jax.lax.broadcasted_iota(jnp.int32, (px, KBLK), 0).astype(jnp.float32)
        sa = jnp.zeros((1, 1), jnp.float32)
        sb = jnp.zeros((1, 1), jnp.float32)
        sc_ = jnp.zeros((1, 1), jnp.float32)

        for b in range(tab.shape[0]):
            tv = tab[b, 0:1, :]  # (1, KBLK)
            tu = tab[b, 1:2, :]
            tw = tab[b, 2:3, :]
            tg = tab[b, 3:4, :]
            tm = tab[b, 4:5, :]
            # world-relative sample coords (tracker.cpp:1931-1934),
            # volume-clamped with the reference interp semantics
            rz = jnp.clip(rzp + tv * ndz + tw * wzv, 0.0, zhi)
            ry = jnp.clip(ryp + tv * ndy + tu * uy + tw * wyv, 0.0, yhi)
            rx = jnp.clip(rxp + tv * ndx + tu * ux + tw * wxv, 0.0, xhi)

            vbar, wbar = centers[s][b]
            # A constant pl.ds start (window covers the whole patch on
            # small volumes) trips a pytree-flattening bug in the Mosaic
            # load lowering ("Too many leaves for PyTreeDef") — use a
            # STATIC full slice there and keep pl.ds for real windows.
            if zw >= pz:
                z0 = jnp.int32(0)
                idx_z = slice(None)
            else:
                c0 = rzp_s + ndz_s * vbar + wzv_s * wbar
                z0f = c0 - (zw - 1) * 0.5
                z0 = jnp.clip(jnp.floor(z0f).astype(jnp.int32), 0, pz - zw)
                idx_z = pl.ds(z0, zw)
            if yw >= py:
                y0 = jnp.int32(0)
                idx_y = slice(None)
            else:
                yc = ryp_s + ndy_s * vbar + wyv_s * wbar
                y0f = yc - (yw - 1) * 0.5
                y0 = jnp.clip(jnp.floor(y0f).astype(jnp.int32), 0, py - yw)
                idx_y = pl.ds(y0, yw)

            win = pat_ref[0, idx_z, idx_y].reshape(zw * yw, px)
            # f32 transpose + cast: measured faster than bf16-first
            # transpose (packed-sublane shuffles) AND than a dim-0
            # dot_general contraction (Mosaic re-transposes internally)
            win_t = win.T.astype(jnp.bfloat16)  # (px, zw*yw)

            rzw = jnp.clip(rz - z0.astype(jnp.float32), 0.0, zw - 1.001)
            ryw = jnp.clip(ry - y0.astype(jnp.float32), 0.0, yw - 1.001)
            wzh = jnp.maximum(0.0, 1.0 - jnp.abs(rzw[None, :, :] - zi))
            wyh = jnp.maximum(0.0, 1.0 - jnp.abs(ryw[None, :, :] - yi))
            wf = (wzh * wyh).reshape(zw * yw, KBLK)
            w_hi = wf.astype(jnp.bfloat16)

            def bdot(a_, b_):
                return jax.lax.dot_general(
                    a_, b_, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            a = bdot(win_t, w_hi)  # (px, KBLK) f32
            if not single_pass:
                w_lo = (wf - w_hi.astype(jnp.float32)).astype(jnp.bfloat16)
                a = a + bdot(win_t, w_lo)

            wx = jnp.maximum(0.0, 1.0 - jnp.abs(rx - xi))
            val = (jnp.sum(a * wx, axis=0, keepdims=True) - m0) * tm  # (1, KBLK)
            sa = sa + jnp.sum(val, axis=1, keepdims=True)
            sb = sb + jnp.sum(val * val, axis=1, keepdims=True)
            sc_ = sc_ + jnp.sum(val * tg, axis=1, keepdims=True)

        rows.append(
            jnp.concatenate([sa, sb, sc_, jnp.zeros((1, 1), jnp.float32)], axis=1)
        )
    out_ref[0, 0] = jnp.concatenate(rows, axis=0)  # (ns, 4) vector store


@functools.partial(
    jax.jit, static_argnames=("bank_static", "single_pass", "interpret")
)
def _exact_sums_pallas(
    patches, qs, tabs, bank_static, single_pass=False, interpret=False
):
    """patches (T, pz, py, px) f32, qs (T, B, 16) f32,
    tabs: per-sigma (nblk, 5, KBLK) -> (T, B, S, 4) sums."""
    t, pz, py, px = patches.shape
    b = qs.shape[1]
    qs_smem = qs[..., :6]
    qv8 = jnp.broadcast_to(qs[:, :, None, :], (t, b, 8, _QCOLS))
    zws, yws, centers = bank_static
    ns = len(zws)
    kern = functools.partial(
        _exact_kernel,
        nb=b,
        py=py,
        px=px,
        zws=zws,
        yws=yws,
        centers=centers,
        single_pass=single_pass,
    )
    nsig = len(tabs)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t, b),
        in_specs=[
            pl.BlockSpec(
                (1, 1, 8, _QCOLS), lambda i, j, c: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            # particle index varies fastest, so the patch block is
            # fetched once per trace and stays resident for its B
            # particles
            pl.BlockSpec(
                (1, pz, py, px), lambda i, j, c: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        + [
            pl.BlockSpec(
                tabs[si].shape,
                (lambda i, j, c: (0, 0, 0)),
                memory_space=pltpu.VMEM,
            )
            for si in range(nsig)
        ],
        out_specs=pl.BlockSpec(
            (1, 1, ns, 4), lambda i, j, c: (i, j, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t, b, ns, 4), jnp.float32),
        interpret=interpret,
    )(qs_smem.reshape(-1), qv8, patches, *tabs)


# ---------------------------------------------------------------------------
# XLA fallback (identical math, gather-based — CPU tests / no Mosaic)


def _exact_sums_xla(patches, qs, tabs):
    """Same sums via trilinear gathers on the patches (lax.map over
    queries bounds the gather working set)."""
    t, pz, py, px = patches.shape
    patches = patches.astype(jnp.float32)
    b = qs.shape[1]
    q = qs.reshape(t * b, _QCOLS)
    trace_idx = jnp.repeat(jnp.arange(t), b)
    outs = []
    for tab in tabs:
        tv = tab[:, 0, :].reshape(-1)  # (Kpad,)
        tu = tab[:, 1, :].reshape(-1)
        tw = tab[:, 2, :].reshape(-1)
        tg = tab[:, 3, :].reshape(-1)
        tm = tab[:, 4, :].reshape(-1)

        def one(args, tv=tv, tu=tu, tw=tw, tg=tg, tm=tm):
            ti_, qr = args
            rz = jnp.clip(qr[_Q_RZ] + tv * qr[_Q_NDZ] + tw * qr[_Q_WZ], 0.0, qr[_Q_ZHI])
            ry = jnp.clip(
                qr[_Q_RY] + tv * qr[_Q_NDY] + tu * qr[_Q_UY] + tw * qr[_Q_WY],
                0.0, qr[_Q_YHI],
            )
            rx = jnp.clip(
                qr[_Q_RX] + tv * qr[_Q_NDX] + tu * qr[_Q_UX] + tw * qr[_Q_WX],
                0.0, qr[_Q_XHI],
            )
            vals = (trilinear(patches[ti_], rx, ry, rz) - qr[_Q_M0]) * tm
            return jnp.stack(
                [
                    jnp.sum(vals),
                    jnp.sum(vals * vals),
                    jnp.sum(vals * tg),
                    jnp.float32(0.0),
                ]
            )

        outs.append(jax.lax.map(one, (trace_idx, q)).reshape(t, b, 4))
    return jnp.stack(outs, axis=2)  # (T, B, S, 4)


# ---------------------------------------------------------------------------
# Engine


class ExactPatchEngine(NamedTuple):
    """Per-trace-patch exact ZNCC evaluators (PatchEngine-compatible).

    extract(field, center_xyz (T,3)) -> (patches, corner_zyx (T,3))
    corr(vol_shape, patches, corner, pos (T,B,3), dirs) -> (corr, sig)
    eval_fused(field, pos (T,B,3), dirs) -> (corr, sig)
    `field` is the raw uint8 volume with a leading channel axis
    (1, Z, Y, X) so the tracker's map-stack conventions apply.
    """

    extract: Callable
    corr: Callable
    eval_fused: Callable
    bank: ExactBank


def exact_corr_from_sums(bank_arrays, sums):
    """(T, B, S, 4) kernel sums [A, B, C, _] -> (corr (T,B), sig (T,B)).

    corra = C - gavg*A; corrb = B - A^2/K — both invariant to the m0
    shift (znccBBB formula, tracker.cpp:1936-1955). A later sigma wins
    only on strictly greater correlation, as in the reference."""
    cnt, avg, corrc, sig_vals = bank_arrays
    a = sums[..., 0]
    b = sums[..., 1]
    c = sums[..., 2]
    corra = c - avg * a
    corrb = jnp.maximum(b - (a * a) / cnt, 0.0)
    denom = corrb * corrc
    corrs = jnp.where(
        denom > _FLT_MIN, corra / jnp.sqrt(jnp.maximum(denom, _FLT_MIN)), 0.0
    )
    ns = corrs.shape[-1]
    best_corr = jnp.full(corrs.shape[:-1], -jnp.inf, jnp.float32)
    best_sig = jnp.ones(corrs.shape[:-1], jnp.float32)
    for si in range(ns):
        take = corrs[..., si] > best_corr
        best_corr = jnp.where(take, corrs[..., si], best_corr)
        best_sig = jnp.where(take, sig_vals[si], best_sig)
    return best_corr, best_sig


def make_exact_patch_engine(
    templates: ZnccTemplates,
    step: float,
    force_xla: bool = False,
    interpret: bool = False,
    hi_lo: bool = False,
) -> ExactPatchEngine:
    """Build the exact patch engine for a template set.

    hi_lo=True adds the bf16 lo-correction matmul pass for the hat
    weights (kernel agrees with the f32 gather to ~5e-6). The default
    single hi pass halves the MXU work; its measured correlation error
    vs f32 is max 2.4e-4 / p99 1.3e-4 on noisy tube volumes with random
    directions (zero sigma-argmax flips) — an order of magnitude inside
    the 2e-3 agreement between this engine and the compiled reference
    (tests/test_reference_parity.py), and immaterial against znccth
    thresholds of 0.3-0.5. Measured on v5e: single-pass lifts tracker
    throughput 234k -> 374k updates/s at sigmas (2,3).
    """
    bank = build_exact_bank(templates)
    is2d = templates.is2d
    tabs = tuple(jnp.asarray(t) for t in bank.tables)
    bank_static = (
        bank.zws,
        bank.yws,
        tuple(tuple((float(r[0]), float(r[1])) for r in c) for c in bank.centers),
    )
    bank_arrays = (
        jnp.asarray(bank.cnt),
        jnp.asarray(bank.avg),
        jnp.asarray(bank.corrc),
        jnp.asarray(np.asarray(bank.sigmas, np.float32)),
    )
    allow = int(math.ceil(3.0 * float(step))) + 1

    def _dims(field_shape):
        l, h, w = field_shape[-3:]
        half_xy = allow + bank.reach_xy
        half_z = allow + bank.reach_z
        # py must never exceed h (the extract dynamic_slice would be out
        # of range); on sub-8-aligned tiny volumes py == h breaks the
        # Pallas kernel's py % 8 == 0 contract and fits_exact() routes
        # to the XLA fallback instead — correct, and cheap at that size
        py = min(_roundup(2 * half_xy + 2, 8), h)
        px = min(2 * half_xy + 2, w)
        pz = 1 if l == 1 else min(2 * half_z + 2, l)
        return pz, py, px

    def _corners(field_shape, center):
        l, h, w = field_shape[-3:]
        pz, py, px = _dims(field_shape)
        cx = jnp.clip(jnp.round(center[:, 0]).astype(jnp.int32) - px // 2, 0, w - px)
        cy = jnp.clip(
            jnp.round(center[:, 1]).astype(jnp.int32) - py // 2, 0, max(h - py, 0)
        )
        cz = jnp.clip(jnp.round(center[:, 2]).astype(jnp.int32) - pz // 2, 0, l - pz)
        return jnp.stack([cz, cy, cx], axis=-1)

    def extract(field, center):
        if field.ndim == 3:
            field = field[None]
        pz, py, px = _dims(field.shape)
        corner = _corners(field.shape, center)

        def slice_one(czyx):
            s = jax.lax.dynamic_slice(
                field, (0, czyx[0], czyx[1], czyx[2]), (1, pz, py, px)
            )
            return s[0]

        # patches ride as f32: narrower dtypes would cut HBM/VMEM
        # traffic 2-4x, but Mosaic requires 8-aligned sublane dynamic
        # starts for sub-32-bit memrefs, which would force the y
        # windows ~+14 wider — a worse trade, the kernel is MAC-bound
        # (measured: u8/bf16 both reject unaligned y starts; the
        # unaligned-f32 tight windows are the fastest formulation)
        patches = jax.vmap(slice_one)(corner).astype(jnp.float32)
        return patches, corner

    def _qinfo(vol_shape, patches, corner, pos, dirs):
        """Pack per-(trace, particle) frame/position/bounds scalars."""
        l, h, w = vol_shape
        t, b = pos.shape[:2]
        pz, py, px = patches.shape[1:4]
        vx, vy, vz = dirs[..., 0], dirs[..., 1], dirs[..., 2]
        u, wv = local_frame(vx, vy, vz, is2d)  # (T, B, 3)
        cf = corner.astype(jnp.float32)  # (T, 3) zyx
        rzp = pos[..., 2] - cf[:, None, 0]
        ryp = pos[..., 1] - cf[:, None, 1]
        rxp = pos[..., 0] - cf[:, None, 2]
        zhi = jnp.minimum(l - 1.001 - cf[:, 0], pz - 1.001)[:, None]
        yhi = jnp.minimum(h - 1.001 - cf[:, 1], py - 1.001)[:, None]
        xhi = jnp.minimum(w - 1.001 - cf[:, 2], px - 1.001)[:, None]
        if l == 1:
            rzp = jnp.zeros_like(rzp)
            zhi = jnp.zeros_like(zhi) + 0.0

        # m0: patch value at the particle (variance-preserving shift)
        pzi = jnp.clip(jnp.round(rzp).astype(jnp.int32), 0, pz - 1)
        pyi = jnp.clip(jnp.round(ryp).astype(jnp.int32), 0, py - 1)
        pxi = jnp.clip(jnp.round(rxp).astype(jnp.int32), 0, px - 1)
        flat = patches.reshape(t, pz * py * px)
        m0 = jnp.take_along_axis(flat, (pzi * py + pyi) * px + pxi, axis=1).astype(
            jnp.float32
        )

        zhi_b = jnp.broadcast_to(zhi, (t, b))
        yhi_b = jnp.broadcast_to(yhi, (t, b))
        xhi_b = jnp.broadcast_to(xhi, (t, b))
        qs = jnp.stack(
            [
                rzp, -vz, wv[..., 2],
                ryp, -vy, wv[..., 1],
                rxp, -vx, wv[..., 0],
                u[..., 1], u[..., 0],
                m0, zhi_b, yhi_b, xhi_b, jnp.zeros_like(m0),
            ],
            axis=-1,
        )  # (T, B, 16)
        return qs

    from pnr_tpu.ops.pallas_conv import mosaic_available

    def corr(vol_shape, patches, corner, pos, dirs):
        qs = _qinfo(vol_shape, patches, corner, pos, dirs)
        pz, py, px = patches.shape[1:4]
        use_kernel = (
            not force_xla
            and (interpret or mosaic_available())
            and fits_exact(pz, py, px, bank)
        )
        if use_kernel:
            sums = _exact_sums_pallas(
                patches, qs, tabs, bank_static,
                single_pass=not hi_lo, interpret=interpret,
            )
        else:
            sums = _exact_sums_xla(patches, qs, tabs)
        return exact_corr_from_sums(bank_arrays, sums)

    def eval_fused(field, pos, dirs):
        center = jnp.mean(pos, axis=1)
        patches, corner = extract(field, center)
        return corr(tuple(field.shape[-3:]), patches, corner, pos, dirs)

    return ExactPatchEngine(
        extract=extract, corr=corr, eval_fused=eval_fused, bank=bank
    )
