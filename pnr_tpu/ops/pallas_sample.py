"""Pallas TPU kernel: batched separable hat-weight patch sampling.

The tube-ZNCC patch engine (ops/zncc_fast.py `make_tube_patch_engine`)
evaluates every trilinear template sample as a separable 2-tap hat
contraction against a per-trace patch. The XLA formulation must
materialize the combined (M, pz*py) weight matrix in HBM every
iteration (~420 MB of round-trip traffic at wave size 128) plus a
patch transpose. This kernel builds the weights directly in VMEM from
the relative coordinates (broadcasted_iota + |q - k| hats) and
contracts them against the resident patch block on the MXU — the only
HBM traffic left is reading each patch once and writing the (M, 3)
results.

Grid: one program per trace (iotas shared across the sigma groups;
per-sigma patches selected on a leading block dim — no lane-offset
relayouts). The patch arrives channel-packed X-MAJOR as
(q = pz*py, 3*px) with lane index 3*x + c — the layout
`build_tube_maps_packed` stores, so the extract slice IS the MXU
operand and no per-iteration transpose exists anywhere. The
contraction is ONE (M, q) @ (q, 3*px) MXU dot (a per-channel (q, px)
dot leaves the systolic array 25% utilized). Per program:
  W[m, q]    = hat(rz[m] - q//py) * hat(ry[m] - q%py)    (VPU build)
  A          = W @ patch                                  (MXU)
  out[m, c]  = sum_d A[m, d] * hat(rx[m] - d//3) * [d%3 == c]

Constraints: py % 8 == 0 when pz > 1 (so the caller's (pz, py) merge
is layout-free) and the W block must fit VMEM; callers gate on
`fits()` and fall back to the XLA path otherwise (also on CPU — no
Mosaic).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pnr_tpu.utils.jax_setup import stabilize_pallas_cache_keys

stabilize_pallas_cache_keys()

_VMEM_SOFT_CAP = 10 * 1024 * 1024


def _roundup(v: int, m: int) -> int:
    return -(-v // m) * m


def fits(patch_shape, m: int) -> bool:
    """Can this (T, S, pz, py, 3*px) packed patch batch run the kernel?"""
    _, s, pz, py, px3 = patch_shape
    if px3 % 3 != 0 or (pz > 1 and py % 8 != 0):
        return False
    q = pz * py
    mpad = _roundup(max(m, 8), 8)
    lanes = _roundup(px3, 128)
    # per-program: all S sigma patches + one live W (f32 + bf16 hi/lo
    # + iotas) + the (Mpad, lanes) temporaries
    vmem = 4 * (s * q * lanes + mpad * q * 3 + 4 * mpad * lanes)
    return vmem <= _VMEM_SOFT_CAP


def _kernel(rel_ref, pat_ref, out_ref, *, pz: int, py: int, px: int, n_sigma: int):
    q = pz * py
    rel_all = rel_ref[0]  # (S*Mpad, 4): rz, ry, rx, pad
    mpad = rel_all.shape[0] // n_sigma

    # iotas shared across the sigma groups (one program per trace);
    # lanes are x-major channel-packed: d = 3*x + c
    qi = jax.lax.broadcasted_iota(jnp.int32, (mpad, q), 1)
    zi = (qi // py).astype(jnp.float32)
    yi = (qi % py).astype(jnp.float32)
    di = jax.lax.broadcasted_iota(jnp.int32, (mpad, 3 * px), 1)
    xi3 = (di // 3).astype(jnp.float32)

    for s in range(n_sigma):
        rel = rel_all[s * mpad : (s + 1) * mpad]
        rz = rel[:, 0:1]
        ry = rel[:, 1:2]
        rx = rel[:, 2:3]
        w = jnp.maximum(0.0, 1.0 - jnp.abs(rz - zi)) * jnp.maximum(
            0.0, 1.0 - jnp.abs(ry - yi)
        )  # (Mpad, q)

        # bf16x3 by explicit hi/lo splitting: one bf16 MXU pass leaves
        # ~1e-3 relative error on the map sums and wrecks the
        # cancellation-sensitive s3 - s2^2/N downstream; HIGHEST (f32)
        # costs 6 passes. W = Whi + Wlo and P = Phi + Plo to bf16
        # residual precision; Whi@Phi + Whi@Plo + Wlo@Phi recovers
        # ~2^-22 relative accuracy in 3 single-pass dots (the dropped
        # Wlo@Plo term is O(2^-32)).
        pat = pat_ref[0, s]  # (q, 3*px) — leading-dim select, no relayout
        w_hi = w.astype(jnp.bfloat16)
        w_lo = (w - w_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        p_hi = pat.astype(jnp.bfloat16)
        p_lo = (pat - p_hi.astype(jnp.float32)).astype(jnp.bfloat16)

        def bdot(a_, b_):
            return jax.lax.dot_general(
                a_, b_, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        a = bdot(w_hi, p_hi) + bdot(w_hi, p_lo) + bdot(w_lo, p_hi)

        wx3 = jnp.maximum(0.0, 1.0 - jnp.abs(rx - xi3))
        aw = a * wx3
        for c in range(3):
            out_ref[0, s * mpad : (s + 1) * mpad, c : c + 1] = jnp.sum(
                jnp.where(di % 3 == c, aw, 0.0), axis=1, keepdims=True
            )


#: The fused-DMA kernel is DISABLED: Mosaic tiles HBM memrefs (1, 128)
#: and rejects DMA windows whose lane extent is not a multiple of 128
#: ("Slice shape along dimension 3 must be aligned to tiling"), so the
#: arbitrary ~32-lane patch windows this kernel slices cannot be
#: expressed on the current toolchain. Kept (with its interpret-mode
#: test) as the target design if Mosaic grows unaligned DMA windows.
_FUSED_ENABLED = False


def fits_fused(maps_shape, pdims, m_per_sigma: int, n_sigma: int) -> bool:
    """Can the fused-DMA kernel run this config?"""
    if not _FUSED_ENABLED:
        return False
    s, l, h, w3 = maps_shape
    pz, py, px = pdims
    if s != n_sigma or (pz > 1 and py % 8 != 0):
        return False
    q = pz * py
    mpad = _roundup(max(m_per_sigma, 8), 8)
    lanes = _roundup(3 * px, 128)
    vmem = 4 * (
        2 * n_sigma * pz * py * lanes  # double-buffered patch scratch
        + mpad * q * 2                 # W + iota temporaries
        + 3 * mpad * lanes             # A, wx3, aw
    )
    return vmem <= _VMEM_SOFT_CAP


def _fused_kernel(
    corner_ref, maps_ref, rel_ref, out_ref, patch_sc, sems,
    *, pz: int, py: int, px: int, n_sigma: int, mpad: int,
):
    q = pz * py
    ti = pl.program_id(0)
    nt = pl.num_programs(0)

    def dma(slot, t_idx, s):
        # packed maps: the x window [cx, cx+px) is the contiguous lane
        # run [3cx, 3cx+3px) — one copy fetches all three channels
        cz = corner_ref[t_idx, 0]
        cy = corner_ref[t_idx, 1]
        cx = corner_ref[t_idx, 2]
        return pltpu.make_async_copy(
            maps_ref.at[s, pl.ds(cz, pz), pl.ds(cy, py), pl.ds(3 * cx, 3 * px)],
            patch_sc.at[slot, s],
            sems.at[slot, s],
        )

    def start_all(slot, t_idx):
        for s in range(n_sigma):
            dma(slot, t_idx, s).start()

    # double buffering: program t computes on the patch its predecessor
    # prefetched and starts the DMA for t+1
    @pl.when(ti == 0)
    def _():
        start_all(0, 0)

    @pl.when(ti + 1 < nt)
    def _():
        start_all((ti + 1) % 2, ti + 1)

    slot = ti % 2
    for s in range(n_sigma):
        dma(slot, ti, s).wait()

    rel = rel_ref[0]  # (n_sigma * Mpad, 4)
    qi = jax.lax.broadcasted_iota(jnp.int32, (mpad, q), 1)
    zi = (qi // py).astype(jnp.float32)
    yi = (qi % py).astype(jnp.float32)
    di = jax.lax.broadcasted_iota(jnp.int32, (mpad, 3 * px), 1)
    xi3 = (di // 3).astype(jnp.float32)

    for s in range(n_sigma):
        rels = rel[s * mpad : (s + 1) * mpad]
        rz = rels[:, 0:1]
        ry = rels[:, 1:2]
        rx = rels[:, 2:3]
        w = jnp.maximum(0.0, 1.0 - jnp.abs(rz - zi)) * jnp.maximum(
            0.0, 1.0 - jnp.abs(ry - yi)
        )
        pat2 = patch_sc[slot, s].reshape(q, 3 * px)
        a = jax.lax.dot_general(
            w, pat2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        aw = a * jnp.maximum(0.0, 1.0 - jnp.abs(rx - xi3))
        for c in range(3):
            out_ref[0, s * mpad : (s + 1) * mpad, c : c + 1] = jnp.sum(
                jnp.where(di % 3 == c, aw, 0.0), axis=1, keepdims=True
            )


@functools.partial(jax.jit, static_argnames=("pdims", "interpret"))
def hat_sample_fused(
    maps: jax.Array,
    corners: jax.Array,
    rel: jax.Array,
    pdims,
    interpret: bool = False,
) -> jax.Array:
    """Fused-DMA variant: slices each trace's patch straight out of the
    packed map stack inside the kernel (double-buffered across the
    trace grid) — no XLA-side patch materialization.

    maps (S, l, h, 3*w) f32 x-major channel-packed
    (build_tube_maps_packed), corners (T, 3) int32 (z, y, x window
    origins in VOLUME units, pre-clamped to [0, dim - pdim]),
    rel (T, S*Mpad, 4) f32
    -> (T, S*Mpad, 4) f32 with columns [v_m1, v_m2, v_m3, garbage].
    """
    n_sigma, l, h, w3 = maps.shape
    pz, py, px = pdims
    t = corners.shape[0]
    smpad = rel.shape[1]
    mpad = smpad // n_sigma
    assert mpad % 8 == 0 and mpad * n_sigma == smpad

    kern = functools.partial(
        _fused_kernel, pz=pz, py=py, px=px, n_sigma=n_sigma, mpad=mpad
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t,),
        in_specs=[
            # explicitly HBM: with ANY the compiler may park small map
            # stacks in VMEM, where .at[] windows must be 128-aligned
            # on the lane dim; HBM is untiled so arbitrary DMA windows
            # are legal
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(
                (1, smpad, 4), lambda i, c: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, smpad, 4), lambda i, c: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, n_sigma, pz, py, 3 * px), jnp.float32),
            pltpu.SemaphoreType.DMA((2, n_sigma)),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t, smpad, 4), jnp.float32),
        interpret=interpret,
    )(corners, maps, rel)


@functools.partial(jax.jit, static_argnames=("interpret",))
def hat_sample_pallas(
    patches: jax.Array, rel: jax.Array, interpret: bool = False
) -> jax.Array:
    """patches (T, S, pz, py, 3*px) f32 x-major channel-packed (lane
    3*x + c, the layout `extract` slices off `build_tube_maps_packed`),
    rel (T, S, Mpad, 4) f32 (columns rz, ry, rx in patch-relative
    coordinates, already clamped)
    -> (T, S, Mpad, 4) f32 with columns [v_m1, v_m2, v_m3, garbage]."""
    t, s, pz, py, px3 = patches.shape
    px = px3 // 3
    mpad = rel.shape[2]
    assert px3 % 3 == 0 and mpad % 8 == 0

    # (pz, py, 3px) -> (q, 3px) is a pure view: NO transpose, no copy —
    # the packed map layout already interleaves channels in the lanes
    pat2 = patches.reshape(t, s, pz * py, 3 * px)
    rel2 = rel.reshape(t, s * mpad, 4)

    kern = functools.partial(_kernel, pz=pz, py=py, px=px, n_sigma=s)
    out = pl.pallas_call(
        kern,
        grid=(t,),
        in_specs=[
            pl.BlockSpec(
                (1, s * mpad, 4), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, s, pz * py, 3 * px),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, s * mpad, 4), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((t, s * mpad, 4), jnp.float32),
        interpret=interpret,
    )(rel2, pat2)
    return out.reshape(t, s, mpad, 4)
