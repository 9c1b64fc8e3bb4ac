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

Grid: one program per (trace, sigma). Per program:
  W[m, q]  = hat(rz[m] - q//py) * hat(ry[m] - q%py)     (VPU build)
  A_c      = W @ patch[c]                                (MXU, (M,q)@(q,px))
  out[m,c] = sum_x A_c[m,x] * hat(rx[m] - x)             (VPU reduce)

Constraints: py % 8 == 0 (so the (pz,py) merge is a no-op relayout)
and the W block must fit VMEM; callers gate on `fits()` and fall back
to the XLA path otherwise (also on CPU — no Mosaic).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_SOFT_CAP = 10 * 1024 * 1024


def _roundup(v: int, m: int) -> int:
    return -(-v // m) * m


def fits(patch_shape, m: int) -> bool:
    """Can this (T, S, 3, pz, py, px) patch batch run through the kernel?"""
    _, _, c, pz, py, px = patch_shape
    if c != 3 or (pz > 1 and py % 8 != 0):
        return False
    q = pz * py
    mpad = _roundup(max(m, 8), 8)
    vmem = 4 * (mpad * q * 2 + 3 * q * px + mpad * px * 2 + mpad * 4 * 2)
    return vmem <= _VMEM_SOFT_CAP


def _kernel(rel_ref, pat_ref, out_ref, *, pz: int, py: int, px: int):
    q = pz * py
    rel = rel_ref[0, 0]  # (Mpad, 4): rz, ry, rx, pad
    mpad = rel.shape[0]
    rz = rel[:, 0:1]
    ry = rel[:, 1:2]
    rx = rel[:, 2:3]

    qi = jax.lax.broadcasted_iota(jnp.int32, (mpad, q), 1)
    zi = (qi // py).astype(jnp.float32)
    yi = (qi % py).astype(jnp.float32)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(rz - zi)) * jnp.maximum(
        0.0, 1.0 - jnp.abs(ry - yi)
    )  # (Mpad, q)

    xi = jax.lax.broadcasted_iota(jnp.int32, (mpad, px), 1).astype(jnp.float32)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(rx - xi))  # (Mpad, px)

    pat = pat_ref[0, 0].reshape(3, q, px)
    for c in range(3):
        # HIGHEST (f32): default MXU precision is one bf16 pass (Mosaic
        # supports only DEFAULT/HIGHEST), which leaves
        # ~1e-3 relative error on the map sums and wrecks the
        # cancellation-sensitive s3 - s2^2/N downstream
        a = jax.lax.dot_general(
            w, pat[c], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (Mpad, px)
        out_ref[0, 0, :, c : c + 1] = jnp.sum(a * wx, axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("interpret",))
def hat_sample_pallas(
    patches: jax.Array, rel: jax.Array, interpret: bool = False
) -> jax.Array:
    """patches (T, S, 3, pz, py, px) f32, rel (T, S, Mpad, 4) f32
    (columns rz, ry, rx in patch-relative coordinates, already clamped)
    -> (T, S, Mpad, 4) f32 with columns [v_m1, v_m2, v_m3, garbage]."""
    t, s, c, pz, py, px = patches.shape
    mpad = rel.shape[2]
    assert mpad % 8 == 0

    kern = functools.partial(_kernel, pz=pz, py=py, px=px)
    return pl.pallas_call(
        kern,
        grid=(t, s),
        in_specs=[
            pl.BlockSpec(
                (1, 1, mpad, 4), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, 3, pz, py, px),
                lambda i, j: (i, j, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, mpad, 4), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((t, s, mpad, 4), jnp.float32),
        interpret=interpret,
    )(rel, patches)
