"""Pallas TPU kernel: 1-D convolution along any axis of a 3-D volume.

The XLA shift-and-add formulation (ops/gaussian.py) fuses the k taps
into one pass but every output element re-reads its k inputs from HBM —
k-fold read amplification (k is up to 37 for sigma=6). This kernel
blocks the volume so the convolution axis lives wholly in VMEM: each
element is read from HBM once and written once, independent of k.

Blocking: the conv axis is kept complete inside each block (the input
is edge-padded along that axis beforehand), so BlockSpecs never need
overlapping halos; the grid tiles the other two axes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv_kernel_factory(kernel: np.ndarray, axis3: int):
    taps = np.asarray(kernel, np.float32)
    k = len(taps)

    def kern(x_ref, o_ref):
        # fori_loop + dynamic ref slice keeps ONE accumulator buffer live
        # (a fully unrolled tap sum makes Mosaic stack-allocate one
        # block-sized temp per tap and blow the VMEM budget)
        out_len = o_ref.shape[axis3]
        tap_arr = jnp.asarray(taps)

        def body(j, acc):
            if axis3 == 2:
                sl = x_ref[:, :, pl.ds(j, out_len)]
            elif axis3 == 1:
                sl = x_ref[:, pl.ds(j, out_len), :]
            else:
                sl = x_ref[pl.ds(j, out_len), :, :]
            return acc + tap_arr[j] * sl

        o_ref[:] = jax.lax.fori_loop(
            0, k, body, jnp.zeros(o_ref.shape, jnp.float32)
        )

    return kern, k


def _roundup(v: int, m: int) -> int:
    return -(-v // m) * m


def pallas_conv1d_along_axis(vol: jax.Array, kernel, axis: int) -> jax.Array:
    """Correlate (Z, Y, X) `vol` with 1-D `kernel` along `axis`,
    edge-replicated borders. float32 output. Falls back to the XLA
    shift-and-add for shapes the blocking does not cover."""
    from pnr_tpu.ops.gaussian import conv1d_along_axis

    kernel = np.asarray(kernel, np.float32)
    k = kernel.shape[0]
    half = k // 2
    z, y, x = vol.shape

    v = vol.astype(jnp.float32)
    pad = [(0, 0)] * 3
    pad[axis] = (half, half)
    vp = jnp.pad(v, pad, mode="edge")

    kern, _ = _conv_kernel_factory(kernel, axis)

    if axis == 2:
        # grid over (z, y-blocks); block = (1, BY, Xpad)
        by = max(8, min(256, _roundup(y, 8)))
        if y % by != 0 and y > by:
            return conv1d_along_axis(vol, kernel, axis)
        by = min(by, y)
        grid = (z, -(-y // by))
        in_spec = pl.BlockSpec(
            (1, by, x + 2 * half), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        )
        out_spec = pl.BlockSpec(
            (1, by, x), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        )
    elif axis == 1:
        bx = 128 if x % 128 == 0 else x
        if bx * (y + 2 * half) * 4 > 8 * 1024 * 1024:
            return conv1d_along_axis(vol, kernel, axis)
        grid = (z, -(-x // bx))
        in_spec = pl.BlockSpec(
            (1, y + 2 * half, bx), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
        )
        out_spec = pl.BlockSpec(
            (1, y, bx), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
        )
    else:  # axis == 0
        bx = 128 if x % 128 == 0 else x
        by = 8 if y % 8 == 0 else y
        if bx * by * (z + 2 * half) * 4 > 8 * 1024 * 1024:
            return conv1d_along_axis(vol, kernel, axis)
        grid = (-(-y // by), -(-x // bx))
        in_spec = pl.BlockSpec(
            (z + 2 * half, by, bx), lambda i, j: (0, i, j), memory_space=pltpu.VMEM
        )
        out_spec = pl.BlockSpec(
            (z, by, bx), lambda i, j: (0, i, j), memory_space=pltpu.VMEM
        )

    try:
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[in_spec],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((z, y, x), jnp.float32),
        )(vp)
    except Exception:
        return conv1d_along_axis(vol, kernel, axis)
