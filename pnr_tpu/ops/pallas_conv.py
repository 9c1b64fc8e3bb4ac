"""Pallas TPU kernels: 1-D convolution passes for the dense filter path.

The XLA shift-and-add formulation (ops/gaussian.py) fuses the k taps
into one pass but re-reads overlapping input windows from HBM — k-fold
read amplification (k is up to 37 for sigma=6). These kernels block the
volume so the convolution axis lives wholly in VMEM: each element is
read from HBM once and written once, independent of k. That turns every
pass of the Frangi pipeline (Gaussian taps and first-difference taps
alike, frangi.cpp:563-784 / :291-390) into a pure ~8 B/voxel HBM
round-trip, which is the roofline for an unfused pass.

Blocking: the conv axis is kept complete inside each block (the input
is edge-padded along that axis beforehand), so BlockSpecs never need
overlapping halos; the grid tiles the other two axes, with uneven
tails handled by Pallas' implicit block clamping (out-of-range lanes
compute garbage that is never written back).

`grad_border=True` reproduces `jnp.gradient` border semantics for the
central-difference kernel: with edge-replicated padding the first/last
plane along the axis computes (f[1]-f[0])/2 — exactly half the
one-sided difference — so the kernel doubles those planes in VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pnr_tpu.utils.jax_setup import stabilize_pallas_cache_keys

stabilize_pallas_cache_keys()

_VMEM_BUDGET = 12 * 1024 * 1024  # soft cap per block (in + out), bytes


def _conv_kernel_factory(taps: tuple, axis3: int, grad_border: bool):
    def kern(x_ref, o_ref):
        # Static (unrolled) tap slices: Mosaic forbids dynamic lane-dim
        # slices ("index must be a multiple of 128"), and static offsets
        # lower to cheap lane rotations. Accumulating in-place into
        # o_ref keeps ONE buffer live instead of a k-temporary sum chain.
        out_len = o_ref.shape[axis3]

        def sl(j):
            if axis3 == 2:
                return x_ref[:, :, j : j + out_len]
            if axis3 == 1:
                return x_ref[:, j : j + out_len, :]
            return x_ref[j : j + out_len, :, :]

        o_ref[:] = jnp.float32(taps[0]) * sl(0)
        for j in range(1, len(taps)):
            o_ref[:] = o_ref[:] + jnp.float32(taps[j]) * sl(j)
        if grad_border:
            # one-sided borders are exactly 2x the edge-padded central diff
            pos = jax.lax.broadcasted_iota(jnp.int32, o_ref.shape, axis3)
            o_ref[:] = jnp.where(
                (pos == 0) | (pos == out_len - 1), 2.0 * o_ref[:], o_ref[:]
            )

    return kern


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


@functools.partial(
    jax.jit, static_argnames=("kernel", "axis", "grad_border", "interpret")
)
def _pallas_conv(vol, kernel, axis, grad_border, interpret=False):
    kernel = np.asarray(kernel, np.float32)
    k = kernel.shape[0]
    half = k // 2
    z, y, x = vol.shape

    v = vol.astype(jnp.float32)
    pad = [(0, 0)] * 3
    pad[axis] = (half, half)
    vp = jnp.pad(v, pad, mode="edge")

    kern = _conv_kernel_factory(tuple(float(t) for t in kernel), axis, grad_border)

    # Pallas DOUBLE-BUFFERS in/out blocks across grid steps, so the
    # scoped-VMEM footprint is 2x (in + out). The tile along the free
    # axis shrinks adaptively so big planes (2048^2 — the pod-scale
    # shard shape) stay under budget instead of OOMing at compile
    # (observed: 16.03M > 16M hard limit at y=2048 with the old fixed
    # by/bx caps).
    if axis == 2:
        per_row = (2 * x + 2 * half) * 4  # in+out bytes per y row
        by = min(256, y, max(8, _VMEM_BUDGET // (2 * per_row) // 8 * 8))
        grid = (z, _cdiv(y, by))
        in_spec = pl.BlockSpec(
            (1, by, x + 2 * half), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        )
        out_spec = pl.BlockSpec(
            (1, by, x), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        )
        blk_bytes = 2 * by * per_row
    elif axis == 1:
        per_col = (2 * y + 2 * half) * 4  # in+out bytes per x lane
        bx = min(512, x, max(128, _VMEM_BUDGET // (2 * per_col) // 128 * 128))
        grid = (z, _cdiv(x, bx))
        in_spec = pl.BlockSpec(
            (1, y + 2 * half, bx), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
        )
        out_spec = pl.BlockSpec(
            (1, y, bx), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
        )
        blk_bytes = 2 * bx * per_col
    else:  # axis == 0
        per = (2 * z + 2 * half) * 4
        bx = min(256, x, max(128, _VMEM_BUDGET // (2 * 8 * per) // 128 * 128))
        by = 8
        grid = (_cdiv(y, by), _cdiv(x, bx))
        in_spec = pl.BlockSpec(
            (z + 2 * half, by, bx), lambda i, j: (0, i, j), memory_space=pltpu.VMEM
        )
        out_spec = pl.BlockSpec(
            (z, by, bx), lambda i, j: (0, i, j), memory_space=pltpu.VMEM
        )
        blk_bytes = 2 * by * bx * per

    if blk_bytes > _VMEM_BUDGET:
        raise ValueError("block exceeds VMEM budget")

    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[in_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((z, y, x), jnp.float32),
        interpret=interpret,
    )(vp)


@functools.lru_cache(maxsize=1)
def mosaic_available() -> bool:
    """One-time probe: can this backend compile+run a Mosaic kernel?

    Checked OUTSIDE any trace (a try/except around pallas_call inside an
    outer jit would not catch the compile-time failure). CPU backends
    have no Mosaic; the probe result is cached for the process.
    """
    try:
        if jax.default_backend() not in ("tpu", "axon"):
            return False

        def k(x_ref, o_ref):
            o_ref[:] = x_ref[:] * 2.0

        # ensure_compile_time_eval: the first call may come from inside
        # a jit trace (the hot paths probe lazily); without it the probe
        # output is a tracer, bool() raises, and False gets cached for
        # the whole process
        with jax.ensure_compile_time_eval():
            out = pl.pallas_call(
                k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)
            )(jnp.ones((8, 128), jnp.float32))
            return bool(out[0, 0] == 2.0)
    except Exception:
        return False


def _blocking_fits(shape, kernel_len: int, axis: int) -> bool:
    # mirrors _pallas_conv's adaptive tiling, incl. the 2x double-buffer
    # factor: fits iff the SMALLEST allowed tile (8 rows / 128 lanes)
    # stays under budget
    k = int(kernel_len)
    half = k // 2
    z, y, x = shape
    if axis == 2:
        blk = 2 * min(8, y) * (2 * x + 2 * half) * 4
    elif axis == 1:
        blk = 2 * min(128, x) * (2 * y + 2 * half) * 4
    else:
        blk = 2 * 8 * min(128, x) * (2 * z + 2 * half) * 4
    return blk <= _VMEM_BUDGET


def pallas_conv1d_along_axis(
    vol: jax.Array, kernel, axis: int, grad_border: bool = False
) -> jax.Array:
    """Correlate (Z, Y, X) `vol` with 1-D `kernel` along `axis`,
    edge-replicated borders (one-sided at borders when grad_border, i.e.
    `jnp.gradient` semantics). float32 output. Falls back to the XLA
    shift-and-add formulation when Mosaic is unavailable or the blocking
    does not fit VMEM."""
    from pnr_tpu.ops.gaussian import conv1d_along_axis

    kernel = np.asarray(kernel, np.float32)
    if mosaic_available() and _blocking_fits(vol.shape, len(kernel), axis):
        return _pallas_conv(vol, tuple(float(t) for t in kernel), axis, grad_border)
    out = conv1d_along_axis(vol, kernel, axis)
    if grad_border:
        w = vol.shape[axis]
        pos = jax.lax.broadcasted_iota(jnp.int32, out.shape, axis)
        out = jnp.where((pos == 0) | (pos == w - 1), 2.0 * out, out)
    return out


@functools.partial(jax.jit, static_argnames=("kernel_y", "kernel_x", "interpret"))
def _pallas_conv_yx(vol, kernel_y, kernel_x, interpret=False):
    """Fused y+x correlation: one HBM round trip for two passes.

    Grid over z (one slice per program, no z halo needed); the y pass
    runs as static sublane slices into a VMEM temporary, the x pass as
    static lane slices — the y-convolved intermediate never touches
    HBM. Edge-replicated borders on both axes (pre-padded)."""
    ky = np.asarray(kernel_y, np.float32)
    kx = np.asarray(kernel_x, np.float32)
    hy = len(ky) // 2
    hx = len(kx) // 2
    z, y, x = vol.shape
    v = vol.astype(jnp.float32)
    vp = jnp.pad(v, ((0, 0), (hy, hy), (hx, hx)), mode="edge")

    ky_t = tuple(float(t) for t in ky)
    kx_t = tuple(float(t) for t in kx)

    def kern(x_ref, o_ref, t_ref):
        # in-place accumulation into the scratch: a chained local sum
        # makes Mosaic stack-allocate one block-sized temp PER TAP and
        # blow the VMEM budget (observed 18 MB for 25 taps)
        t_ref[:] = jnp.float32(ky_t[0]) * x_ref[0, 0:y, :]
        for j in range(1, len(ky_t)):
            t_ref[:] = t_ref[:] + jnp.float32(ky_t[j]) * x_ref[0, j : j + y, :]
        o_ref[0] = jnp.float32(kx_t[0]) * t_ref[:, 0:x]
        for j in range(1, len(kx_t)):
            o_ref[0] = o_ref[0] + jnp.float32(kx_t[j]) * t_ref[:, j : j + x]

    return pl.pallas_call(
        kern,
        grid=(z,),
        in_specs=[
            pl.BlockSpec(
                (1, y + 2 * hy, x + 2 * hx),
                lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec((1, y, x), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((z, y, x), jnp.float32),
        scratch_shapes=[pltpu.VMEM((y, x + 2 * hx), jnp.float32)],
        interpret=interpret,
    )(vp)


def pallas_conv_yx(vol: jax.Array, kernel_y, kernel_x) -> jax.Array:
    """Fused y-then-x correlation of a (Z, Y, X) volume with separable
    1-D kernels, edge-replicated borders. Falls back to two
    single-axis passes when Mosaic is unavailable or a slice block
    exceeds VMEM."""
    from pnr_tpu.ops.gaussian import conv1d_along_axis

    ky = np.asarray(kernel_y, np.float32)
    kx = np.asarray(kernel_x, np.float32)
    z, y, x = vol.shape
    # scoped VMEM: in + out blocks double-buffered by Pallas, plus the
    # single-buffered scratch row
    hy2, hx2 = 2 * (len(ky) // 2), 2 * (len(kx) // 2)
    blk = 2 * ((y + hy2) * (x + hx2) + y * x) * 4 + y * (x + hx2) * 4
    if mosaic_available() and blk <= _VMEM_BUDGET:
        return _pallas_conv_yx(
            vol, tuple(float(t) for t in ky), tuple(float(t) for t in kx)
        )
    out = conv1d_along_axis(vol, kx, axis=2)
    return conv1d_along_axis(out, ky, axis=1)
