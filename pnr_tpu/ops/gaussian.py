"""Separable Gaussian smoothing with clamped (edge-replicate) borders.

Behavioural parity target: `Frangi::imgaussian` (pnr-vaa3d/frangi.cpp:563-877):
1-D normalized sampled-Gaussian kernels of half-width ceil(3*sigma),
applied along x, then y, then z; the z kernel uses sigma/zdist; borders
replicate the edge voxel.

TPU design: each 1-D pass is a `lax.conv_general_dilated` over the
last axis of an edge-padded volume — XLA lowers this onto the MXU and
fuses the padding. The volume is (Z, Y, X) so the innermost (lane)
dimension is X; passes along Y/Z transpose the target axis into the
lane position rather than striding, keeping every conv contiguous.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_kernel(sigma: float) -> np.ndarray:
    """Normalized sampled Gaussian, half-width ceil(3*sigma) (frangi.cpp:568-579)."""
    half = int(math.ceil(3.0 * float(sigma)))
    x = np.arange(-half, half + 1, dtype=np.float64)
    g = np.exp(-(x * x) / (2.0 * float(sigma) ** 2))
    return (g / g.sum()).astype(np.float32)


def conv1d_along_axis(vol: jax.Array, kernel, axis: int) -> jax.Array:
    """Correlate `vol` with a 1-D `kernel` along `axis`, edge-replicated borders.

    Implemented as an unrolled shift-and-add over static slices: XLA
    fuses the k shifted reads into one VPU pass with no transposes,
    ~25x faster on TPU than `conv_general_dilated` with batch=channel=1
    (which lowers to a degenerate convolution, measured 1.2 GB/s).
    """
    kernel = np.asarray(kernel)
    k = kernel.shape[0]
    half = k // 2
    pad = [(0, 0)] * vol.ndim
    pad[axis] = (half, half)
    xp = jnp.pad(vol, pad, mode="edge")
    w = vol.shape[axis]
    out = None
    for j in range(k):
        term = jnp.float32(kernel[j]) * jax.lax.slice_in_dim(xp, j, j + w, axis=axis)
        out = term if out is None else out + term
    return out


def conv1d_hbm_optimal(vol: jax.Array, kernel, axis: int) -> jax.Array:
    """1-D correlation pass at ~8 B/voxel HBM traffic: the Pallas kernel
    on TPU (read-once/write-once independent of tap count), the XLA
    shift-and-add elsewhere."""
    from pnr_tpu.ops.pallas_conv import pallas_conv1d_along_axis

    if vol.ndim == 3:
        return pallas_conv1d_along_axis(vol, kernel, axis)
    return conv1d_along_axis(vol, kernel, axis)


@partial(jax.jit, static_argnames=("sigma", "zdist"))
def imgaussian3d(vol: jax.Array, sigma: float, zdist: float) -> jax.Array:
    """3-D Gaussian smoothing of a (Z, Y, X) volume (frangi.cpp:647-784).

    x and y use sigma; z uses sigma/zdist. Returns float32.
    """
    from pnr_tpu.ops.pallas_conv import pallas_conv_yx

    v = vol.astype(jnp.float32)
    kxy = gaussian_kernel(sigma)
    if v.ndim == 3:
        # fused y+x pass: one HBM round trip instead of two
        v = pallas_conv_yx(v, kxy, kxy)
    else:
        v = conv1d_hbm_optimal(v, kxy, axis=2)
        v = conv1d_hbm_optimal(v, kxy, axis=1)
    if v.shape[0] > 1:
        kz = gaussian_kernel(float(sigma) / float(zdist))
        v = conv1d_hbm_optimal(v, kz, axis=0)  # z
    return v


@partial(jax.jit, static_argnames=("sigma",))
def imgaussian2d(img: jax.Array, sigma: float) -> jax.Array:
    """2-D Gaussian smoothing of a (Y, X) image (frangi.cpp:563-645)."""
    v = img.astype(jnp.float32)
    kxy = gaussian_kernel(sigma)
    v = conv1d_along_axis(v, kxy, axis=1)  # x
    v = conv1d_along_axis(v, kxy, axis=0)  # y
    return v


@partial(jax.jit, static_argnames=("sigma",))
def imgaussian_xy(vol: jax.Array, sigma: float) -> jax.Array:
    """Per-slice xy Gaussian smoothing of a (Z, Y, X) volume, returned as uint8.

    Parity target: the in-place uint8 overload (frangi.cpp:786-877) used
    in the soma path. The reference accumulates into a uint8 buffer
    (truncating on every partial sum, an evident bug); we implement the
    intended behaviour — float accumulation, then truncation to uint8 —
    and note the divergence.
    """
    v = vol.astype(jnp.float32)
    kxy = gaussian_kernel(sigma)
    v = conv1d_along_axis(v, kxy, axis=2)  # x
    v = conv1d_along_axis(v, kxy, axis=1)  # y
    return jnp.clip(v, 0.0, 255.0).astype(jnp.uint8)
