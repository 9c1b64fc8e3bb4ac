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


def conv1d_along_axis(vol: jax.Array, kernel: jax.Array, axis: int) -> jax.Array:
    """Correlate `vol` with a 1-D `kernel` along `axis`, edge-replicated borders."""
    k = kernel.shape[0]
    half = k // 2
    x = jnp.moveaxis(vol, axis, -1)
    shp = x.shape
    n = int(np.prod(shp[:-1])) if len(shp) > 1 else 1
    x = x.reshape(1, 1, n, shp[-1])
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (half, half)), mode="edge")
    kern = kernel.reshape(1, 1, 1, k).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x,
        kern,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    y = y.reshape(shp)
    return jnp.moveaxis(y, -1, axis)


@partial(jax.jit, static_argnames=("sigma", "zdist"))
def imgaussian3d(vol: jax.Array, sigma: float, zdist: float) -> jax.Array:
    """3-D Gaussian smoothing of a (Z, Y, X) volume (frangi.cpp:647-784).

    x and y use sigma; z uses sigma/zdist. Returns float32.
    """
    v = vol.astype(jnp.float32)
    kxy = jnp.asarray(gaussian_kernel(sigma))
    v = conv1d_along_axis(v, kxy, axis=2)  # x
    v = conv1d_along_axis(v, kxy, axis=1)  # y
    if v.shape[0] > 1:
        kz = jnp.asarray(gaussian_kernel(float(sigma) / float(zdist)))
        v = conv1d_along_axis(v, kz, axis=0)  # z
    return v


@partial(jax.jit, static_argnames=("sigma",))
def imgaussian2d(img: jax.Array, sigma: float) -> jax.Array:
    """2-D Gaussian smoothing of a (Y, X) image (frangi.cpp:563-645)."""
    v = img.astype(jnp.float32)
    kxy = jnp.asarray(gaussian_kernel(sigma))
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
    kxy = jnp.asarray(gaussian_kernel(sigma))
    v = conv1d_along_axis(v, kxy, axis=2)  # x
    v = conv1d_along_axis(v, kxy, axis=1)  # y
    return jnp.clip(v, 0.0, 255.0).astype(jnp.uint8)
