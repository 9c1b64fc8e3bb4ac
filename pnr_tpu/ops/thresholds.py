"""Histogram thresholding: max-entropy (Kapur), Otsu, intermodes.

Parity targets: `maxentropy_th` (pnr-vaa3d/toolbox.cpp:657-737, the
live path used for soma segmentation), `otsu_th` (:596-655),
`intermodes_th` (:528-594).

Design: the 256-bin histogram is computed on device (a one-pass
reduction that shards trivially — under a mesh it is a per-shard
histogram + psum). The 256-entry threshold searches are vectorized
jnp; intermodes' data-dependent smoothing loop runs on host over the
histogram (256 floats) since its iteration count is value-dependent.
"""

from __future__ import annotations

from typing import Union

import jax
import jax.numpy as jnp
import numpy as np

_FLT_MIN = 1.175494e-38


@jax.jit
def histogram256(img: jax.Array) -> jax.Array:
    """256-bin histogram of a uint8 array (int32 counts)."""
    return jnp.zeros((256,), jnp.int32).at[img.reshape(-1).astype(jnp.int32)].add(1)


def _as_hist(img_or_hist: Union[jax.Array, np.ndarray]) -> jax.Array:
    arr = jnp.asarray(img_or_hist)
    if arr.shape == (256,):
        return arr.astype(jnp.float32)
    return histogram256(arr).astype(jnp.float32)


@jax.jit
def _maxentropy_from_hist(hist: jax.Array) -> jax.Array:
    p = hist / jnp.sum(hist)
    pt = jnp.cumsum(p)

    plogp = jnp.where(p > _FLT_MIN, p * jnp.log(jnp.maximum(p, _FLT_MIN)), 0.0)
    cum_plogp = jnp.cumsum(plogp)
    total_plogp = cum_plogp[-1]

    # Black entropy over [0..t]: -sum p/pT log(p/pT) = -(1/pT) sum plogp + log pT
    hb = jnp.where(
        pt > _FLT_MIN,
        -cum_plogp / jnp.maximum(pt, _FLT_MIN) + jnp.log(jnp.maximum(pt, _FLT_MIN)),
        0.0,
    )
    ptw = 1.0 - pt
    rest_plogp = total_plogp - cum_plogp
    hw = jnp.where(
        ptw > _FLT_MIN,
        -rest_plogp / jnp.maximum(ptw, _FLT_MIN) + jnp.log(jnp.maximum(ptw, _FLT_MIN)),
        0.0,
    )
    return jnp.argmax(hb + hw).astype(jnp.int32)


def maxentropy_th(img_or_hist) -> int:
    """Kapur max-entropy threshold of a uint8 image (or 256-bin histogram)."""
    return int(_maxentropy_from_hist(_as_hist(img_or_hist)))


@jax.jit
def _otsu_from_hist(hist: jax.Array) -> jax.Array:
    size = jnp.sum(hist)
    prob = hist / size
    omega = jnp.cumsum(prob)
    levels = jnp.arange(256, dtype=jnp.float32)
    myu = jnp.cumsum(levels * prob)
    mu_total = myu[-1]
    valid = (omega != 0.0) & (omega != 1.0)
    sigma = jnp.where(
        valid,
        (mu_total * omega - myu) ** 2 / jnp.maximum(omega * (1.0 - omega), _FLT_MIN),
        0.0,
    )
    # Reference scans t in [0, 254] keeping strictly-greater (first max wins).
    sigma = sigma.at[255].set(0.0)
    best = jnp.argmax(sigma)
    return jnp.where(sigma[best] > 0.0, best, 0).astype(jnp.int32)


def otsu_th(img_or_hist) -> int:
    """Otsu inter-class-variance threshold (toolbox.cpp:596-655)."""
    return int(_otsu_from_hist(_as_hist(img_or_hist)))


def _bimodal(y: np.ndarray) -> bool:
    modes = 0
    for k in range(1, len(y) - 1):
        if y[k - 1] < y[k] and y[k + 1] < y[k]:
            modes += 1
            if modes > 2:
                return False
    return modes == 2


def intermodes_th(img_or_hist) -> int:
    """Intermodes threshold: smooth histogram until bimodal, mean of the peaks.

    Returns -1 if no bimodal form after 10000 iterations (toolbox.cpp:574-578).
    """
    hist = np.asarray(_as_hist(img_or_hist))
    nz = np.nonzero(hist > 0)[0]
    if nz.size == 0:
        return -1
    minbin, maxbin = int(nz[0]), int(nz[-1])
    h = hist[minbin : maxbin + 1].astype(np.float64)
    it = 0
    while not _bimodal(h):
        # 3-point running mean over the original values; the first bin sees a
        # zero left neighbour and the last bin averages only two terms,
        # matching the reference's rolling stencil (toolbox.cpp:563-572).
        prev = np.concatenate(([0.0], h[:-1]))
        nxt = np.concatenate((h[1:], [0.0]))
        sm = (prev + h + nxt) / 3.0
        sm[-1] = (h[-2] + h[-1]) / 3.0 if len(h) > 1 else h[-1] / 3.0
        h = sm
        it += 1
        if it > 10000:
            return -1
    peaks = [i for i in range(1, len(h) - 1) if h[i - 1] < h[i] and h[i + 1] < h[i]]
    return int(np.floor(sum(peaks) / 2.0)) + minbin
