"""Particle mean-shift clustering for cluster-aware resampling.

Parity target: `Tracker::ms/clustering/extract/runOne`
(pnr-vaa3d/tracker.cpp:1604-1774) — fully implemented in the reference
but its call site is commented out (component 34, SURVEY.md §2); it is
provided here as an optional, batched building block:

* `mean_shift`: every particle converges to the local mean of the
  ORIGINAL particle positions within a flat kernel of radius krad;
* `cluster_labels`: connected components of the converged points under
  a distance threshold (label propagation);
* `largest_cluster`: particle indices of the biggest cluster and the
  cumulative sum of their weights (the reference's `extract`).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("max_iter",))
def mean_shift(pts: jax.Array, krad: float, max_iter: int = 50, eps2: float = 1e-9):
    """Flat-kernel mean shift of (N, 3) points over their own support."""
    support = pts
    k2 = krad * krad

    def body(state):
        conv, active, it = state
        d2 = jnp.sum((conv[:, None, :] - support[None, :, :]) ** 2, axis=-1)
        m = (d2 <= k2).astype(jnp.float32)
        cnt = jnp.maximum(jnp.sum(m, axis=1), 1.0)
        nxt = jnp.matmul(m, support, precision=jax.lax.Precision.HIGHEST) / cnt[:, None]
        move2 = jnp.sum((nxt - conv) ** 2, axis=1)
        conv = jnp.where(active[:, None], nxt, conv)
        return conv, active & (move2 > eps2), it + 1

    def cond(state):
        _, active, it = state
        return (it < max_iter) & jnp.any(active)

    conv, _, _ = jax.lax.while_loop(
        cond, body, (pts, jnp.ones(pts.shape[0], jnp.bool_), jnp.int32(0))
    )
    return conv


@jax.jit
def cluster_labels(conv: jax.Array, dist: float) -> jax.Array:
    """Connected-component labels of converged points within `dist`.

    Iterated min-label propagation over the adjacency (the parallel
    equivalent of the reference's sequential relabeling loop).
    """
    n = conv.shape[0]
    d2 = jnp.sum((conv[:, None, :] - conv[None, :, :]) ** 2, axis=-1)
    adj = d2 < dist * dist  # includes self

    def body(state):
        lab, _ = state
        # new label = min label among neighbours
        big = jnp.int32(n)
        neigh = jnp.where(adj, lab[None, :], big)
        new = jnp.min(neigh, axis=1)
        return new, jnp.any(new != lab)

    def cond(state):
        return state[1]

    lab0 = jnp.arange(n, dtype=jnp.int32)
    lab, _ = jax.lax.while_loop(cond, body, (lab0, jnp.bool_(True)))
    return lab


def largest_cluster(labels: np.ndarray, weights: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Indices of the largest cluster + cumulative weight sums
    (Tracker::extract, tracker.cpp:1604-1650)."""
    labels = np.asarray(labels)
    weights = np.asarray(weights)
    vals, counts = np.unique(labels, return_counts=True)
    best = vals[np.argmax(counts)]
    idx = np.nonzero(labels == best)[0]
    csw = np.cumsum(weights[idx])
    return idx, csw
