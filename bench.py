"""Benchmark: multi-scale Frangi vesselness throughput on real hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: Frangi Mvoxels/s (BASELINE.md filter-bench config: sigmas
2,4,6, zdist 2) — the end-to-end filter step (Gaussian derivatives,
per-voxel 3x3 eigensolve, vesselness, max-over-scales, direction
quantization, J8 normalization) over a uint8 volume.

vs_baseline: ratio against a single-core NumPy/SciPy oracle of the
same computation measured in-process on a smaller volume (the
reference C++ plugin publishes no numbers — BASELINE.md — and is a
sequential single-thread implementation of the same per-voxel work).
"""

from __future__ import annotations

import json
import time

import numpy as np


SIGMAS = (2.0, 4.0, 6.0)
ZDIST = 2.0
SHAPE = (128, 448, 448)  # ~25.7 Mvoxels
BASE_SHAPE = (24, 96, 96)  # oracle volume (~0.22 Mvoxels)


def make_volume(shape):
    rng = np.random.default_rng(0)
    z, y, x = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    d2 = (y - shape[1] / 2) ** 2 + ((z - shape[0] / 2) * ZDIST) ** 2
    vol = 200.0 * np.exp(-d2 / (2 * 9.0)) * (0.7 + 0.3 * np.sin(x / 4.0))
    return np.clip(vol + rng.normal(0, 5, shape), 0, 255).astype(np.uint8)


def bench_tpu(vol):
    import jax
    import jax.numpy as jnp

    from pnr_tpu.ops import frangi3d, normalize_to_u8
    from pnr_tpu.utils.runtime import warmup_device_transfers

    warmup_device_transfers()

    @jax.jit
    def step(v):
        j, jmin, jmax, vx, vy, vz = frangi3d(v, SIGMAS, ZDIST)
        return normalize_to_u8(j, jmin, jmax), vx, vy, vz

    def force(o):
        # jax.block_until_ready is NOT a completion barrier on remote TPU
        # runtimes (execution is lazy until a fetch); a scalar fetch is.
        return float(o[0][5, 5, 5])

    dvol = jnp.asarray(vol)
    force(step(dvol))  # compile + first run

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        force(step(dvol))
    dt = (time.perf_counter() - t0) / reps
    return vol.size / dt / 1e6  # Mvoxels/s


def bench_numpy_oracle(vol):
    """Single-core SciPy/NumPy implementation of the same filter."""
    import scipy.ndimage as ndi

    from pnr_tpu.ops.gaussian import gaussian_kernel

    t0 = time.perf_counter()
    j = None
    for sig in SIGMAS:
        kxy = gaussian_kernel(sig).astype(np.float64)
        kz = gaussian_kernel(sig / ZDIST).astype(np.float64)
        f = vol.astype(np.float64)
        f = ndi.correlate1d(f, kxy, axis=2, mode="nearest")
        f = ndi.correlate1d(f, kxy, axis=1, mode="nearest")
        f = ndi.correlate1d(f, kz, axis=0, mode="nearest")
        s2 = sig * sig
        dz = np.gradient(f, axis=0)
        dy = np.gradient(f, axis=1)
        dx = np.gradient(f, axis=2)
        h = np.empty(vol.shape + (3, 3))
        h[..., 0, 0] = np.gradient(dx, axis=2) * s2
        h[..., 1, 1] = np.gradient(dy, axis=1) * s2
        h[..., 2, 2] = np.gradient(dz, axis=0) * s2
        h[..., 0, 1] = h[..., 1, 0] = np.gradient(dx, axis=1) * s2
        h[..., 0, 2] = h[..., 2, 0] = np.gradient(dx, axis=0) * s2
        h[..., 1, 2] = h[..., 2, 1] = np.gradient(dy, axis=0) * s2
        w = np.linalg.eigvalsh(h.reshape(-1, 3, 3))
        order = np.argsort(np.abs(w), axis=1)
        w = np.take_along_axis(w, order, axis=1)
        l1, l2, l3 = w[:, 0], w[:, 1], w[:, 2]
        with np.errstate(all="ignore"):
            ra = np.abs(l2) / np.abs(l3)
            rb = np.abs(l1) / np.sqrt(np.abs(l2 * l3))
            s = np.sqrt(l1**2 + l2**2 + l3**2)
            v = (1 - np.exp(-(ra**2) / 0.5)) * np.exp(-(rb**2) / 0.5) * (
                1 - np.exp(-(s**2) / (2 * 500.0**2))
            )
        v = np.where((l2 > 0) | (l3 > 0), 0.0, v)
        v = np.nan_to_num(v).reshape(vol.shape)
        j = v if j is None else np.maximum(j, v)
    jmin, jmax = j.min(), j.max()
    _ = np.round((j - jmin) / max(jmax - jmin, 1e-30) * 255).astype(np.uint8)
    dt = time.perf_counter() - t0
    return vol.size / dt / 1e6


def main():
    vol = make_volume(SHAPE)
    tpu_mvox = bench_tpu(vol)
    base_mvox = bench_numpy_oracle(make_volume(BASE_SHAPE))
    print(
        json.dumps(
            {
                "metric": "frangi_throughput",
                "value": round(tpu_mvox, 2),
                "unit": "Mvoxels/s",
                "vs_baseline": round(tpu_mvox / base_mvox, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
