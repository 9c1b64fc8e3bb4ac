"""Runtime helpers: device warmup and stage profiling."""

from __future__ import annotations

import time
from contextlib import contextmanager

import numpy as np

_warmed = False


def warmup_device_transfers() -> float:
    """Trigger the one-time device->host transfer initialization.

    On remote TPU runtimes the first D2H transfer of a process can take
    minutes (measured ~150-370 s on the axon backend) while every
    subsequent transfer is milliseconds. Paying it eagerly keeps stage
    timings honest. Returns the seconds spent.
    """
    global _warmed
    if _warmed:
        return 0.0
    import jax.numpy as jnp

    t0 = time.perf_counter()
    np.asarray(jnp.zeros((1,), jnp.uint8))
    _warmed = True
    return time.perf_counter() - t0


def fetch_volume(arr, slabs: int = 8) -> np.ndarray:
    """Device->host fetch of a large array via concurrent slab transfers.

    Remote-tunneled TPU runtimes serialize each transfer at ~10-20 MB/s
    but PIPELINE concurrent ones: slicing the leading axis into `slabs`
    pieces and issuing copy_to_host_async on all of them before
    collecting measured 6.2x faster than one np.asarray (1.2 s vs 7.6 s
    for a 52 MB uint8 volume on the axon v5e tunnel). Bitwise identical
    to the direct fetch; falls back to np.asarray for small arrays,
    non-jax inputs, or runtimes without copy_to_host_async.
    """
    if not hasattr(arr, "copy_to_host_async") or arr.ndim == 0:
        return np.asarray(arr)
    n = arr.shape[0]
    slabs = max(1, min(int(slabs), n))
    if slabs == 1 or arr.size * arr.dtype.itemsize < (1 << 20):
        return np.asarray(arr)
    bounds = np.linspace(0, n, slabs + 1).astype(int)
    parts = [arr[a:b] for a, b in zip(bounds[:-1], bounds[1:]) if b > a]
    try:
        for p in parts:
            p.copy_to_host_async()
    except Exception:
        return np.asarray(arr)
    return np.concatenate([np.asarray(p) for p in parts], axis=0)


#: volumes above this many voxels sparsify per Z-chunk (bounds the
#: ~12 B/voxel device intermediates of jnp.nonzero); module-level so
#: tests can exercise the chunked path at CI-sized volumes
_SPARSE_CHUNK_VOX = 128 << 20


def fetch_u8_sparse(arr, nonzero_cap: int = 1 << 22) -> np.ndarray:
    """Exact device->host fetch of a mostly-zero uint8 array via its
    nonzero (index, value) pairs.

    Frangi J8 is typically >99% zeros (dark microscopy background), so
    shipping the ~0.1% nonzero entries moves ~0.2 MB instead of the
    full volume — decisive on the remote tunnel, whose D2H bandwidth
    has been measured anywhere between ~1 and ~20 MB/s. The
    reconstruction is bitwise equal to np.asarray (every nonzero value
    is shipped; the rest ARE zero). Falls back to the slab-parallel
    dense fetch when the array is denser than `nonzero_cap` entries,
    small, or not a jax array.
    """
    if not hasattr(arr, "copy_to_host_async"):
        return np.asarray(arr)
    if arr.dtype != np.uint8 or arr.size * 8 < (1 << 21) or arr.size <= nonzero_cap:
        return fetch_volume(arr)
    if arr.ndim == 3 and arr.size > _SPARSE_CHUNK_VOX and arr.shape[0] > 1:
        # (single-slice giant planes fall through to the direct path:
        # a 1-slice chunk would recurse onto itself, and one plane's
        # nonzero intermediates are bounded by the plane size)
        # Gvox-scale: jnp.nonzero over the flat array materializes
        # ~12 B/voxel of int32 index intermediates on device — at
        # 1024^3 that alone OOMs a 16 GiB chip next to the live J8 +
        # direction maps (observed). Sparsify per Z-chunk instead: the
        # intermediates stay ~1.5 GiB and each chunk ships its own
        # nonzero pairs.
        plane = arr.shape[1] * arr.shape[2]
        cz = max(1, _SPARSE_CHUNK_VOX // plane)
        out = np.empty(arr.shape, np.uint8)
        for z0 in range(0, arr.shape[0], cz):
            out[z0 : z0 + cz] = fetch_u8_sparse(arr[z0 : z0 + cz], nonzero_cap)
        return out
    import jax
    import jax.numpy as jnp

    @jax.jit
    def sparsify(a):
        flat = a.reshape(-1)
        nz = flat > 0
        idx = jnp.nonzero(nz, size=nonzero_cap, fill_value=0)[0].astype(jnp.int32)
        return idx, flat[idx], jnp.sum(nz)

    try:
        idx, val, cnt = sparsify(arr)
        n = int(cnt)
        if n > nonzero_cap:
            return fetch_volume(arr)
        k = max(128, -(-n // 128) * 128)
        idx_k, val_k = idx[:k], val[:k]
        # issue both transfers before collecting either: the tunnel
        # pipelines concurrent requests (same trick as fetch_volume),
        # so this is one link round trip instead of two
        idx_k.copy_to_host_async()
        val_k.copy_to_host_async()
        idx_np = np.asarray(idx_k)
        val_np = np.asarray(val_k)
    except Exception:
        return fetch_volume(arr)
    out = np.zeros(arr.size, np.uint8)
    out[idx_np[:n]] = val_np[:n]
    return out.reshape(arr.shape)


@contextmanager
def stage_timer(name: str, timings: dict, verbose: bool = False):
    if verbose:
        print(f"{name}... ", end="", flush=True)
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    timings[name] = timings.get(name, 0.0) + dt
    if verbose:
        print(f"{dt:.3f} sec.")
