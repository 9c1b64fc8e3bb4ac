"""Multi-host (multi-process) mesh setup over the JAX distributed runtime.

The reference is a single-process plugin (SURVEY.md §2b: no NCCL/MPI/
Gloo anywhere); the TPU-native scale-out axis is `jax.distributed` —
one process per host/slice, XLA collectives riding ICI within a slice
and DCN across slices. Nothing in `parallel/` changes for multi-host:
`frangi3d_sharded`, the halo exchanges and the sharded seed extraction
are written against a `Mesh`, and a mesh over `jax.devices()` AFTER
`init_multihost()` spans every process's devices — the same `ppermute`
ring that crosses chips within a host crosses hosts at the process
boundary (certified cross-process by tests/test_multiprocess.py on a
2-process gloo CPU cluster).

Host-side stages (seed flood, FCFS commit, graph post-processing) are
driven by process 0 in this design; use `process_index()` to gate them
and `shard_volume_global` so each process only materializes its own
slabs of the input.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Join this process to the JAX distributed runtime; returns the
    process index.

    With no arguments the runtime autodetects from the environment
    (TPU pod metadata, or JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID). Call once per process, BEFORE any other jax use;
    safe to call in a single-process run only with explicit
    num_processes=1 (autodetection requires a coordinator).
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_index()


def make_global_mesh(axis: str = "z") -> Mesh:
    """1-D mesh over ALL devices of ALL processes, in process order.

    `jax.devices()` after `init_multihost` enumerates every process's
    devices; a Z-sharded volume on this mesh therefore spans hosts, and
    the halo-exchange `ppermute` ring crosses the host boundary exactly
    where the shard boundary does.
    """
    return Mesh(np.array(jax.devices()), (axis,))


def fetch_replicated(arr) -> np.ndarray:
    """`np.asarray` for possibly multi-process arrays.

    Single-process (or fully-replicated/addressable) arrays fetch
    directly; an array with remote shards is first resharded to
    replicated through a jitted identity — XLA inserts the all-gather —
    so every process can read the full value. The redundant-host-driver
    design runs the same deterministic host logic on every process, and
    this is its one cross-process data dependency.
    """
    if getattr(arr, "is_fully_addressable", True) or arr.is_fully_replicated:
        return np.asarray(arr)
    return np.asarray(_replicator(arr.sharding.mesh)(arr))


@functools.lru_cache(maxsize=None)
def _replicator(mesh: Mesh):
    # one jitted identity-to-replicated resharder per mesh: a fresh
    # jax.jit(lambda) per call would miss the pjit dispatch cache and
    # re-trace the all-gather on every stage fetch
    return jax.jit(lambda x: x, out_shardings=NamedSharding(mesh, P()))


def allgather_host_rows(rows: np.ndarray) -> np.ndarray:
    """All-gather small per-process host arrays of shape (n_p, k) with
    VARYING n_p across processes; returns their concatenation in
    process order on every process.

    Intended for KB-scale metadata (per-shard seed lists), not volumes:
    counts are gathered first, each process pads its rows to the max
    count, and one fixed-shape all-gather ships the padded block. The
    result is value-identical on every process (redundant-host-driver
    invariant)."""
    rows = np.ascontiguousarray(rows)
    if jax.process_count() == 1:
        return rows
    from jax.experimental import multihost_utils as mhu

    counts = np.asarray(
        mhu.process_allgather(np.asarray(rows.shape[0], np.int32))
    ).reshape(-1)
    maxn = int(counts.max())
    if maxn == 0:
        return rows[:0]
    pad = np.zeros((maxn - rows.shape[0],) + rows.shape[1:], rows.dtype)
    gathered = np.asarray(
        mhu.process_allgather(np.concatenate([rows, pad], axis=0))
    )
    return np.concatenate(
        [gathered[p, : counts[p]] for p in range(len(counts))], axis=0
    )


def shard_volume_global(vol: np.ndarray, mesh: Mesh) -> jax.Array:
    """Place a (Z, Y, X) volume Z-sharded over a (possibly multi-host)
    mesh. Unlike `shard_volume` (single-process `device_put`), each
    process materializes only the slabs its local devices own — the
    multi-host loading path, where every host reads its own Z range of
    the stack. `vol` may be the full volume on every process (simple)
    or any object supporting `vol[idx]` for this process's index
    windows (a memory-mapped TIF, an h5 dataset) so a host never loads
    remote slabs.
    """
    if vol.shape[0] % mesh.devices.size:
        raise ValueError(
            f"mesh size ({mesh.devices.size}) must divide Z={vol.shape[0]}"
        )
    sharding = NamedSharding(mesh, P(mesh.axis_names[0]))
    return jax.make_array_from_callback(
        vol.shape, sharding, lambda idx: np.asarray(vol[idx])
    )
