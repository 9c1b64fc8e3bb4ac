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
