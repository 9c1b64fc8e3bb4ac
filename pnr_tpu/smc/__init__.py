"""Sequential Monte Carlo tracer (the reference's L4 layer, tracker.cpp)."""

from pnr_tpu.smc.directions import generate_directions, nearest_direction
from pnr_tpu.smc.priors import PriorTables, build_prior_tables

__all__ = [
    "generate_directions",
    "nearest_direction",
    "PriorTables",
    "build_prior_tables",
    "BatchedTracker",
    "TraceResult",
]


def __getattr__(name):
    # tracker pulls jax (~1.8 s); loaded lazily so the host one-shot
    # engine can import smc.priors/directions jax-free
    if name in ("BatchedTracker", "TraceResult"):
        from pnr_tpu.smc import tracker

        return getattr(tracker, name)
    raise AttributeError(name)
