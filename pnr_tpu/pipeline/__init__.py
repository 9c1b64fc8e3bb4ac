"""Pipeline orchestration (the reference's L1 layer)."""

from pnr_tpu.pipeline.reconstruct import (
    ReconstructionResult,
    reconstruct_graph,
    reconstruction_func,
    soma_extraction,
)

__all__ = [
    "ReconstructionResult",
    "reconstruction_func",
    "reconstruct_graph",
    "soma_extraction",
]
