"""Pipeline orchestration (the reference's L1 layer)."""

from pnr_tpu.pipeline.reconstruct import (
    ReconstructionResult,
    reconstruct_graph,
    reconstruction_batch,
    reconstruction_func,
    soma_extraction,
)
from pnr_tpu.pipeline.sharded_reconstruct import reconstruction_func_sharded

__all__ = [
    "ReconstructionResult",
    "reconstruction_func",
    "reconstruct_graph",
    "soma_extraction",
    "reconstruction_batch",
    "reconstruction_func_sharded",
]
