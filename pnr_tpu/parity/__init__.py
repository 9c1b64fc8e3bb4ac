"""Parity harness: compiled-reference oracle for numerical ground truth."""

from pnr_tpu.parity.oracle import ReferenceOracle, get_oracle, unavailable_reason

__all__ = ["ReferenceOracle", "get_oracle", "unavailable_reason"]
