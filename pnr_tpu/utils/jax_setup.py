"""Process-level jax/XLA setup helpers.

`stabilize_pallas_cache_keys` fixes the round-4 cold-start root cause:
every Pallas-containing jit MISSED the persistent compilation cache in
every fresh process. The serialized Mosaic kernel module embedded in
`tpu_custom_call`'s backend_config carries MLIR debug locations, which
are unstable across traces/processes (call-site lines, per-process
uniquification) — and because the payload is an opaque string, jax's
cache-key canonicalizer cannot strip them the way it strips the outer
module's locations. Observed: dozens of distinct cache entries for the
SAME `frangi3d_fused`/`trace_stage` computations across one day's runs,
re-paying 20-30 s of XLA compiles per fresh process.

The fix runs MLIR's standard `strip-debuginfo` pass on the Mosaic
module right before jax serializes it. Measured on v5e: payloads become
byte-identical across traces (and ~30% smaller), kernels compile and
run bit-identically. Cost: Mosaic diagnostics lose source locations
(opt out: PNR_TPU_STABLE_PALLAS_KEYS=0).
"""

from __future__ import annotations

import os

_done = False


def stabilize_pallas_cache_keys() -> None:
    """Idempotent; call before any pallas_call lowering."""
    global _done
    if _done or os.environ.get("PNR_TPU_STABLE_PALLAS_KEYS") == "0":
        return
    _done = True
    try:
        import jax._src.tpu_custom_call as tcc
        from jaxlib.mlir.passmanager import PassManager

        orig = tcc._lower_mosaic_module_to_asm
        if getattr(orig, "_pnr_tpu_stable", False):
            return

        def _stable_lower(module, *, ir_version=None):
            try:
                with module.context:
                    PassManager.parse(
                        "builtin.module(strip-debuginfo)"
                    ).run(module.operation)
            except Exception:
                pass  # diagnostics-only fallback: serialize as-is
            return orig(module, ir_version=ir_version)

        _stable_lower._pnr_tpu_stable = True
        tcc._lower_mosaic_module_to_asm = _stable_lower
    except Exception:
        # jax internals moved: the cache degrades to r4 behavior
        # (correct, just slower cold starts) rather than breaking
        pass
