"""pnr_tpu — TPU-native probabilistic neuron reconstruction framework.

A ground-up JAX/XLA/Pallas re-design of the Advantra/PNR pipeline
(reference: miroslavradojevic/pnr, a C++ Vaa3D plugin implementing
Radojevic & Meijering, Neuroinformatics 2019): multi-scale Frangi
vesselness filtering, local-maxima seed extraction, sequential Monte
Carlo (particle filter) neurite tracing, and node-graph post-processing
producing SWC neuron morphologies from 3-D fluorescence microscopy
stacks.

Where the reference is sequential single-threaded C++
(pnr-vaa3d/Advantra_plugin.cpp:2183 `reconstruction_func`), this
framework is a batched array program: dense filters run as XLA/Pallas
stencils over an HBM-resident volume, hundreds of SMC traces advance
in lockstep under `vmap`/`lax.scan`, and volumes larger than one chip
shard across a `jax.sharding.Mesh` with halo exchange.
"""

__version__ = "0.1.0"

import os as _os


def _enable_compilation_cache() -> None:
    """Persist XLA compilations across processes (opt out: PNR_TPU_NO_CACHE=1).

    TPU compile times for the tracer graph run to minutes; the persistent
    cache makes every run after the first start instantly.
    """
    if _os.environ.get("PNR_TPU_NO_CACHE"):
        return
    try:
        import jax

        cache_dir = _os.environ.get(
            "PNR_TPU_CACHE_DIR",
            _os.path.join(_os.path.expanduser("~"), ".cache", "pnr_tpu_xla"),
        )
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass


_enable_compilation_cache()

from pnr_tpu.config import PNRConfig

__all__ = ["PNRConfig"]
