"""Host one-shot engine: the full reconstruction pipeline with zero jax.

NumPy/SciPy/native-C++ mirror of the device pipeline for laptop-sized
one-shot CLI invocations, where jax import + device init + compiles
dominate wall-clock (see hostpath/pipeline.py). Selected automatically
by the CLI for small volumes (cli.py `_maybe_host_fast_path`);
force/disable with PNR_TPU_HOST_PATH=1/0.
"""

from pnr_tpu.hostpath.pipeline import host_reconstruction_func

__all__ = ["host_reconstruction_func"]
