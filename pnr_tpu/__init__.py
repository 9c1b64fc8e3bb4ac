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

from pnr_tpu.config import PNRConfig

__all__ = ["PNRConfig"]
