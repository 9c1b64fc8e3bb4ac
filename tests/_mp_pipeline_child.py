"""One process of a 2-process cluster running the FULL sharded pipeline.

Spawned by tests/test_multiprocess.py: both processes run
`reconstruction_func_sharded` end to end (soma, halo Frangi, seeds,
scoring, staged handoff tracing, host graph) over an 8-device global
mesh — the redundant-host-driver design: every process executes the
same deterministic host logic, and `fetch_replicated` all-gathers the
few sharded stage outputs the host needs. Process 0 writes the result
for the parent to compare against a single-process 8-device run
(bitwise J8/types/counts, ulp-tolerance coordinates).
Usage: python _mp_pipeline_child.py <process_id> <port> <out.npz>
"""

import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]
out_path = sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax
import numpy as np

from pnr_tpu.parallel.multihost import init_multihost, make_global_mesh

init_multihost(f"localhost:{port}", num_processes=2, process_id=pid)
assert jax.process_count() == 2 and len(jax.devices()) == 8

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _mp_common import (  # noqa: E402
    MP_CFG, MP_CFG_2D, mp_phantom, mp_phantom_2d,
)

from pnr_tpu.pipeline.sharded_reconstruct import (  # noqa: E402
    reconstruction_func_sharded,
)

mesh = make_global_mesh()
verbose = bool(int(os.environ.get("PNR_MP_VERBOSE", "0"))) and pid == 0
res = reconstruction_func_sharded(mp_phantom(), MP_CFG, mesh, verbose=verbose)
assert len(res.n0) > 2 and len(res.tree) > 2

# 2-D leg: Y-sharded single-slice image (its multi-process branch
# gathers J8 from the transposed layout + decodes on replicated maps)
res2 = reconstruction_func_sharded(
    mp_phantom_2d(), MP_CFG_2D, mesh, verbose=verbose
)
assert len(res2.tree) > 2

if pid == 0:
    np.savez(
        out_path,
        x=np.asarray(res.n0.x), y=np.asarray(res.n0.y),
        z=np.asarray(res.n0.z), sig=np.asarray(res.n0.sig),
        ntype=np.asarray(res.n0.type),
        tree_n=len(res.tree), trace_count=res.trace_count, j8=res.j8,
        tree_n_2d=len(res2.tree), x_2d=np.asarray(res2.n0.x),
        y_2d=np.asarray(res2.n0.y), j8_2d=res2.j8,
    )
print(f"proc {pid}: full sharded pipeline OK |n0|={len(res.n0)} "
      f"|tree|={len(res.tree)} traces={res.trace_count} "
      f"|tree2d|={len(res2.tree)}", flush=True)
