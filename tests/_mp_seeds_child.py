"""One process of a 2-process cluster certifying the per-shard seed
extraction (VERDICT r3 item 2): each process floods ONLY its local
Z-slabs (the reference flood is per z-slice, seed.cpp:574) and decodes
directions from local map shards — `fetch_replicated` is instrumented
to FAIL on any volume-sized gather during the seed stage, and the
resulting global seed set must be IDENTICAL to the single-device host
flood on the fully gathered J8.
Usage: python _mp_seeds_child.py <process_id> <port> <unused>
"""

import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax
import numpy as np

from pnr_tpu.parallel.multihost import init_multihost, make_global_mesh

init_multihost(f"localhost:{port}", num_processes=2, process_id=pid)
assert jax.process_count() == 2 and len(jax.devices()) == 8

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _mp_common import MP_CFG, mp_phantom  # noqa: E402

import pnr_tpu.parallel.multihost as mh  # noqa: E402
import pnr_tpu.pipeline.sharded_reconstruct as sr  # noqa: E402
from pnr_tpu.parallel.sharded import (  # noqa: E402
    normalize_to_u8_sharded,
    shard_volume,
)
from pnr_tpu.seeds.extract import decode_directions_device  # noqa: E402

mesh = make_global_mesh()
vol = mp_phantom()
span = vol.shape[0]
vs = shard_volume(sr._pad_z_replicate(vol, 8), mesh)
j, jmin, jmax, vx, vy, vz = sr._jit_frangi3d_sharded(
    mesh, MP_CFG.sigmas, MP_CFG.zdist,
    MP_CFG.frangi_alpha, MP_CFG.frangi_beta, MP_CFG.frangi_c,
)(vs)
j8 = normalize_to_u8_sharded(j, jmin, jmax)

orig_fetch = mh.fetch_replicated


def guarded(arr):
    if getattr(arr, "size", 0) >= vol.size:
        raise AssertionError(
            f"volume-sized gather ({arr.shape}) inside the per-shard seed "
            "stage — no process may materialize full J8 or a direction map"
        )
    return orig_fetch(arr)


sr.fetch_replicated = mh.fetch_replicated = guarded
try:
    pos, dirs = sr._seeds_per_shard_multiprocess(
        j8, vx, vy, vz, MP_CFG.tolerance, span
    )
finally:
    sr.fetch_replicated = mh.fetch_replicated = orig_fetch

# single-device reference: host flood on the fully gathered J8
j8_full = orig_fetch(j8)[:span]
zz, yy, xx = np.nonzero(sr._host_flood(j8_full, MP_CFG.tolerance))
ref_pos = np.stack([xx, yy, zz], axis=-1).astype(np.float32)
assert len(ref_pos) > 0, "phantom produced no seeds — test is vacuous"
np.testing.assert_array_equal(pos, ref_pos)
ref_dirs = decode_directions_device(
    np.asarray(orig_fetch(vx)), np.asarray(orig_fetch(vy)),
    np.asarray(orig_fetch(vz)), ref_pos,
)
np.testing.assert_allclose(dirs, ref_dirs, atol=1e-6)
print(
    f"proc {pid}: per-shard seeds OK ({len(pos)} seeds, no full-volume "
    "gather)", flush=True,
)
