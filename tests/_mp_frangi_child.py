"""One process of a 2-process jax.distributed CPU cluster (gloo).

Spawned by tests/test_multiprocess.py: joins the cluster via
`pnr_tpu.parallel.multihost`, runs the halo-exchange sharded Frangi
over a mesh spanning BOTH processes' devices, and asserts its local
shards are bitwise-equal to the single-process reference — certifying
that the `ppermute` halo ring and the global pmin/pmax reductions work
across the process (host) boundary, not just between devices of one
process. Usage: python _mp_frangi_child.py <process_id> <port>
"""

import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]
# must be set before jax imports; the parent also sanitizes the env
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax
import numpy as np

from pnr_tpu.parallel.multihost import (
    init_multihost,
    make_global_mesh,
    shard_volume_global,
)

idx = init_multihost(f"localhost:{port}", num_processes=2, process_id=pid)
assert idx == pid, (idx, pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4

import jax.numpy as jnp  # noqa: E402  (after the backend is fixed)

from pnr_tpu.ops import frangi3d, normalize_to_u8  # noqa: E402
from pnr_tpu.parallel import (  # noqa: E402
    frangi3d_sharded,
    normalize_to_u8_sharded,
)

SIGMAS = (2.0, 3.0)
ZDIST = 2.0
shape = (16, 24, 40)  # 8 shards x 2 slices; halo >> shard depth (multi-hop)
rng = np.random.default_rng(7)
z, y, x = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
d2 = (y - 12) ** 2 + ((z - 8) * ZDIST) ** 2
vol = np.clip(
    200.0 * np.exp(-d2 / (2 * 2.5**2)) * (0.7 + 0.3 * np.sin(x / 4.0))
    + rng.normal(0, 5, shape),
    0,
    255,
).astype(np.uint8)

mesh = make_global_mesh()
assert mesh.devices.size == 8
garr = shard_volume_global(vol, mesh)
# each process holds only its 4 local shards of the global array
assert sum(s.data.shape[0] for s in garr.addressable_shards) == 8


@jax.jit
def step(v):
    j, jmin, jmax, vx, vy, vz = frangi3d_sharded(v, SIGMAS, ZDIST, mesh)
    return normalize_to_u8_sharded(j, jmin, jmax), jmin, jmax, vx, vy, vz


j8, jmin, jmax, vx, vy, vz = step(garr)

# single-process reference, computed in full locally on every process
rj, rjmin, rjmax, rvx, rvy, rvz = jax.jit(
    lambda v: frangi3d(v, SIGMAS, ZDIST)
)(jnp.asarray(vol))
rj8 = np.asarray(normalize_to_u8(rj, rjmin, rjmax))

np.testing.assert_allclose(float(jmin), float(rjmin), rtol=1e-6)
np.testing.assert_allclose(float(jmax), float(rjmax), rtol=1e-6)
checked = 0
for got, want in ((j8, rj8), (vx, np.asarray(rvx)), (vz, np.asarray(rvz))):
    for s in got.addressable_shards:
        np.testing.assert_array_equal(np.asarray(s.data), want[s.index])
        checked += 1
assert checked == 12, checked
print(f"proc {pid}: sharded frangi bitwise across the process boundary "
      f"({checked} shards checked)", flush=True)
