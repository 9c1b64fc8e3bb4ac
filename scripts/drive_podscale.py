"""Reduced-scale drive of the pod-scale plan (VERDICT r3 item 4).

Runs the FULL sharded pipeline on a >=256-Mvox volume over a real
2-process jax.distributed cluster (gloo CPU backend, 4 virtual devices
per process = 8 global), fed through `io.load_volume_mmap` +
`shard_volume_global` so each host only pages in its own Z slabs —
the loading contract of the >2048^3 BASELINE config, exercised end to
end with the per-shard seed flood (no process materializes full J8).

Reports per-process peak RSS next to the planner's per-shard model so
the paging claim is checkable: the full volume is 256 MB + ~2.3 GB of
f32 stage maps if materialized on one host; a slab-paging process must
sit near HALF the all-shards resident (4 of 8 shards) plus the python
+ XLA baseline.

Usage:
  python scripts/drive_podscale.py           # orchestrate (build + run)
  python scripts/drive_podscale.py child <pid> <port> <path>  # internal
"""

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SHAPE = (256, 1024, 1024)  # 268.4 Mvox, Z = 8 shards x 32 slices


def build_phantom(path: str) -> None:
    """Sparse tube phantom written slab-by-slab (never holds the full
    volume in RAM — the builder obeys the same paging discipline)."""
    import numpy as np

    z_n, y_n, x_n = SHAPE
    out = np.lib.format.open_memmap(
        path, mode="w+", dtype=np.uint8, shape=SHAPE
    )
    rng = np.random.default_rng(0)
    yy, xx = np.meshgrid(np.arange(y_n), np.arange(x_n), indexing="ij")
    for z0 in range(0, z_n, 16):
        z1 = min(z0 + 16, z_n)
        zz = np.arange(z0, z1)[:, None, None]
        # tube along x at (y=512, z=128), modulated with end caps
        d2 = (yy[None] - 512.0) ** 2 + ((zz - 128.0) * 2.0) ** 2
        tube = 200.0 * np.exp(-d2 / (2 * 3.0**2)) * (
            0.7 + 0.3 * np.sin(xx[None] / 4.0)
        ) * (xx[None] > 10) * (xx[None] < x_n - 10)
        out[z0:z1] = np.clip(
            tube + rng.normal(0, 5, (z1 - z0, y_n, x_n)), 0, 255
        ).astype(np.uint8)
    out.flush()


def child(pid: int, port: str, path: str) -> None:
    import resource

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    import numpy as np

    from pnr_tpu.config import PNRConfig
    from pnr_tpu.io.volume import load_volume_mmap
    from pnr_tpu.parallel.multihost import init_multihost, make_global_mesh
    from pnr_tpu.parallel.plan import plan_sharded
    from pnr_tpu.pipeline.sharded_reconstruct import reconstruction_func_sharded

    init_multihost(f"localhost:{port}", num_processes=2, process_id=pid)
    assert jax.process_count() == 2 and len(jax.devices()) == 8
    mesh = make_global_mesh()

    cfg = PNRConfig(
        sigmas=(2.0, 3.0), tolerance=10.0, znccth=0.4, kappa=2.0, step=2,
        ni=16, np=8, zdist=2.0, nodepervol=4, vol=9, wave_size=16,
        zncc_mode="exact", tree_size_min=3,
    )
    vol = load_volume_mmap(path)
    plan = plan_sharded(vol.shape, cfg, 8)

    t0 = time.time()
    res = reconstruction_func_sharded(vol, cfg, mesh, verbose=(pid == 0))
    dt = time.time() - t0
    assert len(res.tree) > 10, len(res.tree)
    ys = np.asarray(res.tree.y[1:])
    zs = np.asarray(res.tree.z[1:])
    assert abs(np.median(ys) - 512) < 3 and abs(np.median(zs) - 128) < 3, (
        np.median(ys), np.median(zs),
    )
    rss_gib = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / (1 << 20)
    print(
        f"PODSCALE proc {pid}: OK {vol.size / 1e6:.0f} Mvox in {dt:.0f}s, "
        f"|tree|={len(res.tree)}, seeds={len(res.seeds_pos)}, "
        f"peak RSS {rss_gib:.2f} GiB "
        f"(planner per-shard peak {plan.peak_bytes / (1 << 30):.2f} GiB "
        f"[{plan.peak_stage}], 4 local shards)",
        flush=True,
    )


def main() -> None:
    import socket

    path = "/tmp/podscale_vol.npy"
    if not os.path.exists(path):
        print("building 268-Mvox phantom mmap...", flush=True)
        build_phantom(path)
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = {
        k: v
        for k, v in os.environ.items()
        if not k.startswith(("PALLAS_AXON", "AXON_", "TPU_"))
    }
    env["JAX_PLATFORMS"] = "cpu"
    pyp = [
        p
        for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and ".axon_site" not in p
    ]
    env["PYTHONPATH"] = os.pathsep.join([REPO] + pyp)
    procs = [
        subprocess.Popen(
            [sys.executable, __file__, "child", str(pid), str(port), path],
            env=env, cwd=REPO,
        )
        for pid in range(2)
    ]
    rcs = [p.wait() for p in procs]
    sys.exit(max(rcs))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "child":
        child(int(sys.argv[2]), sys.argv[3], sys.argv[4])
    else:
        main()
