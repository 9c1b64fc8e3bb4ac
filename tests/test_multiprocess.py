"""Multi-host (multi-process) certification of the parallel layer.

SURVEY.md §2b's comms row: the scale-out design is `jax.distributed` +
XLA collectives (ICI within a slice, DCN across). Single-process tests
can't certify the cross-HOST leg, so this spawns a real 2-process JAX
cluster (gloo CPU backend, 4 virtual devices per process = 8 global)
and runs the halo-exchange sharded Frangi over a mesh spanning both
processes — the `ppermute` halo ring and the pmin/pmax normalization
reductions cross the process boundary exactly as they would cross
hosts on a TPU pod.
"""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHILD = os.path.join(REPO, "tests", "_mp_frangi_child.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _clean_env() -> dict:
    """Child env: pure-CPU jax, no hardware-plugin site bootstrap."""
    env = {
        k: v
        for k, v in os.environ.items()
        if not k.startswith(("PALLAS_AXON", "AXON_", "TPU_"))
    }
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    pyp = [
        p
        for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and ".axon_site" not in p
    ]
    env["PYTHONPATH"] = os.pathsep.join([REPO] + pyp)
    return env


def _run_cluster(child: str, extra_args=(), timeout=540):
    port = _free_port()
    env = _clean_env()
    procs = [
        subprocess.Popen(
            [sys.executable, child, str(pid), str(port), *extra_args],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            cwd=REPO,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-4000:]}"
    return outs


def test_two_process_sharded_frangi():
    outs = _run_cluster(CHILD)
    for out in outs:
        assert "bitwise across the process boundary" in out


def test_two_process_per_shard_seeds():
    """Per-shard seed extraction (VERDICT r3 item 2): each process
    floods only its local slabs, fetch_replicated is instrumented to
    fail on any volume-sized gather, and the all-gathered seed set is
    identical to the single-device host flood."""
    outs = _run_cluster(os.path.join(REPO, "tests", "_mp_seeds_child.py"))
    for out in outs:
        assert "per-shard seeds OK" in out


def test_two_process_full_pipeline(tmp_path):
    """The FULL sharded reconstruction over a 2-process 8-device mesh
    equals a single-process 8-device run: identical J8 (bitwise), node
    types, trace/tree counts, and node coordinates to f32-ulp tolerance.
    Certifies the redundant-host-driver design (every process runs the
    same deterministic commit logic; fetch_replicated all-gathers the
    sharded stage outputs)."""
    import numpy as np

    out_npz = str(tmp_path / "mp_pipeline.npz")
    child = os.path.join(REPO, "tests", "_mp_pipeline_child.py")
    outs = _run_cluster(child, extra_args=(out_npz,), timeout=540)
    for out in outs:
        assert "full sharded pipeline OK" in out

    # single-process reference on the same-size (8-device) mesh
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from _mp_common import MP_CFG, MP_CFG_2D, mp_phantom, mp_phantom_2d
    from pnr_tpu.parallel import make_mesh
    from pnr_tpu.pipeline.sharded_reconstruct import (
        reconstruction_func_sharded,
    )

    ref = reconstruction_func_sharded(
        mp_phantom(), MP_CFG, make_mesh(8), verbose=False
    )
    got = np.load(out_npz)
    assert int(got["trace_count"]) == ref.trace_count
    assert int(got["tree_n"]) == len(ref.tree)
    np.testing.assert_array_equal(got["ntype"], np.asarray(ref.n0.type))
    for k, v in (("x", ref.n0.x), ("y", ref.n0.y), ("z", ref.n0.z),
                 ("sig", ref.n0.sig)):
        # ulp-level tolerance: XLA compiles slightly different
        # executables around cross-process collectives (fma grouping),
        # observed max |diff| ~4e-6 on one coordinate in 37 — the same
        # tolerance class the batch-DP equality tests use
        np.testing.assert_allclose(got[k], np.asarray(v), atol=1e-4)
    np.testing.assert_array_equal(got["j8"], ref.j8)

    # 2-D leg (Y-sharded single-slice image)
    ref2 = reconstruction_func_sharded(
        mp_phantom_2d(), MP_CFG_2D, make_mesh(8), verbose=False
    )
    assert int(got["tree_n_2d"]) == len(ref2.tree)
    np.testing.assert_allclose(got["x_2d"], np.asarray(ref2.n0.x), atol=1e-4)
    np.testing.assert_allclose(got["y_2d"], np.asarray(ref2.n0.y), atol=1e-4)
    np.testing.assert_array_equal(got["j8_2d"], ref2.j8)
