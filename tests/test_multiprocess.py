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


def test_two_process_sharded_frangi():
    port = _free_port()
    env = _clean_env()
    procs = [
        subprocess.Popen(
            [sys.executable, CHILD, str(pid), str(port)],
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
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-4000:]}"
        assert "bitwise across the process boundary" in out
