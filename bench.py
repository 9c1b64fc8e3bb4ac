"""Benchmark: multi-scale Frangi vesselness throughput on real hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: Frangi Mvoxels/s (BASELINE.md filter-bench config: sigmas
2,4,6, zdist 2) — the end-to-end filter step (Gaussian derivatives,
per-voxel 3x3 eigensolve, vesselness, max-over-scales, direction
quantization, J8 normalization) over a uint8 volume.

vs_baseline: ratio against the ACTUAL reference C++ (frangi.cpp:152-289
compiled -O2 via pnr_tpu.parity.oracle, single-thread like the plugin),
measured in-process on a smaller volume. Falls back to a single-core
NumPy/SciPy oracle when the reference tree is unavailable; extras
record which baseline was used and its Mvox/s.
"""

from __future__ import annotations

import json
import time

import numpy as np


SIGMAS = (2.0, 4.0, 6.0)
ZDIST = 2.0
SHAPE = (128, 448, 448)  # ~25.7 Mvoxels
BASE_SHAPE = (24, 96, 96)  # oracle volume (~0.22 Mvoxels)


def make_volume(shape):
    rng = np.random.default_rng(0)
    z, y, x = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    d2 = (y - shape[1] / 2) ** 2 + ((z - shape[0] / 2) * ZDIST) ** 2
    vol = 200.0 * np.exp(-d2 / (2 * 9.0)) * (0.7 + 0.3 * np.sin(x / 4.0))
    return np.clip(vol + rng.normal(0, 5, shape), 0, 255).astype(np.uint8)


def bench_tpu(vol, engine="xla"):
    import jax
    import jax.numpy as jnp

    from pnr_tpu.ops import frangi3d, normalize_to_u8
    from pnr_tpu.ops.frangi_fused import frangi3d_fused
    from pnr_tpu.utils.runtime import warmup_device_transfers

    warmup_device_transfers()
    frangi = frangi3d_fused if engine == "fused" else frangi3d

    @jax.jit
    def step(v):
        j, jmin, jmax, vx, vy, vz = frangi(v, SIGMAS, ZDIST)
        return normalize_to_u8(j, jmin, jmax), vx, vy, vz

    #: chained filter steps per launch: a production run streams many
    #: stacks, so the sustained (per-step) rate is the metric; each
    #: step's J8 output feeds the next step's input (a real data
    #: dependence — nothing can be elided or overlapped away)
    chain = 4

    @jax.jit
    def chained(v):
        def body(i, u8):
            j8, vx, vy, vz = step(u8)
            return j8
        return jax.lax.fori_loop(0, chain, body, v)

    def force(o):
        # jax.block_until_ready is NOT a completion barrier on remote TPU
        # runtimes (execution is lazy until a fetch); a scalar fetch is.
        return float(o[5, 5, 5])

    dvol = jnp.asarray(vol)
    force(chained(dvol))  # compile + first run

    reps = 2
    t0 = time.perf_counter()
    for _ in range(reps):
        force(chained(dvol))
    dt = (time.perf_counter() - t0) / reps / chain
    # single-launch rate (includes per-call dispatch+fetch overhead)
    force(step(dvol)[0])
    t0 = time.perf_counter()
    force(step(dvol)[0])
    dt_single = time.perf_counter() - t0
    return vol.size / dt / 1e6, vol.size / dt_single / 1e6  # Mvox/s


def bench_numpy_oracle(vol):
    """Single-core SciPy/NumPy implementation of the same filter."""
    import scipy.ndimage as ndi

    from pnr_tpu.ops.gaussian import gaussian_kernel

    t0 = time.perf_counter()
    j = None
    for sig in SIGMAS:
        kxy = gaussian_kernel(sig).astype(np.float64)
        kz = gaussian_kernel(sig / ZDIST).astype(np.float64)
        f = vol.astype(np.float64)
        f = ndi.correlate1d(f, kxy, axis=2, mode="nearest")
        f = ndi.correlate1d(f, kxy, axis=1, mode="nearest")
        f = ndi.correlate1d(f, kz, axis=0, mode="nearest")
        s2 = sig * sig
        dz = np.gradient(f, axis=0)
        dy = np.gradient(f, axis=1)
        dx = np.gradient(f, axis=2)
        h = np.empty(vol.shape + (3, 3))
        h[..., 0, 0] = np.gradient(dx, axis=2) * s2
        h[..., 1, 1] = np.gradient(dy, axis=1) * s2
        h[..., 2, 2] = np.gradient(dz, axis=0) * s2
        h[..., 0, 1] = h[..., 1, 0] = np.gradient(dx, axis=1) * s2
        h[..., 0, 2] = h[..., 2, 0] = np.gradient(dx, axis=0) * s2
        h[..., 1, 2] = h[..., 2, 1] = np.gradient(dy, axis=0) * s2
        w = np.linalg.eigvalsh(h.reshape(-1, 3, 3))
        order = np.argsort(np.abs(w), axis=1)
        w = np.take_along_axis(w, order, axis=1)
        l1, l2, l3 = w[:, 0], w[:, 1], w[:, 2]
        with np.errstate(all="ignore"):
            ra = np.abs(l2) / np.abs(l3)
            rb = np.abs(l1) / np.sqrt(np.abs(l2 * l3))
            s = np.sqrt(l1**2 + l2**2 + l3**2)
            v = (1 - np.exp(-(ra**2) / 0.5)) * np.exp(-(rb**2) / 0.5) * (
                1 - np.exp(-(s**2) / (2 * 500.0**2))
            )
        v = np.where((l2 > 0) | (l3 > 0), 0.0, v)
        v = np.nan_to_num(v).reshape(vol.shape)
        j = v if j is None else np.maximum(j, v)
    jmin, jmax = j.min(), j.max()
    _ = np.round((j - jmin) / max(jmax - jmin, 1e-30) * 255).astype(np.uint8)
    dt = time.perf_counter() - t0
    return vol.size / dt / 1e6


def bench_cpp_reference(vol):
    """Single-thread compiled reference C++ Frangi (the true baseline)."""
    import os

    from pnr_tpu.parity import get_oracle

    o = get_oracle()
    if o is None:
        return None
    devnull = os.open(os.devnull, os.O_WRONLY)
    old = os.dup(1)
    os.dup2(devnull, 1)  # the reference prints per-scale progress
    try:
        t0 = time.perf_counter()
        o.frangi3d(vol, SIGMAS, ZDIST)
        dt = time.perf_counter() - t0
    finally:
        os.dup2(old, 1)
        os.close(devnull)
        os.close(old)
    return vol.size / dt / 1e6


def bench_tracer(vol, zncc_mode="tube", sigmas=None, ni=None):
    """Particle-updates/s of the lockstep SMC tracer.

    Measured on the monolithic device path (one init launch + one
    full-ni stage launch at the whole wave size) — the device-throughput
    metric; `trace_wave` adds host-side chunking/commit machinery.
    zncc_mode="exact" runs the full-sample-count znccBBB parity engine
    (ops/zncc_exact.py); "tube" the precomputed-map approximation."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pnr_tpu.config import PNRConfig
    from pnr_tpu.smc.tracker import BatchedTracker

    # exact mode: a ~100-iteration scan wrapping the Pallas engine
    # overwhelms the TPU compiler; 25 iterations measure the same
    # per-update rate (throughput is iteration-flat)
    if ni is None:
        ni = 100 if zncc_mode == "tube" else 25
    cfg = PNRConfig(
        sigmas=sigmas or SIGMAS, znccth=0.3, kappa=3.0, step=2, ni=ni, np=20,
        zdist=ZDIST, nodepervol=4, vol=9, zncc_mode=zncc_mode,
    )
    tracker = BatchedTracker(cfg, is2d=False)

    img = jnp.asarray(vol)
    field = tracker.prepare_field(img)
    t_traces = 1024
    cy, cz = vol.shape[1] / 2.0, vol.shape[0] / 2.0
    sp = jnp.asarray(
        np.stack(
            [
                np.linspace(10, vol.shape[2] - 10, t_traces),
                np.full(t_traces, cy),
                np.full(t_traces, cz),
            ],
            axis=-1,
        ).astype(np.float32)
    )
    sd = jnp.asarray(np.tile(np.array([[1.0, 0, 0]], np.float32), (t_traces, 1)))
    keys = jax.vmap(lambda i: jax.random.fold_in(jax.random.key(0), i))(
        jnp.arange(t_traces, dtype=jnp.uint32)
    )
    iters = jnp.arange(1, cfg.ni)
    kill = jnp.zeros(t_traces, jnp.bool_)

    def run():
        carry, est0 = tracker._trace_init(field, sp, sd, keys)
        _, packed = tracker._trace_stage(field, keys, carry, iters, kill)
        return float(jnp.ravel(packed)[0])  # fetch barrier

    run()  # compile
    t0 = time.perf_counter()
    run()
    dt = time.perf_counter() - t0
    updates = t_traces * cfg.np * cfg.ni
    return updates / dt


def bench_e2e(shape=(128, 640, 640), zncc_mode="tube"):
    """Per-stack end-to-end wall-clock (BASELINE.md config 1): full
    advantra_func-equivalent reconstruction of one synthetic stack —
    filter, seeds, scoring, staged tracing, graph, SWC-ready tree."""
    from pnr_tpu.config import PNRConfig
    from pnr_tpu.pipeline import reconstruction_func

    vol = make_volume(shape)
    cfg = PNRConfig(
        sigmas=SIGMAS, tolerance=10.0, znccth=0.5, kappa=3.0, step=2,
        ni=100, np=20, zdist=ZDIST, nodepervol=4, vol=9,
        zncc_mode=zncc_mode,
    )
    # stream FOUR stacks through reconstruction_batch (shared tracker,
    # shared compiles, prefetch-pipelined fronts — the production
    # serving path): the first pays the shape's compiles, the mean of
    # the last two is the warm steady-state per-stack metric
    from pnr_tpu.pipeline.reconstruct import reconstruction_batch

    times = []
    res = None
    gen = reconstruction_batch([vol, vol, vol, vol], cfg)
    for _ in range(4):
        t0 = time.perf_counter()
        res = next(gen)
        times.append(time.perf_counter() - t0)
    return sum(times[2:]) / 2, vol.size / 1e6, len(res.n0), times[0]


def bench_e2e_sharded(shape=(128, 640, 640)):
    """Warm per-stack wall-clock of reconstruction_func_sharded on a
    1-device mesh at production scale (the multi-device pipeline's
    single-chip overhead; see PARITY.md round-3 sharded-scale notes)."""
    from pnr_tpu.config import PNRConfig
    from pnr_tpu.parallel import make_mesh
    from pnr_tpu.pipeline import reconstruction_func_sharded

    vol = make_volume(shape)
    cfg = PNRConfig(
        sigmas=SIGMAS, tolerance=10.0, znccth=0.5, kappa=3.0, step=2,
        ni=100, np=20, zdist=ZDIST, nodepervol=4, vol=9, zncc_mode="tube",
    )
    mesh = make_mesh(1)
    reconstruction_func_sharded(vol, cfg, mesh, verbose=False)  # compile
    t0 = time.perf_counter()
    res = reconstruction_func_sharded(vol, cfg, mesh, verbose=False)
    dt = time.perf_counter() - t0
    assert len(res.tree) > 10
    return dt


def bench_cpp_e2e(shape=(32, 192, 192)):
    """Reference C++ end-to-end compute core on one stack: frangi3d ->
    J8 -> extractSeeds -> znccBBB filter/sort -> full seed loop
    (trackPos/trackNeg with density maps), single-thread, via the
    compiled oracle driver (parity/oracle.py reference_reconstruct_n0).
    Graph post-processing excluded on the reference side (it lives in
    the uncompilable Qt plugin layer); the rebuild's e2e number
    INCLUDES its graph stage, so the comparison favours the baseline."""
    from pnr_tpu.config import PNRConfig
    from pnr_tpu.parity import get_oracle
    from pnr_tpu.parity.oracle import reference_reconstruct_n0

    if get_oracle() is None:
        return None
    vol = make_volume(shape)
    cfg = PNRConfig(
        sigmas=SIGMAS, tolerance=10.0, znccth=0.5, kappa=3.0, step=2,
        ni=100, np=20, zdist=ZDIST, nodepervol=4, vol=9,
    )
    t0 = time.perf_counter()
    _n0, n_seeds, n_nodes = reference_reconstruct_n0(vol, cfg)
    dt = time.perf_counter() - t0
    return dt, vol.size / 1e6, n_nodes


def bench_reference_swc_f1():
    """Distributional SWC agreement with the compiled reference's full
    seed loop on the branching phantom (tests/test_reference_e2e.py)."""
    import sys
    import tempfile

    sys.path.insert(0, ".")
    from pnr_tpu.parity import get_oracle

    if get_oracle() is None:
        return None
    from tests.test_reference_e2e import CFG, _swc_rows, phantom
    from pnr_tpu.parity.oracle import reference_reconstruct_n0
    from pnr_tpu.pipeline.reconstruct import reconstruction_func, reconstruct_graph
    from pnr_tpu.utils.swc_compare import compare_swc
    import os

    vol = phantom()
    ref_n0, _, _ = reference_reconstruct_n0(vol, CFG)
    td = tempfile.mkdtemp()
    ref_rows = _swc_rows(reconstruct_graph(ref_n0.copy(), CFG), os.path.join(td, "r.swc"))
    res = reconstruction_func(vol, CFG, verbose=False)
    our_rows = _swc_rows(res.tree, os.path.join(td, "o.swc"))
    s = compare_swc(our_rows, ref_rows, dist=4.0, resample=1.0)
    return round(s.f1, 3)


def bench_quality():
    """Phantom-battery reconstruction F1 vs ground truth (branching
    neuron + crossing tubes)."""
    import sys

    sys.path.insert(0, ".")
    try:
        from tests.test_phantom_neuron import (
            CFG, branching_neuron_phantom, crossing_tubes_phantom,
        )
    except ImportError:
        return None
    import tempfile

    from pnr_tpu.io.swc import read_swc, save_nodelist
    from pnr_tpu.pipeline import reconstruction_func
    from pnr_tpu.utils.swc_compare import compare_swc

    out = {}
    for name, maker in (
        ("", branching_neuron_phantom), ("crossing_", crossing_tubes_phantom)
    ):
        vol, gold = maker()
        res = reconstruction_func(vol, CFG, verbose=False)
        p = tempfile.mktemp(suffix=".swc")
        save_nodelist(res.tree, p)
        # density-invariant scoring (resample both sides to 1.0
        # arclength; raw one-to-one matching understates recall by the
        # node-count ratio)
        s = compare_swc(read_swc(p), gold, dist=4.0, resample=1.0)
        out[name + "f1"] = round(s.f1, 3)
        out[name + "precision"] = round(s.precision, 3)
        out[name + "recall"] = round(s.recall, 3)
    return out


def main():
    # pay the one-time device-transfer init (45-370 s on this runtime)
    # BEFORE the extras budget starts: it is a fixed cost unrelated to
    # how many metrics we can afford to measure
    from pnr_tpu.utils.runtime import warmup_device_transfers

    warmup_device_transfers()
    t_start = time.perf_counter()
    vol = make_volume(SHAPE)
    xla_mvox, xla_single = bench_tpu(vol, engine="xla")
    extras = {"frangi_xla_mvox_s": round(xla_mvox, 2)}
    tpu_mvox, tpu_mvox_single = xla_mvox, xla_single
    extras["frangi_engine"] = "xla"
    try:
        fused_mvox, fused_single = bench_tpu(vol, engine="fused")
        extras["frangi_fused_mvox_s"] = round(fused_mvox, 2)
        if fused_mvox > tpu_mvox:
            tpu_mvox, tpu_mvox_single = fused_mvox, fused_single
            extras["frangi_engine"] = "fused_pallas"
    except Exception as e:
        extras["frangi_fused_error"] = str(e)[:120]
    extras["single_launch_mvox_s"] = round(tpu_mvox_single, 2)
    base_vol = make_volume(BASE_SHAPE)
    base_mvox = None
    try:
        base_mvox = bench_cpp_reference(base_vol)
    except Exception as e:
        extras["cpp_baseline_error"] = str(e)[:120]
    if base_mvox is not None:
        extras["baseline"] = "reference_cpp_single_thread"
    else:
        base_mvox = bench_numpy_oracle(base_vol)
        extras["baseline"] = "numpy_oracle"
    extras["baseline_mvox_s"] = round(base_mvox, 3)

    # Extras run only while there is budget left: the one-time D2H init of
    # this runtime varies 45-370 s, and the headline metric must always land.
    def budget_left():
        return time.perf_counter() - t_start < 450.0

    # Extras ordered by (verdict importance / cost), cheapest-critical
    # first: the remote tunnel's D2H bandwidth varies >5x across hours,
    # so the transfer-heavy e2e runs go LAST — a slow link must not
    # starve the parity metrics out of the budget.
    if budget_left():
        try:
            ref = bench_cpp_e2e()
            if ref:
                extras["ref_cpp_e2e_s"] = round(ref[0], 2)
                extras["ref_cpp_e2e_mvox"] = round(ref[1], 2)
        except Exception as e:
            extras["ref_cpp_e2e_error"] = str(e)[:120]
    tracer_vol = make_volume((64, 256, 256))
    if budget_left():
        try:
            extras["particle_updates_per_s"] = round(bench_tracer(tracer_vol))
        except Exception as e:  # never fail the headline metric
            extras["particle_updates_per_s_error"] = str(e)[:120]
    if budget_left():
        try:
            extras["exact_particle_updates_per_s"] = round(
                bench_tracer(tracer_vol, zncc_mode="exact")
            )
        except Exception as e:
            extras["exact_particle_updates_per_s_error"] = str(e)[:120]
    if budget_left():
        # the default-sigma config (PNRConfig defaults: 2,3) is where the
        # parity engine runs daily; the (2,4,6) bench sigmas carry a 3.6x
        # larger template sample count. Matched ni for a fair ratio.
        try:
            extras["exact_updates_per_s_default_sigmas"] = round(
                bench_tracer(tracer_vol, zncc_mode="exact", sigmas=(2.0, 3.0))
            )
            extras["tube_updates_per_s_default_sigmas"] = round(
                bench_tracer(
                    tracer_vol, zncc_mode="tube", sigmas=(2.0, 3.0), ni=25
                )
            )
        except Exception as e:
            extras["default_sigma_tracer_error"] = str(e)[:120]
    if budget_left():
        try:
            f1 = bench_reference_swc_f1()
            if f1 is not None:
                extras["reference_swc_f1"] = f1
        except Exception as e:
            extras["reference_swc_f1_error"] = str(e)[:120]
    if budget_left():
        try:
            q = bench_quality()
            if q:
                extras["phantom_swc"] = q
        except Exception as e:
            extras["phantom_swc_error"] = str(e)[:120]
    if budget_left():
        try:
            dt, mvox, n0, dt_cold = bench_e2e()
            extras["e2e_s_per_stack"] = round(dt, 2)
            extras["e2e_s_first_stack"] = round(dt_cold, 2)
            extras["e2e_stack_mvox"] = round(mvox, 1)
        except Exception as e:
            extras["e2e_error"] = str(e)[:120]
    if budget_left():
        try:
            dt, _, _, _ = bench_e2e(zncc_mode="exact")
            extras["e2e_s_per_stack_exact"] = round(dt, 2)
        except Exception as e:
            extras["e2e_exact_error"] = str(e)[:120]
    if budget_left():
        # the multi-device pipeline on a 1-device mesh at the same
        # production scale: certifies the sharded path end-to-end on
        # real hardware and records its single-chip overhead vs the
        # serving driver (the mesh axis itself needs real multi-chip)
        try:
            extras["e2e_sharded_s_per_stack"] = round(bench_e2e_sharded(), 2)
        except Exception as e:
            extras["e2e_sharded_error"] = str(e)[:120]
    print(
        json.dumps(
            {
                "metric": "frangi_throughput",
                "value": round(tpu_mvox, 2),
                "unit": "Mvoxels/s",
                "vs_baseline": round(tpu_mvox / base_mvox, 2),
                "extras": extras,
            }
        )
    )


if __name__ == "__main__":
    main()
