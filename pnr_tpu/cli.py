"""Advantra-compatible command-line interface.

Parity target: `Advantra::dofunc` (pnr-vaa3d/Advantra_plugin.cpp:274-337).
Same 11 positional parameters after -p, same validation, same output
naming (<image>_Advantra.swc) with the parameter-provenance header.

    python -m pnr_tpu.cli -i image.tif -p 2,4,6 0 5 0.3 3 2 200 20 2 4 1
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from pnr_tpu.config import PNRConfig
from pnr_tpu.io.swc import save_nodelist
from pnr_tpu.io.volume import load_volume, save_volume
from pnr_tpu.utils.exporters import metrics_entry as _metrics_entry


def print_help_params() -> None:
    print(
        """*** PNR-TPU (Advantra) usage ***
python -m pnr_tpu.cli -i <inimg_file> -p <neuritesigmas somaradius tolerance znccth kappa step ni np zdist nodepervol vol>
inimg_file     The input image (.tif / .v3draw / .npy).
neuritesigmas  Comma-delimited Gaussian cross-section sigmas.
somaradius     Minimum soma radius (0 to skip soma detection).
tolerance      Local maxima tolerance (typically 10).
znccth         Correlation threshold (0.5).
kappa          Von Mises concentration (2).
step           Prediction step (3).
ni             Number of trace iterations (100).
np             Number of trace particles (20).
zdist          Z-axis layer distance (2).
nodepervol     Nodes per volume limit (3+).
vol            Suppression volume: 1, 5, 9, 11, 19, 27.
Output SWC is named automatically from the input image file name."""
    )


def _host_path_eligible(args, cfg: PNRConfig, vol) -> bool:
    """Route a one-shot invocation to the host engine?

    Auto: single stack, no checkpoint/midres, volume under
    PNR_TPU_HOST_MAX_MVOX (default 8) and the native runtime built.
    PNR_TPU_HOST_PATH=1 forces, =0 disables."""
    import os

    forced = os.environ.get("PNR_TPU_HOST_PATH")
    if forced == "0":
        return False
    if args.checkpoint or args.resume or cfg.save_midres:
        return False
    if forced == "1":
        return True
    max_mvox = float(os.environ.get("PNR_TPU_HOST_MAX_MVOX", "8"))
    if vol.size > max_mvox * 1e6:
        return False
    from pnr_tpu import native

    return native.have_native()


def _write_metrics(path: str, cfg: PNRConfig, entries: list) -> None:
    import json

    with open(path, "w") as f:
        json.dump(
            {"params": cfg.provenance_comment(), "stacks": entries}, f, indent=1
        )
        f.write("\n")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="pnr_tpu", add_help=False)
    ap.add_argument(
        "-i", dest="images", nargs="+", default=None,
        help="input image(s); several stream through the prefetch-"
        "pipelined batch driver with one _Advantra.swc per input",
    )
    ap.add_argument("-p", dest="params", nargs="*", default=None)
    ap.add_argument(
        "-o", dest="output", default=None,
        help="output SWC file path (default: <image>_Advantra.swc). "
        "With --watch, -o names an output DIRECTORY for the per-stack "
        "SWCs instead",
    )
    ap.add_argument("--save-midres", action="store_true")
    ap.add_argument(
        "--find-maxima",
        action="store_true",
        help="debug mode: dump raw-image local maxima as SWC and exit "
        "(the reference's findMaxima path, Advantra_plugin.cpp:2308-2327)",
    )
    ap.add_argument(
        "--metrics",
        default=None,
        help="write per-stack stage timings and counts as JSON — the "
        "machine-readable counterpart of the reference's clock() stage "
        "prints (Advantra_plugin.cpp:2430-2446, 2548-2575). With "
        "--watch, appends one JSON line per reconstructed stack instead",
    )
    ap.add_argument("--checkpoint", default=None, help="checkpoint .npz path")
    ap.add_argument("--resume", action="store_true", help="resume from --checkpoint")
    ap.add_argument(
        "--zncc-mode",
        choices=("exact", "tube"),
        default="exact",
        help="likelihood engine: 'exact' (reference parity) or 'tube' (fast map-based approximation)",
    )
    ap.add_argument(
        "--mesh",
        type=int,
        default=0,
        help="run the multi-device pipeline over an N-device Z mesh "
        "(0 = single device). Requires N jax devices (for CPU testing: "
        "JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=N)",
    )
    ap.add_argument(
        "--watch",
        action="store_true",
        help="serve mode: -i names a DIRECTORY; reconstruct stacks as "
        "they arrive (stops when <dir>/.stop appears). Compiled "
        "programs persist across stacks — the resident-process "
        "deployment the per-invocation plugin can't do",
    )
    ap.add_argument(
        "--plan",
        action="store_true",
        help="print the per-shard HBM plan for reconstructing -i on a "
        "--mesh N device mesh (or the smallest mesh that fits, when "
        "--mesh is 0) and exit — header-only, no voxels are read",
    )
    ap.add_argument(
        "--interactive",
        action="store_true",
        help="prompt for the 11 parameters with the reference defaults "
        "(the menu-mode CommonDialog flow, Advantra_plugin.cpp:184-272)",
    )
    ap.add_argument("--quiet", action="store_true")
    ap.add_argument("-h", "--help", action="store_true")
    args = ap.parse_args(argv)

    if args.help or not args.images:
        print_help_params()
        return 0 if args.help else 1
    args.image = args.images[0]
    if len(args.images) > 1:
        for bad, why in (
            (args.find_maxima, "--find-maxima"),
            (args.checkpoint, "--checkpoint"),
            (args.mesh, "--mesh"),
            (args.output, "-o"),
            (args.save_midres, "--save-midres"),
        ):
            if bad:
                sys.stderr.write(f"{why} takes a single input image\n")
                return 1
    if args.find_maxima and args.metrics:
        # validate BEFORE any volume I/O, like every other flag check
        sys.stderr.write("--metrics is not supported with --find-maxima\n")
        return 1

    if args.interactive:
        from pnr_tpu.ui import prompt_parameters

        try:
            cfg = prompt_parameters()
        except ValueError as e:
            sys.stderr.write(f"{e}\n")
            return 1
        if cfg is None:
            return 1  # cancelled
    else:
        if args.params is None or len(args.params) != 11:
            sys.stderr.write("\nNeeds 11 input parameters.\n\n")
            print_help_params()
            return 1

        try:
            cfg = PNRConfig.from_cli_params(args.params)
        except ValueError as e:
            sys.stderr.write(f"{e}\n")
            return 1
    import dataclasses

    if args.save_midres:
        cfg = dataclasses.replace(cfg, save_midres=True)
    if args.zncc_mode != "exact":
        cfg = dataclasses.replace(cfg, zncc_mode=args.zncc_mode)

    if args.plan:
        from pnr_tpu.io.volume import probe_volume_shape
        from pnr_tpu.parallel.plan import min_devices, plan_sharded

        try:
            shape = probe_volume_shape(args.image)
            if args.mesh and args.mesh > 0:
                plan = plan_sharded(shape, cfg, args.mesh)
            else:
                plan = min_devices(shape, cfg)
        except (OSError, ValueError) as e:
            sys.stderr.write(f"{e}\n")
            return 1
        print(plan.summary())
        return 0 if plan.fits else 1

    verbose = not args.quiet
    if verbose:
        print("-------------  PNR-TPU (Advantra)  -------------")
        for k in (
            "sigmas", "somaradius", "tolerance", "znccth", "kappa", "step",
            "ni", "np", "zdist", "nodepervol", "vol",
        ):
            print(f"{k} = {getattr(cfg, k)}")
        print("-------------------------------------------------")

    if args.watch:
        import os

        from pnr_tpu.pipeline.serve import watch_and_reconstruct

        if len(args.images) != 1 or not os.path.isdir(args.image):
            sys.stderr.write("--watch takes a single directory after -i\n")
            return 1
        for bad, why in (
            (args.find_maxima, "--find-maxima"),
            (args.checkpoint, "--checkpoint"),
            (args.save_midres, "--save-midres"),
        ):
            if bad:
                sys.stderr.write(f"{why} is not supported with --watch\n")
                return 1
        if args.output and args.output.lower().endswith(".swc"):
            # in serve mode -o is a DIRECTORY; a .swc path is a stale
            # single-run habit — refuse rather than mkdir("x.swc")
            sys.stderr.write(
                "--watch writes one SWC per arriving stack: -o must name "
                "an output directory, not a .swc file\n"
            )
            return 1
        mesh = None
        if args.mesh and args.mesh > 1:
            # sharded serving: arrivals batch through the DP x spatial
            # driver (whole mesh for a lone stack, per-stack submeshes
            # for a burst)
            from pnr_tpu.parallel import make_mesh

            mesh = make_mesh(args.mesh)
        n = watch_and_reconstruct(
            args.image, cfg, out_dir=args.output, verbose=verbose, mesh=mesh,
            metrics_path=args.metrics,
        )
        if verbose:
            print(f"serve: done, {n} stacks")
        return 0

    if len(args.images) > 1:
        # stream every stack through the serving pipeline (shared
        # compiles + prefetched front halves), one SWC per input
        from pnr_tpu.pipeline.reconstruct import reconstruction_batch

        vols = (load_volume(p) for p in args.images)
        entries = []
        for path, result in zip(
            args.images, reconstruction_batch(vols, cfg, verbose=verbose)
        ):
            out = path + "_Advantra.swc"
            save_nodelist(
                result.tree, out, ntype=-1, sig2r=1.0, name="Advantra",
                comment=cfg.provenance_comment(),
            )
            if args.metrics:
                entries.append(_metrics_entry(path, result))
            if verbose:
                print(f"wrote {out} ({len(result.tree) - 1} nodes)")
        if args.metrics:
            _write_metrics(args.metrics, cfg, entries)
        return 0

    vol = load_volume(args.image)

    if args.find_maxima:
        import numpy as np

        from pnr_tpu.seeds.extract import max_points_host
        from pnr_tpu.utils.exporters import export_points_swc

        mask = max_points_host(vol, cfg.tolerance)
        zz, yy, xx = np.nonzero(mask)
        out = args.output or f"{args.image}_findMaxima_{cfg.tolerance:g}.swc"
        export_points_swc(out, np.stack([xx, yy, zz], axis=-1), ntype=13, radius=0.1)
        print(f"{len(xx)} local maxima -> {out}")
        return 0

    if args.mesh and args.mesh > 1:
        from pnr_tpu.parallel import make_mesh
        from pnr_tpu.pipeline import reconstruction_func_sharded

        mesh = make_mesh(args.mesh)
        result = reconstruction_func_sharded(
            vol, cfg, mesh, verbose=verbose,
            checkpoint_path=args.checkpoint, resume=args.resume,
        )
    elif _host_path_eligible(args, cfg, vol):
        # One-shot small-volume fast path: the full pipeline in
        # NumPy/SciPy + the native C++ runtime, no jax import, no
        # device init, no compiles (pnr_tpu.hostpath). On a 1.18-Mvox
        # stack this beats the compiled single-thread reference
        # end-to-end; the device path pays double-digit seconds of
        # process-level setup before its first voxel. Opt out with
        # PNR_TPU_HOST_PATH=0 (or --checkpoint/--save-midres/--mesh,
        # which the one-shot engine doesn't carry).
        from pnr_tpu.hostpath import host_reconstruction_func

        if verbose:
            print("host one-shot engine (PNR_TPU_HOST_PATH=0 for the device path)")
        result = host_reconstruction_func(vol, cfg, verbose=verbose)
    else:
        from pnr_tpu.pipeline import reconstruction_func

        result = reconstruction_func(
            vol, cfg, verbose=verbose,
            checkpoint_path=args.checkpoint, resume=args.resume,
        )

    out = args.output or (args.image + "_Advantra.swc")
    save_nodelist(
        result.tree, out, ntype=-1, sig2r=1.0, name="Advantra",
        comment=cfg.provenance_comment(),
    )
    if args.metrics:
        _write_metrics(args.metrics, cfg, [_metrics_entry(args.image, result)])
    if verbose:
        print(f"wrote {out} ({len(result.tree) - 1} nodes)")

    if cfg.save_midres and result.j8 is not None:
        from pnr_tpu.utils.exporters import (
            export_directionality_swc,
            export_seeds_swc,
            save_vector,
        )

        save_volume(args.image + "_J8.tif", result.j8)
        export_seeds_swc(
            args.image + "_Seeds.swc", result.seeds_pos, corr=result.seeds_corr
        )
        mid = result.midres or {}
        if "vx" in mid:
            export_directionality_swc(
                args.image + "_VxVyVz.swc", result.j8,
                mid["vx"], mid["vy"], mid["vz"],
            )
        if "trace_density" in mid:
            save_volume(args.image + "_TraceDensity.tif", mid["trace_density"])
        if "smap8" in mid:
            save_volume(args.image + "_Smap.v3dpbd", mid["smap8"])
        # per-stage reconstruct dumps, artifact-for-artifact with the
        # reference's saveMidres list (Advantra_plugin.cpp:2098-2141);
        # the empty trailing suffix matches reconstruct(n0, prefix, "")
        for name in ("n0", "n0tree", "n0res", "n1", "n2", "n2tree"):
            if name in mid:
                save_nodelist(mid[name], f"{args.image}_{name}_.swc")
        for name in ("n0len", "n0corr", "n1len"):
            if name in mid:
                save_vector(mid[name], f"{args.image}_{name}_.log")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
