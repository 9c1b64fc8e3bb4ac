"""Serving mode: reconstruct stacks as they arrive in a watch directory.

The reference plugin is invoked once per stack from the Vaa3D GUI/CLI
(pnr-vaa3d/Advantra_plugin.cpp:274-337) — every run repays image and
model setup. Production deployment wants a resident process: compiled
trace programs, likelihood tables and the persistent XLA cache live
once, and arriving stacks stream through the prefetch-pipelined batch
driver (`reconstruction_batch`), whose software pipeline overlaps the
next stack's upload/filter/seed front with the current stack's tracing.

File-readiness protocol: a candidate is processed once its size is
stable across two consecutive polls (writers rarely fsync microscopy
stacks atomically); processed inputs are remembered by (path, mtime,
size) so an overwritten file is picked up again. A sentinel file
(default ``.stop``) shuts the loop down after draining queued work.
"""

from __future__ import annotations

import os
import time
from typing import Optional

from pnr_tpu.config import PNRConfig
from pnr_tpu.io.volume import LOADABLE_EXTS


def _scan(watch_dir: str, seen, sizes) -> list:
    """Return paths that are new (or rewritten) and stable.

    `sizes` holds each candidate's (mtime_ns, size) awaiting the
    confirming second poll; a file must show the SAME stamp twice in a
    row to be yielded, so a delete+rewrite between polls restarts its
    stability check. Entries for files that vanished are pruned — a
    deleted candidate must not wedge the drain-before-stop check — and
    `seen` entries of vanished files are pruned with them so the
    long-running server's memory stays bounded by the directory size.
    """
    ready = []
    present = set()
    for name in sorted(os.listdir(watch_dir)):
        path = os.path.join(watch_dir, name)
        if not name.lower().endswith(LOADABLE_EXTS) or not os.path.isfile(path):
            continue
        try:
            st = os.stat(path)
        except OSError:
            continue
        present.add(path)
        key = (path, st.st_mtime_ns, st.st_size)
        if key in seen:
            continue
        stamp = (st.st_mtime_ns, st.st_size)
        if sizes.get(path) == stamp:
            seen.add(key)
            del sizes[path]
            ready.append(path)
        else:
            sizes[path] = stamp  # candidate: confirm next poll
    for stale in [p for p in sizes if p not in present]:
        del sizes[stale]
    seen &= {k for k in seen if k[0] in present}
    return ready


def watch_and_reconstruct(
    watch_dir: str,
    cfg: PNRConfig,
    out_dir: Optional[str] = None,
    poll_s: float = 1.0,
    stop_file: str = ".stop",
    verbose: bool = True,
    max_stacks: Optional[int] = None,
) -> int:
    """Serve `watch_dir`: reconstruct every arriving stack to SWC.

    Blocks until ``stop_file`` appears inside ``watch_dir`` (or
    ``max_stacks`` inputs have been processed), then drains and
    returns the number of stacks reconstructed. Outputs are written as
    ``<name>_Advantra.swc`` next to the input (or into ``out_dir``).
    """
    from pnr_tpu.io.swc import save_nodelist
    from pnr_tpu.io.volume import load_volume
    from pnr_tpu.pipeline.reconstruct import reconstruction_batch

    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    seen = set()
    sizes = {}
    paths = []  # consumed order; reconstruction_batch preserves it
    stop_path = os.path.join(watch_dir, stop_file)

    def volumes():
        served = 0
        while max_stacks is None or served < max_stacks:
            got = False
            for path in _scan(watch_dir, seen, sizes):
                try:
                    vol = load_volume(path)
                except Exception as e:  # unreadable/partial: skip loudly
                    if verbose:
                        print(f"serve: skipping {path}: {e}")
                    continue
                paths.append(path)
                got = True
                served += 1
                yield vol
                if max_stacks is not None and served >= max_stacks:
                    return
            if not got:
                # drain before stopping: size-stability needs a second
                # poll, so candidates in `sizes` are still in flight
                if not sizes and os.path.exists(stop_path):
                    return
                time.sleep(poll_s)
                # tell the batch driver "nothing ready yet" so it keeps
                # draining queued fronts instead of blocking here — an
                # arrived stack's SWC must never wait on FUTURE arrivals
                yield None

    count = 0
    for result in reconstruction_batch(volumes(), cfg, verbose=verbose):
        path = paths[count]
        base = os.path.basename(path) if out_dir else path
        out = os.path.join(out_dir, base) if out_dir else path
        out += "_Advantra.swc"
        save_nodelist(
            result.tree, out, ntype=-1, sig2r=1.0, name="Advantra",
            comment=cfg.provenance_comment(),
        )
        if verbose:
            print(f"serve: wrote {out} ({len(result.tree) - 1} nodes)")
        count += 1
    return count
