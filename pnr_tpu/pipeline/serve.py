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
from typing import Iterator, Optional, Tuple

from pnr_tpu.config import PNRConfig

_EXTS = (".tif", ".tiff", ".v3draw", ".raw", ".v3dpbd", ".npy")


def _scan(watch_dir: str, seen, sizes) -> Iterator[str]:
    """Yield paths that are new (or rewritten) and size-stable."""
    for name in sorted(os.listdir(watch_dir)):
        path = os.path.join(watch_dir, name)
        if not name.lower().endswith(_EXTS) or not os.path.isfile(path):
            continue
        try:
            st = os.stat(path)
        except OSError:
            continue
        key = (path, st.st_mtime_ns, st.st_size)
        if key in seen:
            continue
        if sizes.get(path) == st.st_size:
            seen.add(key)
            del sizes[path]
            yield path
        else:
            sizes[path] = st.st_size  # candidate: confirm next poll


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
