"""Sequential trace commit: estimates -> node graph with density suppression.

This is the host-side half of the tracer redesign (SURVEY.md §7 step 3):
the device computes whole waves of trace estimates speculatively
(pnr_tpu.smc.tracker); this module replays them **in seed order**
against the live soma map / visit-count maps, reproducing exactly the
reference's first-come-first-served bookkeeping:

* seed suppression: a seed is skipped when its voxel's visit count has
  already reached nodepervol (Advantra_plugin.cpp:2669-2670);
* per-estimate stopping: reaching a soma voxel links to the soma node
  and stops; reaching a saturated voxel links to the node recorded in
  nidx_map and stops (tracker.cpp:850-882);
* otherwise the estimate becomes a node, chained to its predecessor,
  and stamps the visit count / node index at its voxel and the
  clamped `vol`-neighbourhood (tracker.cpp:884-896, neighbourhood
  built at Advantra_plugin.cpp:2602-2650 — note we clamp y by height
  as intended, where the reference clamps some vol=19/27 y offsets by
  width, an evident copy-paste bug);
* the last node of a trace longer than one node is typed END
  (tracker.cpp:930-931).

Because the particle evolution never reads these maps, committing a
speculatively computed trace prefix is bit-identical to the reference's
interleaved compute-and-commit (modulo PRNG, which the reference
re-seeds from wall-clock and is irreproducible anyway).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from pnr_tpu.graph.nodes import AXON, END, UNDEFINED, NodeList


def _round_half_away(v: float) -> int:
    return int(np.floor(v + 0.5)) if v >= 0 else int(np.ceil(v - 0.5))


def vol_neighbourhood(vol: int) -> List[Tuple[int, int, int]]:
    """The (dx, dy, dz) stamp offsets for a `vol` suppression volume,
    excluding the centre (Advantra_plugin.cpp:2613-2648)."""
    offs: List[Tuple[int, int, int]] = []
    if vol >= 5:
        offs += [(-1, 0, 0), (1, 0, 0), (0, -1, 0), (0, 1, 0)]
    if vol >= 9:
        offs += [(-1, -1, 0), (1, -1, 0), (-1, 1, 0), (1, 1, 0)]
    if vol >= 11:
        offs += [(0, 0, -1), (0, 0, 1)]
    if vol >= 19:
        offs += [
            (-1, 0, -1), (1, 0, -1), (0, -1, -1), (0, 1, -1),
            (-1, 0, 1), (1, 0, 1), (0, -1, 1), (0, 1, 1),
        ]
    if vol >= 27:
        offs += [
            (-1, -1, -1), (1, -1, -1), (-1, 1, -1), (1, 1, -1),
            (-1, -1, 1), (1, -1, 1), (-1, 1, 1), (1, 1, 1),
        ]
    return offs


class TraceCommitter:
    """Owns the visit-count / node-index maps and the growing node list."""

    def __init__(
        self,
        shape_zyx: Tuple[int, int, int],
        vol: int,
        nodepervol: int,
        nodes: NodeList,
        smap: Optional[np.ndarray] = None,
    ):
        self.shape = shape_zyx
        self.vol = int(vol)
        self.nodepervol = int(nodepervol)
        self.nodes = nodes
        self.smap = smap  # (Z, Y, X) int32 soma-node index per voxel, or None
        self.npervol = np.zeros(shape_zyx, np.int32)
        self.nidx = np.zeros(shape_zyx, np.int32)
        self._offs = vol_neighbourhood(self.vol)
        self._offs_np = None  # built lazily for the native inner loop

    # ------------------------------------------------------------------
    def seed_allowed(self, seed_xyz) -> bool:
        """Seed suppression check (Advantra_plugin.cpp:2669-2670)."""
        x, y, z = seed_xyz
        zi = _round_half_away(float(z))
        yi = _round_half_away(float(y))
        xi = _round_half_away(float(x))
        return self.npervol[zi, yi, xi] < self.nodepervol

    def _stamp(self, zi: int, yi: int, xi: int, nid: int) -> None:
        l, h, w = self.shape
        self.npervol[zi, yi, xi] += 1
        self.nidx[zi, yi, xi] = nid
        for dx, dy, dz in self._offs:
            qx = min(max(xi + dx, 0), w - 1)
            qy = min(max(yi + dy, 0), h - 1)
            qz = min(max(zi + dz, 0), l - 1)
            # clamping may duplicate voxels at borders; the reference
            # double-stamps them too (it stamps raw clamped indices)
            self.npervol[qz, qy, qx] += 1
            self.nidx[qz, qy, qx] = nid

    # -- incremental commit API ------------------------------------------
    # A trace's estimates may arrive in stages (pnr_tpu.smc staged waves);
    # the cursor replays them with identical semantics to a monolithic
    # replay. Correctness note: the caller MUST fully finish a trace
    # before starting the next one (the chain-linking below assumes this
    # trace's nodes are the most recently appended).

    def begin_trace(self) -> dict:
        return {"i": 0, "count": 0, "finished": False, "ti_limit": None}

    def commit_steps(self, cur: dict, pos, dirs, sig, corr, valid, upto: int) -> dict:
        """Replay estimates cur['i']..upto-1 (stopping early on any stop
        condition); mutates and returns the cursor.

        The hot inner loop (rounding, map checks, vol-neighbourhood
        stamps) runs in the native runtime when built — measured 5.1x
        the Python loop (45k -> 228k committed nodes/s at vol=9; the
        residue is the bulk node append). That matters because the
        device produces ~43-119k steps/s: on a fast host link the
        Python commit would have capped end-to-end throughput. The
        Python loop below stays as the oracle/fallback; native-vs-
        Python equality (nodes, links, maps bitwise) is gated by
        tests/test_staged_commit.py."""
        from pnr_tpu import native as _native

        if (
            _native.have_native()
            and isinstance(pos, np.ndarray)
            and not cur["finished"]
            and cur["i"] < upto
        ):
            return self._commit_steps_native(
                cur, pos, dirs, sig, corr, valid, upto
            )
        nodes = self.nodes
        while cur["i"] < upto and not cur["finished"]:
            i = cur["i"]
            if not valid[i]:
                cur["finished"] = True
                cur["ti_limit"] = i
                break
            x, y, z = pos[i]
            zi = _round_half_away(float(z))
            yi = _round_half_away(float(y))
            xi = _round_half_away(float(x))

            if self.smap is not None and self.smap[zi, yi, xi] > 0:
                if i > 0:
                    nodes.link(int(self.smap[zi, yi, xi]), len(nodes) - 1)
                cur["finished"] = True
                cur["ti_limit"] = i
                break
            if self.npervol[zi, yi, xi] >= self.nodepervol:
                if i > 0:
                    nodes.link(int(self.nidx[zi, yi, xi]), len(nodes) - 1)
                cur["finished"] = True
                cur["ti_limit"] = i
                break

            nid = nodes.add(
                x, y, z, dirs[i][0], dirs[i][1], dirs[i][2],
                corr=float(corr[i]), sig=float(sig[i]),
                ntype=UNDEFINED if i == 0 else AXON,
            )
            self._stamp(zi, yi, xi, nid)
            if i > 0:
                nodes.link(nid, nid - 1)
            cur["count"] += 1
            cur["i"] = i + 1
        return cur

    def _commit_steps_native(
        self, cur: dict, pos, dirs, sig, corr, valid, upto: int
    ) -> dict:
        """Native inner loop + bulk node append (same semantics as the
        Python loop below, step for step)."""
        from pnr_tpu import native as _native

        nodes = self.nodes
        i0 = cur["i"]
        base = len(nodes)
        if self._offs_np is None:
            self._offs_np = np.ascontiguousarray(
                np.asarray(self._offs, np.int32).reshape(-1, 3)
                if self._offs
                else np.zeros((0, 3), np.int32)
            )
        smap = (
            np.ascontiguousarray(self.smap, np.int32)
            if self.smap is not None
            else None
        )
        # float64 hand-off: the native loop rounds at the same precision
        # as the Python oracle's _round_half_away(float(v)) whatever the
        # caller's dtype (f32 pipeline arrays promote losslessly)
        res = _native.commit_steps_native(
            self.npervol, self.nidx, smap, self._offs_np,
            self.nodepervol,
            np.ascontiguousarray(pos[:upto], np.float64),
            np.ascontiguousarray(valid[:upto], np.uint8),
            i0, int(upto), base,
        )
        n_new, finished, ti_limit, stop_link = res
        if n_new:
            sl = slice(i0, i0 + n_new)
            p = np.asarray(pos[sl], np.float64)
            d = np.asarray(dirs[sl], np.float64)
            nodes.x.extend(p[:, 0].tolist())
            nodes.y.extend(p[:, 1].tolist())
            nodes.z.extend(p[:, 2].tolist())
            nodes.vx.extend(d[:, 0].tolist())
            nodes.vy.extend(d[:, 1].tolist())
            nodes.vz.extend(d[:, 2].tolist())
            nodes.corr.extend(np.asarray(corr[sl], np.float64).tolist())
            nodes.sig.extend(np.asarray(sig[sl], np.float64).tolist())
            nodes.type.extend(
                UNDEFINED if (i0 + k) == 0 else AXON for k in range(n_new)
            )
            nodes.nbr.extend([] for _ in range(n_new))
            for k in range(n_new):
                if i0 + k > 0:
                    nodes.link(base + k, base + k - 1)
            cur["count"] += n_new
            cur["i"] = i0 + n_new
        if finished:
            if stop_link is not None:
                nodes.link(stop_link[0], stop_link[1])
            cur["finished"] = True
            cur["ti_limit"] = ti_limit
        return cur

    def finish_trace(self, cur: dict) -> int:
        """Apply the END tag (tracker.cpp:930-931); returns nodes added."""
        ti_limit = cur["ti_limit"] if cur["ti_limit"] is not None else cur["i"]
        if ti_limit > 1 and cur["count"] > 0:
            self.nodes.type[len(self.nodes) - 1] = END
        cur["finished"] = True
        return cur["count"]

    def commit_trace(self, pos, dirs, sig, corr, valid) -> int:
        """Replay one complete trace; returns the number of nodes added."""
        cur = self.begin_trace()
        self.commit_steps(cur, pos, dirs, sig, corr, valid, len(valid))
        return self.finish_trace(cur)
