"""SWC reconstruction comparison (DIADEM-style node matching).

The parity harness of SURVEY.md §7 step 7: score a reconstruction
against a gold morphology by greedy mutual-nearest node matching within
a spatial threshold, reporting precision / recall / F1 over node
positions plus a topology-consistency rate (matched nodes whose parents
also match to the gold parent's component). This is a simplified,
self-contained variant of the DIADEM metric adequate for regression
and cross-implementation comparisons.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class SwcScore:
    precision: float
    recall: float
    f1: float
    topology: float  # fraction of matched edges consistent with gold
    n_test: int
    n_gold: int
    n_matched: int


def _nodes_and_parents(swc: np.ndarray):
    ids = swc[:, 0].astype(int)
    pos = swc[:, 2:5]
    parents = swc[:, 6].astype(int)
    # one row per unique id (first occurrence; ids may repeat per link)
    _, first = np.unique(ids, return_index=True)
    id_to_row = {int(ids[i]): i for i in first}
    return ids, pos, parents, first, id_to_row


def resample_swc(swc: np.ndarray, spacing: float) -> np.ndarray:
    """Arclength-resample an SWC morphology: every maximal unbranched
    path (between roots / branch points / leaves) is re-walked and
    emitted at uniform `spacing`, independent of its original node
    density.

    One-to-one node matching between reconstructions with different
    node densities systematically understates recall (a tree with fewer
    nodes than the gold cannot match every gold node even at perfect
    geometry); resampling both sides to a common spacing makes the
    match density-invariant — the standard DIADEM preprocessing step.
    """
    ids = swc[:, 0].astype(int)
    pos = swc[:, 2:5]
    parents = swc[:, 6].astype(int)
    _, first = np.unique(ids, return_index=True)
    node_pos = {int(ids[i]): pos[i] for i in first}
    node_row = {int(ids[i]): swc[i] for i in first}
    parent_of = {}
    children: dict = {}
    for i in first:
        nid, par = int(ids[i]), int(parents[i])
        parent_of[nid] = par
        if par > 0 and par in node_pos:
            children.setdefault(par, []).append(nid)

    def degree_out(nid):
        return len(children.get(nid, []))

    roots = [n for n in node_pos if parent_of.get(n, -1) <= 0 or parent_of[n] not in node_pos]
    critical = {
        n for n in node_pos
        if n in roots or degree_out(n) != 1
    }
    rows = []
    next_id = [1]
    emitted: dict = {}

    def emit(p, proto, parent_new):
        rows.append(
            np.array([next_id[0], proto[1], p[0], p[1], p[2], proto[5], parent_new])
        )
        next_id[0] += 1
        return next_id[0] - 1

    # emit critical nodes first (parents fixed up after)
    for n in sorted(critical):
        emitted[n] = emit(node_pos[n], node_row[n], -1)

    for c in sorted(critical):
        for k in children.get(c, []):
            # walk the unbranched chain c -> k -> ... -> e
            poly = [node_pos[c]]
            cur = k
            for _ in range(len(node_pos) + 1):
                if cur in critical:
                    break
                poly.append(node_pos[cur])
                cur = children[cur][0]
            else:
                raise ValueError("SWC parent links contain a cycle")
            poly.append(node_pos[cur])
            poly = np.asarray(poly)
            seg = np.linalg.norm(np.diff(poly, axis=0), axis=1)
            cum = np.concatenate([[0.0], np.cumsum(seg)])
            total = float(cum[-1])
            n_pts = max(1, int(round(total / spacing)))
            prev = emitted[c]
            for t in range(1, n_pts):
                target = total * t / n_pts
                j = int(np.searchsorted(cum, target, side="right") - 1)
                j = min(j, len(seg) - 1)
                frac = (target - cum[j]) / max(seg[j], 1e-12)
                p = poly[j] + (poly[j + 1] - poly[j]) * frac
                prev = emit(p, node_row[k], prev)
            # connect the endpoint critical node
            erow = rows[emitted[cur] - 1]
            if erow[6] < 0 and cur != c:
                erow[6] = prev
    return np.asarray(rows, np.float64)


def compare_swc(
    test: np.ndarray, gold: np.ndarray, dist: float = 4.0, resample: float = 0.0
) -> SwcScore:
    """Score `test` against `gold`; both are (N, 7) SWC row arrays.

    With `resample > 0` both morphologies are arclength-resampled to
    that spacing first (density-invariant matching; see resample_swc).
    """
    if resample > 0:
        test = resample_swc(test, resample)
        gold = resample_swc(gold, resample)
    t_ids, t_pos, t_par, t_first, _ = _nodes_and_parents(test)
    g_ids, g_pos, g_par, g_first, _ = _nodes_and_parents(gold)
    tp = t_pos[t_first]
    gp = g_pos[g_first]
    nt, ng = len(tp), len(gp)
    if nt == 0 or ng == 0:
        return SwcScore(0.0, 0.0, 0.0, 0.0, nt, ng, 0)

    # greedy mutual nearest matching within `dist`
    d = np.linalg.norm(tp[:, None, :] - gp[None, :, :], axis=-1)
    matched_t = np.full(nt, -1)
    matched_g = np.full(ng, -1)
    order = np.argsort(d, axis=None)
    for flat in order:
        i, j = divmod(int(flat), ng)
        if d[i, j] > dist:
            break
        if matched_t[i] == -1 and matched_g[j] == -1:
            matched_t[i] = j
            matched_g[j] = i

    n_matched = int((matched_t >= 0).sum())
    precision = n_matched / nt
    recall = n_matched / ng
    f1 = 2 * precision * recall / max(precision + recall, 1e-12)

    # topology: for matched test nodes with a parent, the parent's match
    # should be near the gold match's neighbourhood (within 2*dist of it)
    t_id_arr = t_ids[t_first]
    id_to_idx = {int(v): k for k, v in enumerate(t_id_arr)}
    consistent = 0
    total_edges = 0
    t_parent_of = {}
    for r in range(len(test)):
        nid, par = int(t_ids[r]), int(t_par[r])
        if par > 0:
            t_parent_of[nid] = par
    for i in range(nt):
        j = matched_t[i]
        if j < 0:
            continue
        nid = int(t_id_arr[i])
        par = t_parent_of.get(nid)
        if par is None or par not in id_to_idx:
            continue
        pi = id_to_idx[par]
        pj = matched_t[pi]
        if pj < 0:
            continue
        total_edges += 1
        if np.linalg.norm(gp[pj] - gp[j]) <= 2 * dist:
            consistent += 1
    topology = consistent / total_edges if total_edges else 1.0
    return SwcScore(precision, recall, f1, topology, nt, ng, n_matched)
