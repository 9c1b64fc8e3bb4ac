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


def compare_swc(test: np.ndarray, gold: np.ndarray, dist: float = 4.0) -> SwcScore:
    """Score `test` against `gold`; both are (N, 7) SWC row arrays."""
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
