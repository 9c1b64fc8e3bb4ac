"""Neuron graph node storage (the reference's L5 data structure, node.h/.cpp).

A growable structure-of-arrays node list with bidirectional adjacency.
Index 0 is a dummy node, matching the reference's convention
(Advantra_plugin.cpp:2416-2419) so node ids stay 1-based.
"""

from __future__ import annotations

from typing import List

import numpy as np

# node types (node.cpp:14-21, the neuromorpho.org convention)
NOTHING = 0
SOMA = 1
AXON = 2
BASAL_DENDRITE = 3
APICAL_DENDRITE = 4
FORK = 5
END = 6
UNDEFINED = 7


class NodeList:
    """Growable SoA node list with a dummy node at index 0."""

    def __init__(self):
        self.x: List[float] = [0.0]
        self.y: List[float] = [0.0]
        self.z: List[float] = [0.0]
        self.vx: List[float] = [0.0]
        self.vy: List[float] = [0.0]
        self.vz: List[float] = [0.0]
        self.corr: List[float] = [-np.inf]
        self.sig: List[float] = [0.0]
        self.type: List[int] = [UNDEFINED]
        self.nbr: List[List[int]] = [[]]

    def __len__(self) -> int:
        return len(self.x)

    def add(self, x, y, z, vx=0.0, vy=0.0, vz=0.0, corr=0.0, sig=0.0, ntype=UNDEFINED) -> int:
        self.x.append(float(x))
        self.y.append(float(y))
        self.z.append(float(z))
        self.vx.append(float(vx))
        self.vy.append(float(vy))
        self.vz.append(float(vz))
        self.corr.append(float(corr))
        self.sig.append(float(sig))
        self.type.append(int(ntype))
        self.nbr.append([])
        return len(self.x) - 1

    def link(self, i: int, j: int) -> None:
        """Bidirectional link i <-> j."""
        self.nbr[i].append(j)
        self.nbr[j].append(i)

    # ------------------------------------------------------------------
    def positions(self) -> np.ndarray:
        """(N, 3) float32 (x, y, z) including the dummy row."""
        return np.stack(
            [np.asarray(self.x, np.float32), np.asarray(self.y, np.float32), np.asarray(self.z, np.float32)],
            axis=-1,
        )

    def copy(self) -> "NodeList":
        out = NodeList.__new__(NodeList)
        out.x = list(self.x)
        out.y = list(self.y)
        out.z = list(self.z)
        out.vx = list(self.vx)
        out.vy = list(self.vy)
        out.vz = list(self.vz)
        out.corr = list(self.corr)
        out.sig = list(self.sig)
        out.type = list(self.type)
        out.nbr = [list(n) for n in self.nbr]
        return out

    def is_bidirectional(self) -> bool:
        """Graph symmetry invariant (Advantra_plugin.cpp:1304-1339)."""
        for i in range(1, len(self)):
            for j in self.nbr[i]:
                if i not in self.nbr[j]:
                    return False
        return True

    def check_nbr(self) -> None:
        """Dedup links, drop self-links, enforce bidirectionality
        (Advantra_plugin.cpp:1532-1564)."""
        for i in range(1, len(self)):
            seen = sorted(set(self.nbr[i]))
            if i in seen:
                seen.remove(i)
            self.nbr[i] = seen
        for i in range(1, len(self)):
            for j in self.nbr[i]:
                if i not in self.nbr[j]:
                    self.nbr[j].append(i)


def get_link_lengths(nodes: NodeList) -> List[float]:
    """Euclidean length of every bidirectional link, counted once
    (get_link_lengths, Advantra_plugin.cpp:1812-1843)."""
    out: List[float] = []
    chk = [[False] * len(nodes.nbr[i]) for i in range(len(nodes))]
    for i in range(1, len(nodes)):
        for j, nidx in enumerate(nodes.nbr[i]):
            if chk[i][j]:
                continue
            try:
                pos = nodes.nbr[nidx].index(i)
            except ValueError:
                continue
            chk[i][j] = True
            chk[nidx][pos] = True
            out.append(
                float(
                    np.sqrt(
                        (nodes.x[i] - nodes.x[nidx]) ** 2
                        + (nodes.y[i] - nodes.y[nidx]) ** 2
                        + (nodes.z[i] - nodes.z[nidx]) ** 2
                    )
                )
            )
    return out


def get_node_corr(nodes: NodeList) -> List[float]:
    """Correlations of all non-soma nodes (get_node_corr,
    Advantra_plugin.cpp:1849-1856)."""
    return [
        float(nodes.corr[i]) for i in range(1, len(nodes)) if nodes.type[i] != SOMA
    ]
