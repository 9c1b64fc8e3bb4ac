"""Neuron graph layer (the reference's L5: node.cpp + graph algorithms)."""

from pnr_tpu.graph.nodes import (
    AXON,
    END,
    NOTHING,
    SOMA,
    UNDEFINED,
    NodeList,
)
from pnr_tpu.graph.build import TraceCommitter, vol_neighbourhood
from pnr_tpu.graph.refine import group1, interpolate_nodelist, non_blurring
from pnr_tpu.graph.trees import (
    bfs_forest,
    extract_largest_tree,
    extract_trees,
    interpolate_treelist,
    remove_tails,
)

__all__ = [
    "NodeList",
    "NOTHING",
    "SOMA",
    "AXON",
    "END",
    "UNDEFINED",
    "TraceCommitter",
    "vol_neighbourhood",
    "interpolate_nodelist",
    "non_blurring",
    "group1",
    "bfs_forest",
    "extract_largest_tree",
    "extract_trees",
    "remove_tails",
    "interpolate_treelist",
]
