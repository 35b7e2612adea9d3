"""PEX (pigeonhole-exact) partition trees.

Builds the hierarchical partition of a query used for seeded approximate
search and bottom-up verification, based on chapter 6.5.1 of "Flexible
Pattern Matching in Strings" (Navarro & Raffinot).

Reference parity: include/pex.hpp + src/lib/pex.cpp. Tree shapes are pinned
by test/pex_test.cpp (recursive leaf-errors 0/1/2 on a 12-mer with 3 errors;
bottom-up on a 30-mer with 14 errors / 2 leaf errors).

The tree is a pure function of (query_length, query_errors, leaf_errors,
strategy) — it is tiny and stays on host; trees for a whole read batch are
memoized by that key since reads of equal length share one shape.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from functools import lru_cache

from .utils.mathutils import ceil_div

NULL_ID = -1  # parent id of the root (pex.hpp:60 uses SIZE_MAX; -1 here)


class BuildStrategy(enum.Enum):
    RECURSIVE = "recursive"
    BOTTOM_UP = "bottom_up"


@dataclass
class PexNode:
    """One tree node covering query[query_index_from .. query_index_to]
    (inclusive, pex.hpp:59-76) searchable with num_errors errors."""

    parent_id: int
    query_index_from: int
    query_index_to: int
    num_errors: int

    @property
    def length_of_query_span(self) -> int:
        return self.query_index_to - self.query_index_from + 1

    @property
    def is_root(self) -> bool:
        return self.parent_id == NULL_ID


@dataclass(frozen=True)
class Seed:
    """A leaf's query slice to be searched in the FM-index (search.hpp:17-22).

    sequence is stored as (start, length) into the query, resolved by the
    caller; pex_leaf_index is the index into the tree's leaves vector.
    """

    query_position: int
    length: int
    num_errors: int
    pex_leaf_index: int


@dataclass
class PexTree:
    inner_nodes: list[PexNode] = field(default_factory=list)
    leaves: list[PexNode] = field(default_factory=list)

    @property
    def root(self) -> PexNode:
        root = self.leaves[0] if not self.inner_nodes else self.inner_nodes[0]
        assert root.is_root
        return root

    def parent_of(self, child: PexNode) -> PexNode:
        if child.is_root:
            raise ValueError("tried to get parent of PEX tree root")
        return self.inner_nodes[child.parent_id]

    def generate_seeds(self, seed_sampling_step_size: int = 1) -> list[Seed]:
        """One seed per (sampled) leaf, in leaf order (pex.cpp:258-277).
        Seeds are a pure function of the tree, so the list is memoized —
        trees are shared across same-length queries via cached_pex_tree."""
        cache = getattr(self, "_seed_cache", None)
        if cache is None:
            cache = self._seed_cache = {}
        seeds = cache.get(seed_sampling_step_size)
        if seeds is None:
            seeds = [
                Seed(
                    query_position=leaf.query_index_from,
                    length=leaf.length_of_query_span,
                    num_errors=leaf.num_errors,
                    pex_leaf_index=i,
                )
                for i in range(0, len(self.leaves), seed_sampling_step_size)
                for leaf in (self.leaves[i],)
            ]
            cache[seed_sampling_step_size] = seeds
        return seeds

    def dot_statement(self, leaf_max_num_errors: int) -> str:
        """Graphviz DOT export (pex.cpp:281-324)."""
        lines = [
            "graph {",
            (
                f'label = "PEX tree for query length {self.root.query_index_to + 1},'
                f" {self.root.num_errors} errors and leaf threshold"
                f' {leaf_max_num_errors} ({len(self.leaves)} leaves)";'
            ),
            'labelloc = "t";',
            "node [shape=record];",
        ]
        node_id = 0
        for node in list(self.inner_nodes) + list(self.leaves):
            lines.append(
                f'{node_id} [label="errors: {node.num_errors}'
                f"\\nlength: {node.length_of_query_span}"
                f'\\nrange: [{node.query_index_from},{node.query_index_to}]"];'
            )
            if not node.is_root:
                lines.append(f"{node_id} -- {node.parent_id};")
            node_id += 1
        lines.append("}")
        return "\n".join(lines) + "\n"


# seeds-list -> (length, num_errors, query_position, pex_leaf_index) int64
# arrays, keyed by list identity. Seed lists are memoized per tree
# (generate_seeds), so all queries of one length share a single entry; the
# stored reference to the list keeps its id from being reused. Used by the
# chunk-batched search and the vectorized stats adders.
_SEED_ARRAY_CACHE: dict[int, tuple] = {}


def seed_stat_arrays(seeds: list[Seed]):
    import numpy as np

    key = id(seeds)
    hit = _SEED_ARRAY_CACHE.get(key)
    if hit is not None and hit[0] is seeds:
        return hit[1]
    n = len(seeds)
    arrays = (
        np.fromiter((s.length for s in seeds), count=n, dtype=np.int64),
        np.fromiter((s.num_errors for s in seeds), count=n, dtype=np.int64),
        np.fromiter((s.query_position for s in seeds), count=n, dtype=np.int64),
        np.fromiter((s.pex_leaf_index for s in seeds), count=n, dtype=np.int64),
    )
    if len(_SEED_ARRAY_CACHE) >= 8192:
        _SEED_ARRAY_CACHE.clear()
    _SEED_ARRAY_CACHE[key] = (seeds, arrays)
    return arrays


def build_pex_tree(
    total_query_length: int,
    query_num_errors: int,
    leaf_max_num_errors: int,
    strategy: BuildStrategy = BuildStrategy.RECURSIVE,
) -> PexTree:
    tree = PexTree()
    if strategy == BuildStrategy.RECURSIVE:
        no_error_seed_length = total_query_length // (query_num_errors + 1)
        _add_nodes_recursive(
            tree,
            no_error_seed_length,
            leaf_max_num_errors,
            1,
            total_query_length,
            query_num_errors,
            NULL_ID,
        )
    elif strategy == BuildStrategy.BOTTOM_UP:
        _add_nodes_bottom_up(
            tree, total_query_length, query_num_errors, leaf_max_num_errors
        )
    else:  # pragma: no cover
        raise ValueError(f"unknown build strategy {strategy}")

    root = tree.root
    assert root.num_errors >= query_num_errors
    assert root.num_errors <= query_num_errors + leaf_max_num_errors
    assert root.query_index_from == 0
    assert root.query_index_to == total_query_length - 1
    return tree


@lru_cache(maxsize=4096)
def cached_pex_tree(
    total_query_length: int,
    query_num_errors: int,
    leaf_max_num_errors: int,
    strategy: BuildStrategy,
) -> PexTree:
    """Memoized tree: reads of the same length under one config share a shape."""
    return build_pex_tree(
        total_query_length, query_num_errors, leaf_max_num_errors, strategy
    )


def _add_nodes_recursive(
    tree: PexTree,
    no_error_seed_length: int,
    leaf_max_num_errors: int,
    query_index_from: int,
    query_index_to: int,
    num_errors: int,
    parent_id: int,
) -> None:
    """Top-down build from the book; 1-based indices until node creation
    (pex.cpp:110-156). The rightmost leaf absorbs the length remainder."""
    num_leaves_left = ceil_div(num_errors + 1, 2)

    node = PexNode(
        parent_id=parent_id,
        query_index_from=query_index_from - 1,
        query_index_to=query_index_to - 1,
        num_errors=num_errors,
    )

    if num_errors <= leaf_max_num_errors:
        tree.leaves.append(node)
        return

    curr_node_id = len(tree.inner_nodes)
    tree.inner_nodes.append(node)

    query_split_index = query_index_from + num_leaves_left * no_error_seed_length
    num_errors_left = (num_leaves_left * num_errors) // (num_errors + 1)
    num_errors_right = ((num_errors + 1 - num_leaves_left) * num_errors) // (
        num_errors + 1
    )

    _add_nodes_recursive(
        tree,
        no_error_seed_length,
        leaf_max_num_errors,
        query_index_from,
        query_split_index - 1,
        num_errors_left,
        curr_node_id,
    )
    _add_nodes_recursive(
        tree,
        no_error_seed_length,
        leaf_max_num_errors,
        query_split_index,
        query_index_to,
        num_errors_right,
        curr_node_id,
    )


def _add_nodes_bottom_up(
    tree: PexTree,
    total_query_length: int,
    query_num_errors: int,
    leaf_max_num_errors: int,
) -> None:
    """Bottom-up build (pex.cpp:158-256): even leaves, pairwise merge upward,
    the last 3 nodes of an odd level merge together; root lands at index 0."""
    base_leaf_weight = leaf_max_num_errors + 1
    num_desired_leaves = ceil_div(query_num_errors + 1, base_leaf_weight)

    if num_desired_leaves == 1:
        tree.leaves.append(
            PexNode(
                parent_id=NULL_ID,
                query_index_from=0,
                query_index_to=total_query_length - 1,
                num_errors=query_num_errors,
            )
        )
        return

    # create_leaves (pex.cpp:215-239): remainder spread over the first leaves
    base_seed_length = total_query_length // num_desired_leaves
    seed_length_remainder = total_query_length % num_desired_leaves
    start = 0
    for i in range(num_desired_leaves):
        length = base_seed_length + (1 if i < seed_length_remainder else 0)
        tree.leaves.append(
            PexNode(
                parent_id=0,  # set during merging
                query_index_from=start,
                query_index_to=start + length - 1,
                num_errors=leaf_max_num_errors,
            )
        )
        start += length

    # secure index 0 for the root (pex.cpp:181)
    tree.inner_nodes.append(PexNode(0, 0, 0, 0))

    # current level as (container, start, count) spans to mirror pex.cpp:184-206
    level_nodes: list[PexNode] = list(tree.leaves)

    while len(level_nodes) > 3:
        level_size = len(level_nodes)
        i = 0
        while i < level_size:
            num_remaining = level_size - i
            if num_remaining == 1:
                break
            num_children = 3 if num_remaining == 3 else 2
            children = level_nodes[i : i + num_children]
            new_parent_id = len(tree.inner_nodes)
            tree.inner_nodes.append(_create_parent_node(children, new_parent_id))
            i += 2 if num_children == 2 else num_children
        level_nodes = tree.inner_nodes[-(level_size // 2) :]

    root = _create_parent_node(level_nodes, 0)
    root.parent_id = NULL_ID
    tree.inner_nodes[0] = root


def _create_parent_node(children: list[PexNode], parent_id: int) -> PexNode:
    """Parent errors = sum(children) + (#children - 1) (pex.cpp:241-256)."""
    assert children
    children_errors = 0
    for child in children:
        child.parent_id = parent_id
        children_errors += child.num_errors
    return PexNode(
        parent_id=0,  # set later
        query_index_from=children[0].query_index_from,
        query_index_to=children[-1].query_index_to,
        num_errors=children_errors + len(children) - 1,
    )
