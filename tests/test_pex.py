"""Parity with reference test/pex_test.cpp: exact seed layouts."""

from floxer_tpu.pex import BuildStrategy, build_pex_tree


def _seed_tuples(tree, step=1):
    return [
        (s.query_position, s.length, s.num_errors, s.pex_leaf_index)
        for s in tree.generate_seeds(step)
    ]


def test_generate_seeds_from_recursive():
    # 12-mer, 3 errors, 0 leaf errors -> four 3-mers with 0 errors
    tree = build_pex_tree(12, 3, 0, BuildStrategy.RECURSIVE)
    assert _seed_tuples(tree) == [
        (0, 3, 0, 0),
        (3, 3, 0, 1),
        (6, 3, 0, 2),
        (9, 3, 0, 3),
    ]

    # 1 leaf error -> two 6-mers with 1 error
    tree1 = build_pex_tree(12, 3, 1, BuildStrategy.RECURSIVE)
    expected = [(0, 6, 1, 0), (6, 6, 1, 1)]
    assert _seed_tuples(tree1) == expected

    # 2 leaf errors -> nothing changes
    tree2 = build_pex_tree(12, 3, 2, BuildStrategy.RECURSIVE)
    assert _seed_tuples(tree2) == expected


def test_generate_seeds_from_bottom_up():
    # 30-mer, 14 errors, 2 leaf errors -> five 6-mers with 2 errors
    tree = build_pex_tree(30, 14, 2, BuildStrategy.BOTTOM_UP)
    assert _seed_tuples(tree) == [
        (0, 6, 2, 0),
        (6, 6, 2, 1),
        (12, 6, 2, 2),
        (18, 6, 2, 3),
        (24, 6, 2, 4),
    ]
    # root invariants (pex.cpp:104-107)
    assert tree.root.num_errors == 14
    assert tree.root.query_index_from == 0
    assert tree.root.query_index_to == 29


def test_bottom_up_single_root():
    tree = build_pex_tree(20, 2, 2, BuildStrategy.BOTTOM_UP)
    assert len(tree.leaves) == 1
    assert tree.leaves[0].is_root
    assert tree.root.num_errors == 2


def test_parent_walk_reaches_root():
    tree = build_pex_tree(1000, 25, 2, BuildStrategy.BOTTOM_UP)
    for leaf in tree.leaves:
        node = leaf
        depth = 0
        while not node.is_root:
            node = tree.parent_of(node)
            depth += 1
            assert depth < 64
        assert node is tree.root


def test_dot_statement_contains_all_nodes():
    tree = build_pex_tree(12, 3, 0, BuildStrategy.RECURSIVE)
    dot = tree.dot_statement(0)
    assert dot.startswith("graph {")
    assert dot.count("errors:") == len(tree.inner_nodes) + len(tree.leaves)


def test_native_tree_builder_matches_python_oracle():
    """Fuzz: the C++ builder (native/pextree.cpp) emits byte-identical node
    rows to the Python object builder for both strategies."""
    import numpy as np

    from floxer_tpu.native import native_build_pex_tree
    from floxer_tpu.pex import (
        NULL_ID,
        _add_nodes_bottom_up,
        _add_nodes_recursive,
        _NodeAccumulator,
        _nodes_to_array,
    )

    if native_build_pex_tree(10, 1, 0, 0) is None:
        import pytest

        pytest.skip("native library unavailable")

    rng = np.random.default_rng(7)
    for _ in range(300):
        length = int(rng.integers(1, 30000))
        k = int(rng.integers(0, min(length, 3000)))
        s = int(rng.integers(0, 4))
        strategy = int(rng.integers(0, 2))
        accum = _NodeAccumulator()
        if strategy == 0:
            _add_nodes_recursive(
                accum, length // (k + 1), s, 1, length, k, NULL_ID
            )
        else:
            _add_nodes_bottom_up(accum, length, k, s)
        native = native_build_pex_tree(length, k, s, strategy)
        assert native is not None
        assert np.array_equal(_nodes_to_array(accum.inner_nodes), native[0])
        assert np.array_equal(_nodes_to_array(accum.leaves), native[1])


def test_seeds_view_matches_materialized_seeds():
    """SeedsView arrays and lazily-materialized Seed objects agree, with
    and without sampling."""
    import numpy as np

    from floxer_tpu.pex import seed_stat_arrays

    tree = build_pex_tree(5000, 120, 2, BuildStrategy.RECURSIVE)
    for step in (1, 2, 5):
        seeds = tree.generate_seeds(step)
        lengths, errors, qpos, leaf = seed_stat_arrays(seeds)
        assert len(seeds) == lengths.shape[0]
        for i, seed in enumerate(seeds):
            assert seed.length == lengths[i]
            assert seed.num_errors == errors[i]
            assert seed.query_position == qpos[i]
            assert seed.pex_leaf_index == leaf[i]
        # leaf indices honor the sampling step over the full leaf list
        assert np.array_equal(
            leaf, np.arange(0, tree.num_leaves, step, dtype=np.int64)
        )


def test_chain_table_matches_parent_walk():
    """ChainTable chains equal an explicit parent-pointer walk."""
    from floxer_tpu.pex import ChainTable

    for strategy in (BuildStrategy.RECURSIVE, BuildStrategy.BOTTOM_UP):
        tree = build_pex_tree(4321, 77, 1, strategy)
        table = ChainTable(tree, direct_full=False)
        for leaf_index, leaf in enumerate(tree.leaves):
            expected = []
            node = leaf
            while not node.is_root:
                node = tree.parent_of(node)
                expected.append(node)
            if not expected:
                expected = [leaf]
            assert table[leaf_index] == expected
    direct = ChainTable(tree, direct_full=True)
    assert direct[0] == [tree.root]
