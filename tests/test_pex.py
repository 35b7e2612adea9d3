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
