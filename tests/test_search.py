"""Search semantics: mini-index seed search (parity with test/search_test.cpp)
and the erase_useless_anchors dominance sweep."""

import numpy as np

from floxer_tpu.index.fmindex import FmIndex
from floxer_tpu.pex import Seed
from floxer_tpu.search_host import (
    Anchor,
    AnchorChoiceStrategy,
    AnchorGroupOrder,
    SearchConfig,
    Searcher,
    erase_useless_anchors,
)


def _make_searcher(**overrides):
    references = [
        np.array(
            [1, 1, 1, 1, 1, 1, 2, 2, 2, 2, 2, 2, 3, 3, 3, 3, 3, 3, 4, 4, 4, 4, 4, 4],
            dtype=np.uint8,
        ),
        np.array([1, 2, 3, 4, 1, 2, 3, 4], dtype=np.uint8),
    ]
    config = SearchConfig(
        max_num_anchors_hard=overrides.pop("hard", 10),
        max_num_anchors_soft=overrides.pop("soft", 10),
        anchor_group_order=AnchorGroupOrder.COUNT_FIRST,
        anchor_choice_strategy=overrides.pop(
            "strategy", AnchorChoiceStrategy.ROUND_ROBIN
        ),
        erase_useless_anchors=True,
    )
    index = FmIndex(references)
    return Searcher(index, len(references), config), references


QUERY = np.array(
    [1, 1, 1, 1, 1, 1]  # matches exactly at reference 0 position 0
    + [2, 2, 2, 3, 2, 2]  # matches with 1 mismatch at reference 0 position 6
    + [1, 2, 3, 1, 2, 3]  # matches with 1 deletion at reference 1 position 0
    + [4, 3, 2, 1, 4, 2],  # does not match
    dtype=np.uint8,
)

SEEDS = [
    Seed(query_position=0, length=6, num_errors=0, pex_leaf_index=0),
    Seed(query_position=6, length=6, num_errors=1, pex_leaf_index=1),
    Seed(query_position=12, length=6, num_errors=1, pex_leaf_index=2),
    Seed(query_position=18, length=6, num_errors=0, pex_leaf_index=3),
]


def _anchors_for(anchors_of_seed, reference_id):
    """Per-reference anchors regardless of storage form (array rows on the
    native path, Anchor lists on the Python path)."""
    from floxer_tpu.search_host import Anchor

    if anchors_of_seed.rows is not None:
        return [
            Anchor(anchors_of_seed.leaf_index, ref, pos, err)
            for ref, pos, err in anchors_of_seed.rows.tolist()
            if ref == reference_id
        ]
    if reference_id >= len(anchors_of_seed.anchors_by_reference):
        return []
    return anchors_of_seed.anchors_by_reference[reference_id]


def test_search_seeds():
    searcher, _ = _make_searcher()
    result = searcher.search_seeds(SEEDS, QUERY)

    assert result.num_fully_excluded_seeds == 0
    assert len(result.anchors_by_seed) == 4

    # seed 0: exact match at (ref 0, pos 0)
    seed0 = result.anchors_by_seed[0]
    positions0 = [
        (a.reference_id, a.reference_position, a.num_errors)
        for a in _anchors_for(seed0, 0)
    ]
    assert (0, 0, 0) in positions0
    assert not _anchors_for(seed0, 1)

    # seed 1: 1-mismatch match around (ref 0, pos 6)
    seed1 = result.anchors_by_seed[1]
    assert any(
        a.reference_position == 6 and a.num_errors == 1
        for a in _anchors_for(seed1, 0)
    )
    assert not _anchors_for(seed1, 1)

    # seed 2: 1-deletion match around (ref 1, pos 0)
    seed2 = result.anchors_by_seed[2]
    assert not _anchors_for(seed2, 0)
    assert any(
        a.reference_position <= 1 and a.num_errors == 1
        for a in _anchors_for(seed2, 1)
    )

    # seed 3: no match anywhere
    seed3 = result.anchors_by_seed[3]
    assert seed3.num_kept_useful_anchors == 0
    assert not _anchors_for(seed3, 0) and not _anchors_for(seed3, 1)


def test_hard_cap_excludes_seed():
    searcher, _ = _make_searcher(hard=2, soft=2)
    # an all-1 seed with 1 error has many matches in the 1^6 run
    seeds = [Seed(query_position=0, length=3, num_errors=1, pex_leaf_index=0)]
    result = searcher.search_seeds(seeds, np.array([1, 1, 1], dtype=np.uint8))
    assert result.anchors_by_seed[0].num_kept_raw_anchors == 0
    assert result.anchors_by_seed[0].num_kept_useful_anchors == 0


def test_soft_cap_limits_kept_anchors():
    searcher, _ = _make_searcher(hard=1000, soft=3)
    seeds = [Seed(query_position=0, length=3, num_errors=1, pex_leaf_index=0)]
    result = searcher.search_seeds(seeds, np.array([1, 1, 1], dtype=np.uint8))
    anchors_of_seed = result.anchors_by_seed[0]
    assert anchors_of_seed.num_kept_raw_anchors == 3
    assert anchors_of_seed.num_excluded_raw_anchors_by_soft_cap > 0


def test_first_reported_ignores_hard_cap():
    searcher, _ = _make_searcher(
        hard=1, soft=3, strategy=AnchorChoiceStrategy.FIRST_REPORTED
    )
    seeds = [Seed(query_position=0, length=3, num_errors=1, pex_leaf_index=0)]
    result = searcher.search_seeds(seeds, np.array([1, 1, 1], dtype=np.uint8))
    assert result.anchors_by_seed[0].num_kept_raw_anchors > 0


def test_erase_useless_anchors():
    """Parity with test/search_test.cpp:138-184."""

    def anchor(position, errors):
        return Anchor(
            pex_leaf_index=0,
            reference_id=0,
            reference_position=position,
            num_errors=errors,
        )

    useful1 = anchor(100, 0)
    useful2 = anchor(120, 0)
    anchors = [
        [anchor(95, 5), anchor(97, 3), useful1, anchor(110, 10), useful2]
    ]
    kept = erase_useless_anchors(anchors)
    assert kept == 2
    assert [(a.reference_position, a.num_errors) for a in anchors[0]] == [
        (100, 0),
        (120, 0),
    ]
