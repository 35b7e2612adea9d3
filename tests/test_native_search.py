"""Native C++ scheme search vs the Python DFS oracle: byte-identical groups."""

import numpy as np
import pytest

from floxer_tpu.index.fmindex import FmIndex
from floxer_tpu.search_host import search_seed_groups
from floxer_tpu.native import native_search_seed


@pytest.fixture(scope="module")
def index():
    rng = np.random.default_rng(9)
    sequences = [
        rng.integers(1, 5, size=2000).astype(np.uint8),
        rng.integers(1, 5, size=700).astype(np.uint8),
    ]
    idx = FmIndex(sequences)
    probe = native_search_seed(
        idx,
        np.array([1, 2, 3], dtype=np.uint8),
        __import__(
            "floxer_tpu.schemes", fromlist=["expand_scheme"]
        ).expand_scheme(0, 3),
        1000,
    )
    if probe is None:
        pytest.skip("native toolchain unavailable")
    return idx, sequences


@pytest.mark.parametrize("k", [0, 1, 2, 3])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_native_matches_python_groups(index, k, seed):
    idx, sequences = index
    rng = np.random.default_rng(seed * 10 + k)
    for trial in range(6):
        length = int(rng.integers(max(6, 2 * k + 2), 24))
        source = sequences[trial % 2]
        start = int(rng.integers(0, len(source) - length))
        pattern = source[start : start + length].copy()
        for _ in range(int(rng.integers(0, k + 1))):
            pos = int(rng.integers(0, length))
            pattern[pos] = 1 + (pattern[pos] % 4)

        native_groups, native_total, native_aborted = search_seed_groups(
            idx, pattern, k, 501, allow_native=True
        )
        python_groups, python_total, python_aborted = search_seed_groups(
            idx, pattern, k, 501, allow_native=False
        )
        assert native_total == python_total
        assert native_aborted == python_aborted
        assert [
            (g.cursor.lb, g.cursor.lb_rev, g.cursor.length, g.num_errors)
            for g in native_groups
        ] == [
            (g.cursor.lb, g.cursor.lb_rev, g.cursor.length, g.num_errors)
            for g in python_groups
        ]


def test_native_abort_matches(index):
    idx, _ = index
    # a very common pattern with a tiny cap triggers the abort path
    pattern = np.array([1, 2], dtype=np.uint8)
    native = search_seed_groups(idx, pattern, 1, 5, allow_native=True)
    python = search_seed_groups(idx, pattern, 1, 5, allow_native=False)
    assert native[1] == python[1] and native[2] == python[2] is True
    assert [
        (g.cursor.lb, g.cursor.length, g.num_errors) for g in native[0]
    ] == [(g.cursor.lb, g.cursor.length, g.num_errors) for g in python[0]]


def _seed_anchor_list(anchors_of_seed):
    """Normalized per-seed anchor tuples regardless of storage form (the
    native path keeps int64 rows; the Python path keeps Anchor objects)."""
    if anchors_of_seed.rows is not None:
        leaf = anchors_of_seed.leaf_index
        return [
            (leaf, ref, pos, err)
            for ref, pos, err in anchors_of_seed.rows.tolist()
        ]
    return [
        (x.pex_leaf_index, x.reference_id, x.reference_position, x.num_errors)
        for anchors in anchors_of_seed.anchors_by_reference
        for x in anchors
    ]


def _equal_results(a, b):
    assert a.num_fully_excluded_seeds == b.num_fully_excluded_seeds
    assert len(a.anchors_by_seed) == len(b.anchors_by_seed)
    for sa, sb in zip(a.anchors_by_seed, b.anchors_by_seed):
        assert sa.num_kept_useful_anchors == sb.num_kept_useful_anchors
        assert sa.num_kept_raw_anchors == sb.num_kept_raw_anchors
        assert (
            sa.num_excluded_raw_anchors_by_soft_cap
            == sb.num_excluded_raw_anchors_by_soft_cap
        )
        assert _seed_anchor_list(sa) == _seed_anchor_list(sb)


@pytest.mark.parametrize("order", ["count_first", "errors_first", "none"])
@pytest.mark.parametrize(
    "choice", ["round_robin", "full_groups", "first_reported"]
)
@pytest.mark.parametrize("erase", [True, False])
def test_native_select_matches_python_pipeline(index, order, choice, erase):
    """floxer_search_select_batch (DFS + caps + ordering + choice + locate +
    dominance sweep in C++) vs the Python stage pipeline: identical
    SearchResult for every config combination."""
    import os
    from unittest import mock

    from floxer_tpu.pex import Seed
    from floxer_tpu.search_host import (
        AnchorChoiceStrategy,
        AnchorGroupOrder,
        SearchConfig,
        Searcher,
    )

    idx, sequences = index
    rng = np.random.default_rng(hash((order, choice, erase)) % 2**31)
    query = np.concatenate(
        [sequences[0][200:400], sequences[1][100:260]]
    ).copy()
    for _ in range(8):
        pos = int(rng.integers(0, len(query)))
        query[pos] = 1 + (query[pos] % 4)
    seeds = []
    cursor = 0
    for li, (length, errors) in enumerate(
        [(18, 1), (18, 1), (12, 0), (20, 2), (18, 1), (9, 1)]
    ):
        seeds.append(
            Seed(
                query_position=cursor,
                length=length,
                num_errors=errors,
                pex_leaf_index=li,
            )
        )
        cursor += length

    config = SearchConfig(
        max_num_anchors_hard=40,
        max_num_anchors_soft=7,
        anchor_group_order=AnchorGroupOrder(order),
        anchor_choice_strategy=AnchorChoiceStrategy(choice),
        erase_useless_anchors=erase,
    )
    searcher = Searcher(
        index=idx, num_reference_sequences=2, config=config, num_threads=2
    )
    native_result = searcher.search_seeds(seeds, query)
    with mock.patch.dict(os.environ, {"FLOXER_TPU_NO_NATIVE_SELECT": "1"}):
        python_result = searcher.search_seeds(seeds, query)
    _equal_results(native_result, python_result)


@pytest.mark.parametrize("order", ["count_first", "errors_first", "none"])
@pytest.mark.parametrize(
    "choice", ["round_robin", "full_groups", "first_reported"]
)
def test_search_seeds_many_matches_per_job(index, order, choice):
    """The chunk-batched SoA path (one native call per seed class, array
    scatter assembly, SearchResultSoA slices) must reproduce search_seeds
    job for job: counters, anchors, and iteration order."""
    import os
    from unittest import mock

    from floxer_tpu.pex import Seed
    from floxer_tpu.search_host import (
        AnchorChoiceStrategy,
        AnchorGroupOrder,
        SearchConfig,
        Searcher,
    )

    idx, sequences = index
    rng = np.random.default_rng(hash((order, choice)) % 2**31)
    config = SearchConfig(
        max_num_anchors_hard=40,
        max_num_anchors_soft=7,
        anchor_group_order=AnchorGroupOrder(order),
        anchor_choice_strategy=AnchorChoiceStrategy(choice),
        erase_useless_anchors=True,
    )
    searcher = Searcher(
        index=idx, num_reference_sequences=2, config=config, num_threads=2
    )

    jobs = []
    for trial in range(5):
        source = sequences[trial % 2]
        qlen = int(rng.integers(60, 140))
        start = int(rng.integers(0, len(source) - qlen))
        query = source[start : start + qlen].copy()
        for _ in range(4):
            pos = int(rng.integers(0, qlen))
            query[pos] = 1 + (query[pos] % 4)
        seeds = []
        cursor = 0
        while cursor + 8 < qlen and len(seeds) < 6:
            length = int(rng.integers(8, min(22, qlen - cursor)))
            seeds.append(
                Seed(
                    query_position=cursor,
                    length=length,
                    num_errors=int(rng.integers(0, 3)),
                    pex_leaf_index=len(seeds),
                )
            )
            cursor += length
        jobs.append((seeds, query))

    many = searcher.search_seeds_many(jobs)
    assert len(many) == len(jobs)
    for (seeds, query), soa in zip(jobs, many):
        per_job = searcher.search_seeds(seeds, query)
        _equal_results(soa, per_job)
        # flat_arrays must match iter_anchors order exactly
        leaf, ref, pos = soa.flat_arrays()
        flat = list(zip(leaf.tolist(), ref.tolist(), pos.tolist()))
        assert flat == [
            (a.pex_leaf_index, a.reference_id, a.reference_position)
            for a in soa.iter_anchors()
        ]


@pytest.mark.parametrize("fibers", ["1", "3", "16"])
def test_fiber_engine_matches_recursive(index, fibers):
    """Recursive (FLOXER_TPU_SEARCH_FIBERS=1) vs fiber engine on identical
    seed batches: anchors, counters, and iteration order byte-identical.
    The env var is re-read per native batch call, so in-process switching
    is reliable (search.cpp fiber_count_from_env)."""
    import os
    from unittest import mock

    from floxer_tpu.pex import Seed
    from floxer_tpu.search_host import (
        AnchorChoiceStrategy,
        AnchorGroupOrder,
        SearchConfig,
        Searcher,
    )

    idx, sequences = index
    rng = np.random.default_rng(4242)
    config = SearchConfig(
        max_num_anchors_hard=40,
        max_num_anchors_soft=7,
        anchor_group_order=AnchorGroupOrder("count_first"),
        anchor_choice_strategy=AnchorChoiceStrategy("round_robin"),
        erase_useless_anchors=True,
    )
    searcher = Searcher(
        index=idx, num_reference_sequences=2, config=config, num_threads=2
    )

    jobs = []
    for trial in range(6):
        source = sequences[trial % 2]
        qlen = int(rng.integers(60, 140))
        start = int(rng.integers(0, len(source) - qlen))
        query = source[start : start + qlen].copy()
        for _ in range(4):
            pos = int(rng.integers(0, qlen))
            query[pos] = 1 + (query[pos] % 4)
        seeds = []
        cursor = 0
        while cursor + 8 < qlen and len(seeds) < 6:
            length = int(rng.integers(8, min(22, qlen - cursor)))
            seeds.append(
                Seed(
                    query_position=cursor,
                    length=length,
                    num_errors=int(rng.integers(0, 3)),
                    pex_leaf_index=len(seeds),
                )
            )
            cursor += length
        jobs.append((seeds, query))

    with mock.patch.dict(os.environ, {"FLOXER_TPU_SEARCH_FIBERS": "1"}):
        recursive = searcher.search_seeds_many(jobs)
    with mock.patch.dict(os.environ, {"FLOXER_TPU_SEARCH_FIBERS": fibers}):
        fiber = searcher.search_seeds_many(jobs)
    for a, b in zip(recursive, fiber):
        _equal_results(a, b)
