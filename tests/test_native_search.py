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
