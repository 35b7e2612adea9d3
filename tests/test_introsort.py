"""utils/introsort.py must reproduce libstdc++ std::sort bit-exactly.

The reference orders anchor groups with std::ranges::sort and, for
errors_first, a degenerate non-SWO comparator (search.cpp:215-223) whose
output is defined by the introsort implementation. The Python replica and
the native std::sort path must agree on EVERY input, including heavy ties
(where even the valid count_first comparator's result is tie-order
dependent) and sizes that cross the threshold-16 / heapsort-fallback
regimes."""

import numpy as np
import pytest

from floxer_tpu.native import get_library, native_sort_groups_probe
from floxer_tpu.utils.introsort import (
    count_first_comp,
    errors_first_comp,
    std_sort,
)


def _python_perm(counts, errors, order_code):
    comp = count_first_comp if order_code == 0 else errors_first_comp
    idx = list(range(len(counts)))
    std_sort(
        idx,
        lambda a, b: comp(
            (counts[a], errors[a]), (counts[b], errors[b])
        ),
    )
    return np.array(idx, dtype=np.int32)


needs_native = pytest.mark.skipif(
    get_library() is None, reason="native library unavailable"
)


@needs_native
@pytest.mark.parametrize("order_code", [0, 1])
def test_replica_matches_std_sort_fuzz(order_code):
    rng = np.random.default_rng(9000 + order_code)
    # sizes around every algorithmic boundary: empty, 1, threshold 16/17,
    # powers of two, and sizes large enough to recurse several levels
    sizes = [0, 1, 2, 3, 15, 16, 17, 31, 32, 33, 64, 100, 127, 128, 500]
    for size in sizes:
        for trial in range(8):
            # few distinct values => massive tie groups, the hard case
            distinct = int(rng.integers(1, 6))
            counts = rng.integers(1, 1 + distinct, size=size).astype(np.int64)
            errors = rng.integers(0, 3, size=size).astype(np.int64)
            want = native_sort_groups_probe(counts, errors, order_code)
            got = _python_perm(counts, errors, order_code)
            assert np.array_equal(got, want), (
                f"order={order_code} size={size} trial={trial}\n"
                f"counts={counts.tolist()}\nerrors={errors.tolist()}\n"
                f"want={want.tolist()}\ngot={got.tolist()}"
            )


@needs_native
def test_replica_matches_std_sort_adversarial_patterns(order_code=1):
    """Patterns that historically distinguish sort implementations:
    sorted, reverse-sorted, organ-pipe, all-equal, single swap."""
    n = 200
    base = np.arange(n, dtype=np.int64)
    patterns = [
        base.copy(),
        base[::-1].copy(),
        np.concatenate([base[: n // 2], base[: n // 2][::-1]]),
        np.zeros(n, dtype=np.int64),
        np.concatenate([[5], np.ones(n - 1, dtype=np.int64)]),
    ]
    rng = np.random.default_rng(77)
    for counts in patterns:
        for order_code in (0, 1):
            errors = rng.integers(0, 3, size=len(counts)).astype(np.int64)
            want = native_sort_groups_probe(counts, errors, order_code)
            got = _python_perm(counts, errors, order_code)
            assert np.array_equal(got, want)


@needs_native
def test_heapsort_fallback_regime():
    """Force the depth-limit heapsort: many equal elements make
    median-of-3 quicksort degenerate, so large all-tied inputs recurse to
    the 2*lg(n) limit and exercise __make_heap/__sort_heap."""
    rng = np.random.default_rng(123)
    for size in (600, 2048):
        counts = np.ones(size, dtype=np.int64)
        counts[rng.integers(0, size, 5)] = 2
        errors = rng.integers(0, 2, size=size).astype(np.int64)
        for order_code in (0, 1):
            want = native_sort_groups_probe(counts, errors, order_code)
            got = _python_perm(counts, errors, order_code)
            assert np.array_equal(got, want)
