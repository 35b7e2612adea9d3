"""Native SA-IS vs the numpy prefix-doubling oracle."""

import numpy as np
import pytest

from floxer_tpu.index.fmindex import _suffix_array_doubling
from floxer_tpu.native import native_suffix_array


@pytest.fixture(scope="module")
def lib_available():
    probe = native_suffix_array(np.array([1, 2, 1], dtype=np.uint8))
    if probe is None:
        pytest.skip("native toolchain unavailable")
    return True


@pytest.mark.parametrize("seed,size", [(0, 50), (1, 500), (2, 5000), (3, 40000)])
def test_sais_matches_doubling(lib_available, seed, size):
    rng = np.random.default_rng(seed)
    # multi-sequence concatenation with internal separators, like the index
    text = rng.integers(1, 6, size=size).astype(np.uint8)
    for cut in rng.integers(0, size, size=3):
        text[cut] = 0
    text[-1] = 0
    got = native_suffix_array(text)
    want = _suffix_array_doubling(text)
    assert np.array_equal(got, want)


def test_sais_repetitive(lib_available):
    # homopolymers and tandem repeats stress the LMS naming
    text = np.array(
        [1] * 50 + [0] + [1, 2] * 40 + [0] + [3] * 30 + [0], dtype=np.uint8
    )
    got = native_suffix_array(text)
    want = _suffix_array_doubling(text)
    assert np.array_equal(got, want)


@pytest.mark.parametrize(
    "seed,m,num_errors",
    [
        # multi-word band, below the vectorized fill's W >= 16 threshold
        (9, 3000, 120),
        # wide band (distance ~600 -> ~19 words): exercises the AVX-512
        # column fill when the host supports it
        (11, 4000, 700),
    ],
)
def test_native_traceback_root_scale_matches_oracle(seed, m, num_errors):
    """The Myers-fill fast path at a root-like shape (large pattern, high
    distance) must emit byte-identical CIGARs to the python oracle."""
    import floxer_tpu.native as nat
    from floxer_tpu.native import native_banded_traceback
    from floxer_tpu.ops import dp_reference

    if nat.get_library() is None:
        import pytest

        pytest.skip("native library unavailable")

    rng = np.random.default_rng(seed)
    n = m + 500
    text = rng.integers(1, 5, size=n).astype(np.uint8)
    pattern = text[200 : 200 + m].copy()
    idx = rng.integers(0, m, size=num_errors)
    pattern[idx] = 1 + (pattern[idx] % 4)
    dp = dp_reference.semi_global_dp_matrix(text, pattern)
    last = dp[-1]
    end = dp_reference._rightmost_argmin(last)
    d = int(last[end])
    assert d > 60  # exercises a multi-word band

    saved = nat.native_banded_traceback
    nat.native_banded_traceback = lambda *a: None
    try:
        want = dp_reference.banded_cigar_traceback(text, pattern, end, d)
    finally:
        nat.native_banded_traceback = saved
    got = native_banded_traceback(text, pattern, end, d)
    assert got is not None
    assert got[0] == want[0]
    assert list(got[1]) == list(want[1])


def test_native_myers_distance_batch_matches_numpy_oracle():
    """myers_host.cpp vs semi_global_dp_matrix + _rightmost_argmin: exact
    (distance, end) for random tasks incl. multi-word patterns, tiny
    windows, N chars, and the flush-column exclusion."""
    import numpy as np

    from floxer_tpu.native import get_library, native_myers_distance_batch
    from floxer_tpu.ops import dp_reference

    if get_library() is None:
        import pytest

        pytest.skip("native toolchain unavailable")

    rng = np.random.default_rng(42)
    windows, patterns = [], []
    for trial in range(60):
        n = int(rng.integers(1, 400))
        m = int(rng.integers(1, 200))
        window = rng.integers(1, 6, size=n).astype(np.uint8)
        if trial % 3 == 0 and n > m:
            start = int(rng.integers(0, n - m))
            pattern = window[start : start + m].copy()
            for _ in range(int(rng.integers(0, 6))):
                pos = int(rng.integers(0, m))
                pattern[pos] = 1 + (pattern[pos] % 5)  # may produce N=5
        else:
            pattern = rng.integers(1, 6, size=m).astype(np.uint8)
        windows.append(window)
        patterns.append(pattern)
    # edge shapes: single-char window (only end 0 eligible), pattern of
    # exactly 64/65 rows (word boundary)
    windows.append(np.array([1], dtype=np.uint8))
    patterns.append(np.array([1, 2, 3], dtype=np.uint8))
    windows.append(rng.integers(1, 5, size=200).astype(np.uint8))
    patterns.append(rng.integers(1, 5, size=64).astype(np.uint8))
    windows.append(rng.integers(1, 5, size=200).astype(np.uint8))
    patterns.append(rng.integers(1, 5, size=65).astype(np.uint8))

    out = native_myers_distance_batch(windows, patterns, num_threads=3)
    assert out is not None
    dist, end = out
    for i, (window, pattern) in enumerate(zip(windows, patterns)):
        dp = dp_reference.semi_global_dp_matrix(window, pattern)
        last = dp[-1]
        want_end = dp_reference._rightmost_argmin(last)
        assert int(dist[i]) == int(last[want_end]), i
        assert int(end[i]) == want_end, i


def test_native_myers_banded_matches_mirror_and_full():
    """The banded branch of floxer_myers_distance_batch vs the pinned numpy
    banded mirror AND (for accepting tasks) the full-DP oracle."""
    import numpy as np

    from floxer_tpu.native import get_library, native_myers_distance_batch
    from floxer_tpu.ops import dp_reference
    from floxer_tpu.ops.myers_banded import myers_banded_np

    if get_library() is None:
        import pytest

        pytest.skip("native toolchain unavailable")

    rng = np.random.default_rng(7)
    windows, patterns, budgets = [], [], []
    for trial in range(40):
        m = int(rng.integers(150, 500))
        budget = int(rng.integers(1, 30))
        extra = int(rng.integers(0, 3 * budget))
        n = m + extra  # band n-m+2k+1 << m: banded branch engages
        window = rng.integers(1, 5, size=n).astype(np.uint8)
        start = int(rng.integers(0, max(1, n - m)))
        pattern = window[start : start + m].copy()
        for _ in range(int(rng.integers(0, 2 * budget))):
            pos = int(rng.integers(0, m))
            pattern[pos] = 1 + (pattern[pos] % 4)
        windows.append(window)
        patterns.append(pattern)
        budgets.append(budget)

    out = native_myers_distance_batch(
        windows, patterns, num_threads=3, budgets=budgets
    )
    assert out is not None
    dist, end = out
    for i, (window, pattern, budget) in enumerate(
        zip(windows, patterns, budgets)
    ):
        want_d, want_e = myers_banded_np(pattern, window, budget)
        assert (int(dist[i]), int(end[i])) == (want_d, want_e), i
        if want_d <= budget:  # exactness contract vs the full DP
            dp = dp_reference.semi_global_dp_matrix(window, pattern)
            last = dp[-1]
            full_e = dp_reference._rightmost_argmin(last)
            assert int(dist[i]) == int(last[full_e]), i
            assert int(end[i]) == full_e, i
