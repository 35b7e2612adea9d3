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
