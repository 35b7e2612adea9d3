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
