"""Device batched DP vs the numpy oracle on random ragged batches."""

import numpy as np
import pytest

from floxer_tpu.ops.device_dp import (
    batched_exists,
    batched_semi_global_distance,
    pad_batch,
)
from floxer_tpu.ops.dp_reference import (
    _rightmost_argmin,
    semi_global_dp_matrix,
)


def oracle(pattern, text):
    dp = semi_global_dp_matrix(text, pattern)
    last = dp[-1]
    end = _rightmost_argmin(last)
    return int(last[end]), end


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_batched_distance_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    patterns = []
    texts = []
    for _ in range(17):
        m = int(rng.integers(3, 40))
        n = int(rng.integers(m, m + 30))
        text = rng.integers(1, 5, size=n).astype(np.uint8)
        if rng.random() < 0.7:
            # plant a noisy copy of a text substring as the pattern
            start = int(rng.integers(0, max(1, n - m)))
            pattern = text[start : start + m].copy()
            for _ in range(int(rng.integers(0, 3))):
                pos = int(rng.integers(0, len(pattern)))
                pattern[pos] = 1 + (pattern[pos] % 4)
        else:
            pattern = rng.integers(1, 5, size=m).astype(np.uint8)
        patterns.append(pattern)
        texts.append(text)

    pat, pat_len = pad_batch(patterns)
    txt, txt_len = pad_batch(texts)
    distance, end = batched_semi_global_distance(pat, pat_len, txt, txt_len)
    distance = np.asarray(distance)
    end = np.asarray(end)

    for i, (pattern, text) in enumerate(zip(patterns, texts)):
        want_distance, want_end = oracle(pattern, text)
        assert distance[i] == want_distance, f"row {i}"
        assert end[i] == want_end, f"row {i} end"


def test_batched_exists():
    patterns = [np.array([1, 2, 3, 4], dtype=np.uint8)]
    texts = [np.array([4, 1, 2, 3, 4, 2, 2], dtype=np.uint8)]
    pat, pat_len = pad_batch(patterns)
    txt, txt_len = pad_batch(texts)
    assert bool(batched_exists(pat, pat_len, txt, txt_len, 0)[0])
    patterns = [np.array([1, 1, 1, 1], dtype=np.uint8)]
    pat, pat_len = pad_batch(patterns)
    assert not bool(batched_exists(pat, pat_len, txt, txt_len, 0)[0])
    assert bool(batched_exists(pat, pat_len, txt, txt_len, 3)[0])
