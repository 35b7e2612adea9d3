"""Pallas large-pattern Myers kernel vs the DP oracle (interpret on CPU)."""

import numpy as np
import pytest

from floxer_tpu.ops.device_dp import pad_batch
from floxer_tpu.ops.dp_reference import _rightmost_argmin, semi_global_dp_matrix
from floxer_tpu.ops.pallas_myers_large import myers_pallas_large


def oracle(pattern, text):
    dp = semi_global_dp_matrix(text, pattern)
    last = dp[-1]
    end = _rightmost_argmin(last)
    return int(last[end]), end


@pytest.mark.parametrize("seed,max_m", [(0, 60), (1, 200)])
def test_pallas_large_matches_oracle(seed, max_m):
    rng = np.random.default_rng(seed)
    patterns, texts = [], []
    for _ in range(5):
        m = int(rng.integers(20, max_m))
        n = int(rng.integers(m, m + 60))
        text = rng.integers(1, 5, size=n).astype(np.uint8)
        start = int(rng.integers(0, max(1, n - m)))
        pattern = text[start : start + m].copy()
        for _ in range(int(rng.integers(0, 5))):
            pos = int(rng.integers(0, len(pattern)))
            pattern[pos] = 1 + (pattern[pos] % 4)
        patterns.append(pattern)
        texts.append(text)

    pat, plen = pad_batch(patterns)
    txt, tlen = pad_batch(texts)
    distance, end = myers_pallas_large(pat, plen, txt, tlen)

    for i, (pattern, text) in enumerate(zip(patterns, texts)):
        want_d, want_e = oracle(pattern, text)
        assert distance[i] == want_d, f"row {i}"
        assert end[i] == want_e, f"row {i}"
