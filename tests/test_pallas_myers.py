"""Pallas Myers kernel (interpret mode on CPU) vs the DP oracle."""

import numpy as np
import pytest

from floxer_tpu.ops.device_dp import pad_batch
from floxer_tpu.ops.dp_reference import _rightmost_argmin, semi_global_dp_matrix
from floxer_tpu.ops.pallas_myers import myers_pallas


def oracle(pattern, text):
    dp = semi_global_dp_matrix(text, pattern)
    last = dp[-1]
    end = _rightmost_argmin(last)
    return int(last[end]), end


@pytest.mark.parametrize("seed,max_m", [(0, 30), (1, 90)])
def test_pallas_myers_matches_oracle(seed, max_m):
    rng = np.random.default_rng(seed)
    patterns = []
    texts = []
    for _ in range(7):
        m = int(rng.integers(2, max_m))
        n = int(rng.integers(m, m + 40))
        text = rng.integers(1, 5, size=n).astype(np.uint8)
        start = int(rng.integers(0, max(1, n - m)))
        pattern = text[start : start + m].copy()
        for _ in range(int(rng.integers(0, 3))):
            pos = int(rng.integers(0, len(pattern)))
            pattern[pos] = 1 + (pattern[pos] % 4)
        patterns.append(pattern)
        texts.append(text)

    pat, pat_len = pad_batch(patterns)
    txt, txt_len = pad_batch(texts)
    distance, end = myers_pallas(pat, pat_len, txt, txt_len)

    for i, (pattern, text) in enumerate(zip(patterns, texts)):
        want_distance, want_end = oracle(pattern, text)
        assert distance[i] == want_distance, f"row {i}"
        assert end[i] == want_end, f"row {i} end"
