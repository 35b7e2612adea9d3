"""Pallas banded Myers kernel vs the word-level mirror and the full DP
oracle (interpret mode on CPU)."""

import numpy as np
import pytest

from floxer_tpu.ops.device_dp import pad_batch
from floxer_tpu.ops.dp_reference import _rightmost_argmin, semi_global_dp_matrix
from floxer_tpu.ops.myers_banded import band_store_bits, myers_banded_np
from floxer_tpu.ops.pallas_myers_banded import myers_pallas_banded


def full_oracle(pattern, text):
    dp = semi_global_dp_matrix(text, pattern)
    last = dp[-1]
    end = _rightmost_argmin(last)
    return int(last[end]), end


def run_batch(patterns, texts, budgets):
    txt, tlen = pad_batch(texts)
    band_bits = max(
        band_store_bits(len(p), len(t), int(k))
        for p, t, k in zip(patterns, texts, budgets)
    )
    band_words = -(-band_bits // 32)
    band_words = -(-band_words // 128) * 128
    return myers_pallas_banded(
        patterns, txt, tlen, np.asarray(budgets), band_words
    )


@pytest.mark.parametrize("seed", range(3))
def test_matches_mirror_and_oracle(seed):
    rng = np.random.default_rng(seed)
    patterns, texts, budgets = [], [], []
    for _ in range(10):
        m = int(rng.integers(60, 500))
        budget = int(rng.integers(1, max(2, m // 5)))
        extra = int(rng.integers(0, budget + 2))
        n = m + 2 * budget + 1 + extra
        text = rng.integers(1, 5, size=n).astype(np.uint8)
        start = int(rng.integers(0, n - m))
        pattern = text[start : start + m].copy()
        for _ in range(int(rng.integers(0, budget + 2))):
            op = rng.integers(0, 3)
            pos = int(rng.integers(0, len(pattern)))
            if op == 0:
                pattern[pos] = 1 + (pattern[pos] % 4)
            elif op == 1 and len(pattern) > 10:
                pattern = np.delete(pattern, pos)
            else:
                pattern = np.insert(pattern, pos, rng.integers(1, 5))
        if budget >= len(pattern):
            continue
        patterns.append(pattern)
        texts.append(text)
        budgets.append(budget)

    dist, end = run_batch(patterns, texts, budgets)
    for i, (pattern, text, budget) in enumerate(
        zip(patterns, texts, budgets)
    ):
        want = myers_banded_np(pattern, text, budget)
        got = (int(dist[i]), int(end[i]))
        # the kernel freezes the band at row m instead of sliding past it,
        # so it can only be MORE exact than the mirror; both must satisfy
        # the full-DP contract
        full_d, full_e = full_oracle(pattern, text)
        if full_d <= budget:
            assert got == (full_d, full_e), f"row {i}"
            assert want == (full_d, full_e), f"mirror row {i}"
        else:
            assert got[0] > budget, f"row {i} false accept"


def test_mixed_band_sizes_one_bucket():
    """Tasks with different m, n, budget share one padded call."""
    rng = np.random.default_rng(7)
    patterns, texts, budgets = [], [], []
    for m, budget in [(70, 3), (300, 20), (512, 33), (130, 1), (95, 12)]:
        n = m + 2 * budget + 1 + int(rng.integers(0, 30))
        text = rng.integers(1, 5, size=n).astype(np.uint8)
        start = int(rng.integers(0, n - m))
        pattern = text[start : start + m].copy()
        for _ in range(budget // 2):
            pos = int(rng.integers(0, m))
            pattern[pos] = 1 + (pattern[pos] % 4)
        patterns.append(pattern)
        texts.append(text)
        budgets.append(budget)
    dist, end = run_batch(patterns, texts, budgets)
    for i, (pattern, text, budget) in enumerate(
        zip(patterns, texts, budgets)
    ):
        full_d, full_e = full_oracle(pattern, text)
        assert full_d <= budget
        assert (int(dist[i]), int(end[i])) == (full_d, full_e), f"row {i}"
