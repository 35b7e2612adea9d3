"""Banded sliding-window Myers vs the full DP oracle.

Exactness contract (ops/myers_banded.py docstring): for windows built the
way verification builds them (window length >= m - budget), the banded
result equals the full result — distance AND rightmost-minimal end —
whenever the full distance is <= budget; otherwise banded >= full, so
accept/reject agrees.
"""

import numpy as np
import pytest

from floxer_tpu.ops.dp_reference import _rightmost_argmin, semi_global_dp_matrix
from floxer_tpu.ops.myers_banded import myers_banded_np


def full_oracle(pattern, text):
    dp = semi_global_dp_matrix(text, pattern)
    last = dp[-1]
    end = _rightmost_argmin(last)
    return int(last[end]), end


def check_case(pattern, text, budget):
    want_d, want_e = full_oracle(pattern, text)
    got_d, got_e = myers_banded_np(pattern, text, budget)
    if want_d <= budget:
        assert got_d == want_d, (len(pattern), len(text), budget)
        assert got_e == want_e, (len(pattern), len(text), budget)
    else:
        assert got_d >= want_d > budget


@pytest.mark.parametrize("seed", range(4))
def test_random_verification_shapes(seed):
    """Windows shaped like verification spans: n = m + 2*budget + 1 + extra,
    pattern planted with ~budget edits."""
    rng = np.random.default_rng(seed)
    for _ in range(30):
        m = int(rng.integers(40, 400))
        budget = int(rng.integers(1, max(2, m // 4)))
        extra = int(rng.integers(0, 2 * budget + 2))
        n = m + 2 * budget + 1 + extra
        text = rng.integers(1, 5, size=n).astype(np.uint8)
        start = int(rng.integers(0, n - m))
        pattern = text[start : start + m].copy()
        n_edits = int(rng.integers(0, budget + 3))
        for _ in range(n_edits):
            op = rng.integers(0, 3)
            pos = int(rng.integers(0, len(pattern)))
            if op == 0:
                pattern[pos] = 1 + (pattern[pos] % 4)
            elif op == 1 and len(pattern) > 20:
                pattern = np.delete(pattern, pos)
            else:
                pattern = np.insert(pattern, pos, rng.integers(1, 5))
        if budget >= len(pattern):
            continue
        check_case(pattern, text, budget)


def test_repetitive_adversarial():
    """Repetitive sequences: many near-optimal alignments at shifted
    positions stress the band boundary and the rightmost tie-break."""
    rng = np.random.default_rng(99)
    for period in (1, 2, 3, 7):
        unit = rng.integers(1, 5, size=period).astype(np.uint8)
        for budget in (1, 3, 8):
            m = 24 * period + 5
            text = np.tile(unit, (m + 8 * budget) // period + 2)[: m + 4 * budget]
            pattern = np.tile(unit, m // period + 1)[:m]
            if budget >= m:
                continue
            check_case(pattern, text, budget)
            # with planted noise
            noisy = pattern.copy()
            for _ in range(budget):
                pos = int(rng.integers(0, m))
                noisy[pos] = 1 + (noisy[pos] % 4)
            check_case(noisy, text, budget)


def test_reject_cases():
    """Distances far above budget must still reject (banded may
    overestimate but never underestimates)."""
    rng = np.random.default_rng(5)
    for _ in range(20):
        m = int(rng.integers(50, 200))
        budget = int(rng.integers(1, 10))
        n = m + 2 * budget + 1
        pattern = rng.integers(1, 5, size=m).astype(np.uint8)
        text = rng.integers(1, 5, size=n).astype(np.uint8)
        check_case(pattern, text, budget)


def test_exact_match_and_tiny_budget():
    rng = np.random.default_rng(11)
    for m in (33, 64, 65, 127, 128, 200):
        text = rng.integers(1, 5, size=m + 3).astype(np.uint8)
        pattern = text[1 : 1 + m].copy()
        check_case(pattern, text, 1)
