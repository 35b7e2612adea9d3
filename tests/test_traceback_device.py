"""On-device banded CIGAR traceback vs the host/native engine.

The device path (ops/traceback_device.py) must reproduce
dp_reference.banded_cigar_traceback — and therefore native/traceback.cpp
and the full-matrix oracle — byte-identically: same begin, same CIGAR run
list, for every (window, pattern, end_col, distance) the verify stage can
produce, including tie-heavy repeats and distance 0."""

import numpy as np
import pytest

from floxer_tpu.ops import dp_reference
from floxer_tpu.ops.traceback_device import (
    banded_cigar_traceback_device_batch,
)


def _random_task(rng, ref_len, pat_len, mutations):
    """A verify-shaped task: pattern sampled from the window plus edits,
    then (end_col, distance) derived from the true DP like the verify
    kernels report them."""
    window = rng.integers(1, 5, size=ref_len).astype(np.uint8)
    start = int(rng.integers(0, max(ref_len - pat_len, 1)))
    pattern = window[start : start + pat_len].copy()
    for _ in range(mutations):
        kind = int(rng.integers(0, 3))
        pos = int(rng.integers(0, len(pattern)))
        if kind == 0:  # substitution
            pattern[pos] = 1 + (pattern[pos] % 4)
        elif kind == 1 and len(pattern) > 4:  # deletion from pattern
            pattern = np.delete(pattern, pos)
        else:  # insertion into pattern
            pattern = np.insert(pattern, pos, rng.integers(1, 5))
    dp = dp_reference.semi_global_dp_matrix(window, pattern)
    end_col = dp_reference._rightmost_argmin(dp[-1])
    distance = int(dp[-1, end_col])
    return window, pattern, end_col, distance


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_device_traceback_matches_host_fuzz(seed):
    rng = np.random.default_rng(seed)
    tasks = []
    for trial in range(12):
        ref_len = int(rng.integers(40, 200))
        pat_len = int(rng.integers(8, min(ref_len, 90)))
        mutations = int(rng.integers(0, 6))
        tasks.append(_random_task(rng, ref_len, pat_len, mutations))

    got = banded_cigar_traceback_device_batch(
        tasks, m_quantum=32, w_quantum=16, batch=5
    )
    for t, (window, pattern, end_col, distance) in enumerate(tasks):
        want = dp_reference.banded_cigar_traceback(
            window, pattern, end_col, distance
        )
        assert got[t] == want, f"task {t}: {got[t]} != {want}"


def test_device_traceback_tie_heavy_repeats():
    """Homopolymers and tandem repeats maximize DP ties — the tie
    preference (I, diagonal, D) must be reproduced exactly."""
    rng = np.random.default_rng(99)
    tasks = []
    for unit_len in (1, 2, 3):
        unit = rng.integers(1, 5, size=unit_len).astype(np.uint8)
        window = np.tile(unit, 40 // unit_len + 1)[:40]
        pattern = np.tile(unit, 20 // unit_len + 1)[:20].copy()
        pattern[7] = 1 + (pattern[7] % 4)
        dp = dp_reference.semi_global_dp_matrix(window, pattern)
        end_col = dp_reference._rightmost_argmin(dp[-1])
        tasks.append((window, pattern, end_col, int(dp[-1, end_col])))

    got = banded_cigar_traceback_device_batch(
        tasks, m_quantum=32, w_quantum=16
    )
    for t, (window, pattern, end_col, distance) in enumerate(tasks):
        want = dp_reference.banded_cigar_traceback(
            window, pattern, end_col, distance
        )
        assert got[t] == want, f"unit {t}"


def test_batch_verifier_device_traceback_end_to_end(monkeypatch):
    """BatchVerifier with FLOXER_TPU_DEVICE_TRACEBACK=1 must emit the same
    alignments (begin + CIGAR) as the host traceback pool."""
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from test_verify_batch import _as_tuples, _make_workload

    from floxer_tpu.verify import VerificationKind
    from floxer_tpu.verify_batch import BatchVerifier

    references, items = _make_workload(seed=11)

    def run():
        verifier = BatchVerifier(
            references,
            kind=VerificationKind.HIERARCHICAL,
            extra_verification_ratio=0.3,
            without_cigar=False,
            use_interval_optimization=True,
            use_device=False,
        )
        out = verifier.process(items)
        assert not verifier._device_tb_tasks
        return verifier, out

    monkeypatch.setenv("FLOXER_TPU_DEVICE_TRACEBACK", "0")
    _, want = run()

    from floxer_tpu.ops import traceback_device as td

    calls = {"n": 0, "tasks": 0}
    orig = td.banded_cigar_traceback_device_batch

    def counting(tasks, **kwargs):
        calls["n"] += 1
        calls["tasks"] += len(tasks)
        return orig(tasks, **kwargs)

    monkeypatch.setattr(
        td, "banded_cigar_traceback_device_batch", counting
    )
    monkeypatch.setenv("FLOXER_TPU_DEVICE_TRACEBACK", "1")
    verifier, got = run()
    assert calls["tasks"] > 0, "device traceback path was never exercised"
    for qi, (w, g) in enumerate(zip(want, got)):
        assert _as_tuples(w) == _as_tuples(g), f"query {qi}"


def test_device_traceback_exact_and_edges():
    window = np.array([1, 2, 3, 4, 1, 2, 3, 4, 1, 2], dtype=np.uint8)

    # distance 0: band width 1, pure diagonal
    pattern = window[2:7].copy()
    dp = dp_reference.semi_global_dp_matrix(window, pattern)
    end_col = dp_reference._rightmost_argmin(dp[-1])
    tasks = [(window, pattern, end_col, 0)]

    # begin at column 0 (band clipped at the left edge)
    pattern0 = window[:4].copy()
    pattern0[1] = 1 + (pattern0[1] % 4)
    dp0 = dp_reference.semi_global_dp_matrix(window, pattern0)
    end0 = dp_reference._rightmost_argmin(dp0[-1])
    tasks.append((window, pattern0, end0, int(dp0[-1, end0])))

    # pattern longer than window section: forced I runs
    pattern_long = np.concatenate([window[1:8], np.array([1, 1], np.uint8)])
    dpl = dp_reference.semi_global_dp_matrix(window, pattern_long)
    endl = dp_reference._rightmost_argmin(dpl[-1])
    tasks.append((window, pattern_long, endl, int(dpl[-1, endl])))

    got = banded_cigar_traceback_device_batch(
        tasks, m_quantum=8, w_quantum=8
    )
    for t, (win, pat, end_col, distance) in enumerate(tasks):
        want = dp_reference.banded_cigar_traceback(
            win, pat, end_col, distance
        )
        assert got[t] == want, f"edge case {t}"
