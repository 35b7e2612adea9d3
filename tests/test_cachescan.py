"""Native cache scan vs the VerifiedIntervals Python mirror.

floxer_cache_scan (native/cachescan.cpp) must reproduce, walk for walk, the
decisions of a sequential pass that checks each walk's trimmed root
interval against a per-key VerifiedIntervals cache and inserts according to
the walk's state — the logic of verify_batch's simulation/bookkeeping
passes (reference semantics: verification.cpp:119-136, intervals.cpp:84-127).
"""

import numpy as np
import pytest

from floxer_tpu.intervals import HalfOpenInterval, VerifiedIntervals


def _python_scan(seg_slices, sorted_ids, trim, ins, state, enabled):
    """Mirror of the native contract: two caches distinguish coverage by
    CONFIRMED intervals (from computed walks, state 2) from coverage that
    rests only on optimistic insertions (states 0/1) — the latter marks
    still-uncomputed walks as at-risk (flag 4) for cascade speculation."""
    flags = np.full(state.shape[0], 255, dtype=np.uint8)
    need = 0
    for begin, end in seg_slices:
        all_cache = VerifiedIntervals(enabled)
        conf_cache = VerifiedIntervals(enabled)
        for k in range(begin, end):
            w = int(sorted_ids[k])
            target = HalfOpenInterval(int(trim[0][w]), int(trim[1][w]))
            if conf_cache.contains(target):
                flags[w] = 0
                continue
            if all_cache.contains(target):
                flags[w] = 4 if state[w] == 0 else 0
                continue
            interval = HalfOpenInterval(int(ins[0][w]), int(ins[1][w]))
            if state[w] == 0:
                flags[w] = 1
                need += 1
                all_cache.insert(interval)
            elif state[w] == 1:
                flags[w] = 2
                all_cache.insert(interval)
            elif state[w] == 2:
                flags[w] = 2
                all_cache.insert(interval)
                conf_cache.insert(interval)
            else:
                flags[w] = 2
    return need, flags


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("enabled", [True, False])
def test_cache_scan_matches_python(seed, enabled):
    from floxer_tpu.native import get_library, native_cache_scan

    if get_library() is None:
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(seed)
    n = 4000
    num_keys = 17

    # overlapping same-scale intervals like root spans of one locus cluster
    starts = rng.integers(0, 50_000, size=n).astype(np.int64)
    lengths = rng.integers(200, 800, size=n).astype(np.int64)
    extra = rng.integers(0, 40, size=n).astype(np.int64)
    ins_lo = starts
    ins_hi = starts + lengths
    # trim_from_both_sides semantics (keep >= 1 element)
    he = np.where(extra > ins_hi, 0, ins_hi - extra)
    trim_hi = np.maximum(ins_lo + 1, he)
    trim_lo = np.minimum(trim_hi - 1, ins_lo + extra)

    state = rng.integers(0, 4, size=n).astype(np.uint8)
    key_of = rng.integers(0, num_keys, size=n)
    order = np.argsort(key_of, kind="stable").astype(np.int64)
    boundaries = np.searchsorted(key_of[order], np.arange(num_keys + 1))
    seg_begin = boundaries[:-1].astype(np.int64)
    seg_end = boundaries[1:].astype(np.int64)

    got = native_cache_scan(
        seg_begin, seg_end, order, trim_lo, trim_hi, ins_lo, ins_hi,
        state, enabled,
    )
    assert got is not None
    need, flags = got
    want_need, want_flags = _python_scan(
        list(zip(seg_begin, seg_end)), order,
        (trim_lo, trim_hi), (ins_lo, ins_hi), state, enabled,
    )
    assert need == want_need
    assert np.array_equal(flags, want_flags)
