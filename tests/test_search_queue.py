"""Unit tests for the work-queue search's pure host-side pieces.

The device program itself is covered end-to-end by tests/test_search_device.py
(the work queue is the default chunk engine there, including cap replay and
order-exact parity vs the host DFS) and by the CLI e2e suites; these tests
pin the host-side key sort and sizing helpers in isolation."""

import numpy as np

from floxer_tpu.search_queue import key_words_needed, sort_reports


def _row(seed, search, key_nibbles, kw):
    """Report row with the given DFS path nibbles (depth order)."""
    words = [0] * kw
    for depth, nib in enumerate(key_nibbles):
        words[depth // 8] |= nib << (4 * (7 - depth % 8))
    return [1, 2, 3, 0, seed, search] + words


def test_sort_reports_orders_by_seed_search_key():
    kw = 2
    rows = np.array(
        [
            _row(1, 0, [1, 2], kw),
            _row(0, 1, [1], kw),
            _row(0, 0, [2], kw),
            _row(0, 0, [1, 12], kw),  # deeper but earlier branch
            _row(0, 0, [1, 3], kw),
        ],
        dtype=np.int64,
    )
    got = sort_reports(rows)
    order = [(r[4], r[5], tuple(r[6:])) for r in got]
    # seed 0 first; within (0, 0): path [1,3] < [1,12] < [2] in DFS
    # (divergence nibble compares), then (0, 1), then seed 1
    assert [tuple(r[:2]) for r in order] == [
        (0, 0), (0, 0), (0, 0), (0, 1), (1, 0)
    ]
    keys = [r[2] for r in order[:3]]
    assert keys == sorted(keys)
    # the nibble encoding puts earlier depths at more significant bits,
    # so plain uint32 word comparison is lexicographic path comparison
    k13 = _row(0, 0, [1, 3], kw)[6]
    k1_12 = _row(0, 0, [1, 12], kw)[6]
    k2 = _row(0, 0, [2], kw)[6]
    assert np.uint32(k13) < np.uint32(k1_12) < np.uint32(k2)


def test_sort_reports_high_nibble_not_negative():
    """Nibble values >= 8 in word position 0 set the int32 sign bit; the
    sort must compare as uint32 (a kind-12 first edge sorts AFTER kind-1,
    not before)."""
    kw = 1
    rows = np.array(
        [_row(0, 0, [12], kw), _row(0, 0, [1], kw)], dtype=np.int64
    )
    # simulate the device's int32 storage wrapping negative
    rows_int32 = rows.copy()
    rows_int32[:, 6] = rows[:, 6].astype(np.uint32).astype(np.int64)
    got = sort_reports(rows_int32)
    assert got[0][6] == _row(0, 0, [1], kw)[6]


def test_sort_reports_empty():
    empty = np.zeros((0, 7), dtype=np.int64)
    assert sort_reports(empty).shape == (0, 7)


def test_key_words_needed():
    # a path expands at most len + errors times (+2 slack), 8 nibbles/word
    assert key_words_needed(14, 2) == 3
    assert key_words_needed(6, 0) == 1
    assert key_words_needed(62, 2) == -(-(62 + 2 + 2) // 8)
    # chr21 bench seed shape: ~40-char seeds, 3 errors
    assert key_words_needed(40, 3) * 8 >= 45
