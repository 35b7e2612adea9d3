"""FM-index construction, cursors and locate against naive oracles."""

import numpy as np
import pytest

from floxer_tpu.index.fmindex import FmIndex, suffix_array
from floxer_tpu.search_host import search_seed_groups


def naive_suffix_array(text):
    n = len(text)
    suffixes = sorted(range(n), key=lambda i: tuple(text[i:]))
    return np.array(suffixes, dtype=np.int64)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_suffix_array_matches_naive(seed):
    rng = np.random.default_rng(seed)
    text = rng.integers(0, 6, size=200).astype(np.uint8)
    # make all suffixes distinct like the real concatenated text
    text[-1] = 0
    assert suffix_array(text).tolist() == naive_suffix_array(text).tolist()


def _count_occurrences(haystacks, needle):
    count = 0
    positions = []
    for seq_id, hay in enumerate(haystacks):
        hay = list(hay)
        for i in range(len(hay) - len(needle) + 1):
            if hay[i : i + len(needle)] == list(needle):
                count += 1
                positions.append((seq_id, i))
    return count, positions


def test_exact_search_and_locate():
    rng = np.random.default_rng(7)
    sequences = [
        rng.integers(1, 5, size=300).astype(np.uint8),
        rng.integers(1, 5, size=150).astype(np.uint8),
    ]
    index = FmIndex(sequences)

    for length in (4, 6, 9):
        for trial in range(20):
            seq = sequences[trial % 2]
            start = int(rng.integers(0, len(seq) - length))
            pattern = seq[start : start + length]
            _, expected_positions = _count_occurrences(sequences, pattern)

            cursor = index.root_cursor()
            for symbol in reversed(pattern):
                cursor = index.extend_left(cursor, int(symbol))
            assert cursor.length == len(expected_positions)

            located = sorted(
                index.locate(cursor.lb + i) for i in range(cursor.length)
            )
            assert located == sorted(expected_positions)


def test_extend_right_matches_extend_left():
    rng = np.random.default_rng(3)
    sequences = [rng.integers(1, 5, size=400).astype(np.uint8)]
    index = FmIndex(sequences)

    pattern = sequences[0][37:45]
    left = index.root_cursor()
    for symbol in reversed(pattern):
        left = index.extend_left(left, int(symbol))
    right = index.root_cursor()
    for symbol in pattern:
        right = index.extend_right(right, int(symbol))
    # both directions must find the same interval of the forward index
    assert (left.lb, left.length) == (right.lb, right.length)


def test_bidirectional_mixed_extension():
    rng = np.random.default_rng(11)
    sequences = [rng.integers(1, 5, size=500).astype(np.uint8)]
    index = FmIndex(sequences)
    seq = sequences[0]

    # grow a pattern outward from the middle, alternating directions
    mid = 200
    cursor = index.root_cursor()
    cursor = index.extend_right(cursor, int(seq[mid]))
    left_pos, right_pos = mid, mid + 1
    for step in range(8):
        if step % 2 == 0:
            cursor = index.extend_right(cursor, int(seq[right_pos]))
            right_pos += 1
        else:
            left_pos -= 1
            cursor = index.extend_left(cursor, int(seq[left_pos]))
    pattern = seq[left_pos:right_pos]
    _, expected = _count_occurrences(sequences, pattern)
    assert cursor.length == len(expected)
    located = sorted(index.locate(cursor.lb + i) for i in range(cursor.length))
    assert located == sorted(expected)


def _edit_distance(a, b):
    m, n = len(a), len(b)
    dp = np.zeros((m + 1, n + 1), dtype=np.int32)
    dp[:, 0] = np.arange(m + 1)
    dp[0, :] = np.arange(n + 1)
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            dp[i, j] = min(
                dp[i - 1, j - 1] + (a[i - 1] != b[j - 1]),
                dp[i - 1, j] + 1,
                dp[i, j - 1] + 1,
            )
    return int(dp[m, n])


def _approximate_match_starts(haystack, needle, k):
    """All positions p such that some substring starting at p is within
    edit distance k of the needle."""
    hay = list(haystack)
    starts = set()
    for p in range(len(hay)):
        for length in range(
            max(0, len(needle) - k), min(len(needle) + k, len(hay) - p) + 1
        ):
            if _edit_distance(list(needle), hay[p : p + length]) <= k:
                starts.add(p)
                break
    return starts


@pytest.mark.parametrize("k", [1, 2])
def test_scheme_search_exactness(k):
    """Every location matching within k errors must be discoverable from the
    reported anchor groups — the reference's central exactness property
    (README.md:10)."""
    rng = np.random.default_rng(23 + k)
    sequences = [rng.integers(1, 5, size=400).astype(np.uint8)]
    index = FmIndex(sequences)
    seq = sequences[0]

    for trial in range(10):
        start = int(rng.integers(0, 380))
        pattern = seq[start : start + 12].copy()
        # plant k edits
        for _ in range(k):
            pos = int(rng.integers(0, len(pattern)))
            pattern[pos] = 1 + (pattern[pos] - 1 + 1) % 4

        groups, _, aborted = search_seed_groups(index, pattern, k, 10_000)
        assert not aborted

        located_starts = set()
        for group in groups:
            for i in range(group.cursor.length):
                _, pos = index.locate(group.cursor.lb + i)
                located_starts.add(pos)

        expected = _approximate_match_starts(seq, pattern, k)
        # completeness modulo the edit budget: every true match location has a
        # reported anchor within k positions (boundary indels shift the
        # canonical start; PEX verification windows absorb the shift, and
        # erase_useless_anchors removes exactly such near-duplicates)
        for e in expected:
            assert any(abs(p - e) <= k for p in located_starts), (
                f"no anchor near expected match start {e}"
            )
        for p in located_starts:
            assert any(abs(p - e) <= k for e in expected), (
                f"spurious anchor at {p}"
            )


def test_save_load_round_trip_v3(tmp_path):
    """Format-v3 artifact (raw aligned sections, occ rows stored in scan
    layout) loads back to a bit-identical in-RAM index, including odd text
    lengths; packed rows equal the built-from-scratch layout byte for
    byte (the native engines scan them directly)."""
    rng = np.random.default_rng(3)
    sequences = [
        rng.integers(1, 5, size=501).astype(np.uint8),  # odd total with $
        rng.integers(1, 5, size=250).astype(np.uint8),
    ]
    index = FmIndex(sequences)
    path = tmp_path / "idx.npz"
    index.save(path)
    loaded = FmIndex.load(path)
    assert loaded.n == index.n
    assert loaded.sampling_rate == index.sampling_rate
    assert np.array_equal(loaded.text, index.text)
    assert loaded.text.dtype == np.uint8
    for direction in ("fwd", "rev"):
        got, want = getattr(loaded, direction), getattr(index, direction)
        assert np.array_equal(got.packed_rows(), want.packed_rows())
        assert np.array_equal(got.bwt, want.bwt)
        assert got.bwt.dtype == np.uint8
        assert np.array_equal(got.occ_checkpoints, want.occ_checkpoints)
        assert got.occ_checkpoints.dtype == np.int64
    assert np.array_equal(loaded.C, index.C)
    assert np.array_equal(loaded.sampled_rows, index.sampled_rows)
    assert loaded.sampled_rows.dtype == np.int64
    assert np.array_equal(loaded.sampled_values, index.sampled_values)
    assert np.array_equal(loaded.seq_starts, index.seq_starts)
    assert np.array_equal(loaded.seq_lengths, index.seq_lengths)


def test_v3_artifact_size_near_v2(tmp_path):
    """v3 trades the per-section 4 KiB alignment overhead for
    load-time-free scan layout; at any real scale it stays within ~15% of
    the raw packed information (narrow tables, nibble symbols)."""
    rng = np.random.default_rng(9)
    index = FmIndex([rng.integers(1, 5, size=200_000).astype(np.uint8)])
    path = tmp_path / "idx.npz"
    index.save(path)
    n = index.n
    info = (
        n // 2  # text nibbles
        + 2 * (n // 128 + 1) * (6 * 4 + 64)  # occ rows compact
        + 2 * (n // 4 + 1) * 4  # SA samples narrow
    )
    assert path.stat().st_size < info * 1.15


def test_load_v2_artifact(tmp_path):
    """Format-v2 npz artifacts (round-2 builds) still load."""
    rng = np.random.default_rng(5)
    sequences = [
        rng.integers(1, 5, size=501).astype(np.uint8),
        rng.integers(1, 5, size=250).astype(np.uint8),
    ]
    index = FmIndex(sequences)
    path = tmp_path / "idx_v2.npz"
    from floxer_tpu.index.fmindex import _pack_nibbles

    narrow = np.uint32
    np.savez_compressed(
        path,
        format_version=np.int64(2),
        n=np.int64(index.n),
        sampling_rate=np.int64(index.sampling_rate),
        text=_pack_nibbles(index.text),
        seq_starts=index.seq_starts,
        seq_lengths=index.seq_lengths,
        fwd_bwt=_pack_nibbles(index.fwd.bwt),
        fwd_occ=index.fwd.occ_checkpoints.astype(narrow),
        rev_bwt=_pack_nibbles(index.rev.bwt),
        rev_occ=index.rev.occ_checkpoints.astype(narrow),
        C=index.C,
        sampled_rows=index.sampled_rows.astype(narrow),
        sampled_values=index.sampled_values.astype(narrow),
    )
    loaded = FmIndex.load(path)
    assert loaded.n == index.n
    assert np.array_equal(loaded.text, index.text)
    for direction in ("fwd", "rev"):
        got, want = getattr(loaded, direction), getattr(index, direction)
        assert np.array_equal(got.bwt, want.bwt)
        assert np.array_equal(got.occ_checkpoints, want.occ_checkpoints)
    assert np.array_equal(loaded.sampled_rows, index.sampled_rows)
    assert np.array_equal(loaded.sampled_values, index.sampled_values)


def test_load_v1_artifact(tmp_path):
    """Pre-packing artifacts (format_version 1) still load."""
    rng = np.random.default_rng(4)
    sequences = [rng.integers(1, 5, size=300).astype(np.uint8)]
    index = FmIndex(sequences)
    path = tmp_path / "idx_v1.npz"
    np.savez(
        path,
        format_version=np.int64(1),
        sampling_rate=np.int64(index.sampling_rate),
        text=index.text,
        seq_starts=index.seq_starts,
        seq_lengths=index.seq_lengths,
        fwd_bwt=index.fwd.bwt,
        fwd_occ=index.fwd.occ_checkpoints,
        rev_bwt=index.rev.bwt,
        rev_occ=index.rev.occ_checkpoints,
        C=index.C,
        sampled_rows=index.sampled_rows,
        sampled_values=index.sampled_values,
    )
    loaded = FmIndex.load(path)
    assert loaded.n == index.n
    assert np.array_equal(loaded.fwd.bwt, index.fwd.bwt)
    assert np.array_equal(loaded.sampled_values, index.sampled_values)
