"""Device FM-index gathers vs the host index."""

import numpy as np
import jax.numpy as jnp

from floxer_tpu.index.device_index import (
    DeviceIndex,
    extend_left_all,
    extend_right_all,
    locate_batch,
    rank_all,
)
from floxer_tpu.index.fmindex import FmIndex


def _make_index(seed=5):
    rng = np.random.default_rng(seed)
    sequences = [
        rng.integers(1, 5, size=257).astype(np.uint8),
        rng.integers(1, 5, size=101).astype(np.uint8),
    ]
    return FmIndex(sequences), sequences


def test_rank_all_matches_host():
    host, _ = _make_index()
    device = DeviceIndex.from_host(host)
    rng = np.random.default_rng(0)
    positions = rng.integers(0, host.n + 1, size=64).astype(np.int32)
    got = np.asarray(rank_all(device.fwd, jnp.asarray(positions)))
    for i, pos in enumerate(positions):
        want = host.fwd.occ_all(int(pos))
        assert np.array_equal(got[i], want), f"position {pos}"


def test_extend_matches_host():
    host, sequences = _make_index()
    device = DeviceIndex.from_host(host)

    cursor = host.root_cursor()
    pattern = sequences[0][40:52]
    for symbol in reversed(pattern[4:]):
        cursor = host.extend_left(cursor, int(symbol))

    lb = jnp.asarray([cursor.lb], dtype=jnp.int32)
    lb_rev = jnp.asarray([cursor.lb_rev], dtype=jnp.int32)
    length = jnp.asarray([cursor.length], dtype=jnp.int32)

    new_lb, new_lb_rev, counts = extend_left_all(device, lb, lb_rev, length)
    host_children = host.extend_left_all(cursor)
    for s, child in enumerate(host_children):
        assert int(counts[0, s]) == child.length
        if child.length > 0:
            assert int(new_lb[0, s]) == child.lb
            assert int(new_lb_rev[0, s]) == child.lb_rev

    new_lb, new_lb_rev, counts = extend_right_all(device, lb, lb_rev, length)
    host_children = host.extend_right_all(cursor)
    for s, child in enumerate(host_children):
        assert int(counts[0, s]) == child.length
        if child.length > 0:
            assert int(new_lb[0, s]) == child.lb
            assert int(new_lb_rev[0, s]) == child.lb_rev


def test_locate_batch_matches_host():
    host, _ = _make_index()
    device = DeviceIndex.from_host(host)
    rng = np.random.default_rng(1)
    rows = rng.integers(0, host.n, size=128).astype(np.int32)
    seq_ids, positions = locate_batch(device, jnp.asarray(rows))
    seq_ids = np.asarray(seq_ids)
    positions = np.asarray(positions)
    for i, row in enumerate(rows):
        want_seq, want_pos = host.locate(int(row))
        assert (seq_ids[i], positions[i]) == (want_seq, want_pos), f"row {row}"


def test_rank_all_planes_matches_dense():
    """Bit-plane rank (population_count path) == dense one-hot rank at
    every position incl. block boundaries and n itself."""
    from floxer_tpu.index.device_index import _rank_all_dense

    rng = np.random.default_rng(5)
    seqs = [rng.integers(1, 6, size=517).astype(np.uint8)]
    host = FmIndex(seqs)
    device = DeviceIndex.from_host(host)
    assert device.fwd.planes is not None
    n = host.fwd.bwt.shape[0]
    positions = np.unique(
        np.concatenate(
            [
                rng.integers(0, n + 1, size=256),
                np.arange(0, n + 1, 128),
                np.array([0, 1, 31, 32, 33, 63, 64, 127, 128, 129, n]),
            ]
        )
    ).astype(np.int32)
    got = np.asarray(rank_all(device.fwd, jnp.asarray(positions)))
    want = np.asarray(
        _rank_all_dense(
            device.fwd.bwt, device.fwd.occ, jnp.asarray(positions)
        )
    )
    assert np.array_equal(got, want)
