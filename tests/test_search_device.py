"""Device frontier search vs the host DFS: identical group sets."""

import numpy as np
import pytest

from floxer_tpu.index.device_index import DeviceIndex
from floxer_tpu.index.fmindex import FmIndex
from floxer_tpu.schemes import expand_scheme
from floxer_tpu.search_device import search_seeds_device
from floxer_tpu.search_host import search_seed_groups


@pytest.fixture(scope="module")
def indexes():
    rng = np.random.default_rng(17)
    sequences = [
        rng.integers(1, 5, size=3000).astype(np.uint8),
        rng.integers(1, 5, size=900).astype(np.uint8),
    ]
    host = FmIndex(sequences)
    return host, DeviceIndex.from_host(host), sequences


@pytest.mark.parametrize("k", [0, 1, 2])
def test_device_groups_match_host_set(indexes, k):
    host, device, sequences = indexes
    rng = np.random.default_rng(100 + k)

    length = 14
    patterns = []
    for trial in range(8):
        source = sequences[trial % 2]
        start = int(rng.integers(0, len(source) - length))
        pattern = source[start : start + length].copy()
        for _ in range(int(rng.integers(0, k + 1))):
            pos = int(rng.integers(0, length))
            pattern[pos] = 1 + (pattern[pos] % 4)
        patterns.append(pattern)

    expanded = expand_scheme(k, length)
    device_groups, overflow = search_seeds_device(
        device, patterns, k, expanded
    )
    assert not overflow.any()

    for i, pattern in enumerate(patterns):
        host_groups, _, aborted = search_seed_groups(
            host, pattern, k, 1 << 30, allow_native=False
        )
        assert not aborted
        # lb_rev is excluded: the same (lb, len) interval reached through
        # different edit variants can carry different (equally valid)
        # reverse intervals, and lb_rev is never used after reporting
        want = sorted(
            (g.cursor.lb, g.cursor.length, g.num_errors) for g in host_groups
        )
        got = sorted((lb, ln, er) for lb, _, ln, er in device_groups[i])
        assert got == want, f"seed {i}: {got} != {want}"


def test_device_search_homopolymer(indexes):
    """Repetitive seed: many groups, still an exact set match."""
    host, device, sequences = indexes
    pattern = np.array([2, 2, 2, 2, 2, 2, 2, 2], dtype=np.uint8)
    expanded = expand_scheme(1, len(pattern))
    device_groups, overflow = search_seeds_device(
        device, [pattern], 1, expanded
    )
    assert not overflow.any()
    host_groups, _, _ = search_seed_groups(
        host, pattern, 1, 1 << 30, allow_native=False
    )
    want = sorted(
        (g.cursor.lb, g.cursor.length, g.num_errors) for g in host_groups
    )
    assert sorted((lb, ln, er) for lb, _, ln, er in device_groups[0]) == want


def test_device_search_k3(indexes):
    host, device, sequences = indexes
    from floxer_tpu.schemes import expand_scheme

    rng = np.random.default_rng(7)
    length = 18
    patterns = []
    for trial in range(4):
        source = sequences[trial % 2]
        start = int(rng.integers(0, len(source) - length))
        pattern = source[start : start + length].copy()
        for _ in range(3):
            pos = int(rng.integers(0, length))
            pattern[pos] = 1 + (pattern[pos] % 4)
        patterns.append(pattern)

    expanded = expand_scheme(3, length)
    device_groups, overflow = search_seeds_device(
        device, patterns, 3, expanded,
        frontier_capacity=1 << 16, report_capacity=1 << 13,
    )
    for i, pattern in enumerate(patterns):
        if overflow[i]:
            continue
        host_groups, _, _ = search_seed_groups(
            host, pattern, 3, 1 << 30, allow_native=False
        )
        want = sorted(
            (g.cursor.lb, g.cursor.length, g.num_errors) for g in host_groups
        )
        got = sorted((lb, ln, er) for lb, _, ln, er in device_groups[i])
        assert got == want, f"seed {i}"
