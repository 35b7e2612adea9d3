"""Device anchor selection vs the native select: bit-identical outputs.

search_select_device.device_select_from_groups_batch must reproduce
native_select_from_groups_batch exactly — statuses, counts, anchor rows
and their order — for every (group order x choice strategy x erase) config
over real FM-index groups, including hard-cap exclusion, empty seeds,
overflow statuses and repetitive seeds with far more groups and rows than
the soft cap."""

import numpy as np
import pytest

from floxer_tpu.index.device_index import DeviceIndex
from floxer_tpu.index.fmindex import FmIndex
from floxer_tpu.native import get_library, native_select_from_groups_batch
from floxer_tpu.search_host import search_seed_groups
from floxer_tpu.search_select_device import device_select_from_groups_batch

pytestmark = pytest.mark.skipif(
    get_library() is None, reason="native library unavailable"
)


@pytest.fixture(scope="module")
def fixture():
    rng = np.random.default_rng(23)
    base = rng.integers(1, 5, size=2000).astype(np.uint8)
    # plant repeats so some seeds have many anchor groups
    motif = base[100:112].copy()
    sequences = []
    for rep in range(2):
        seq = rng.integers(1, 5, size=1500).astype(np.uint8)
        for _ in range(20):
            at = int(rng.integers(0, len(seq) - len(motif)))
            seq[at : at + len(motif)] = motif
        sequences.append(seq)
    sequences.append(base)
    host = FmIndex(sequences)
    device = DeviceIndex.from_host(host)

    # seeds: mix of unique, mutated, repetitive (motif) and junk patterns
    seeds = []
    for trial in range(10):
        src = sequences[trial % len(sequences)]
        start = int(rng.integers(0, len(src) - 12))
        pattern = src[start : start + 12].copy()
        if trial % 3 == 1:
            pattern[int(rng.integers(0, 12))] = 1 + int(rng.integers(0, 4))
        seeds.append((pattern, 1 + trial % 2))
    seeds.append((motif.copy(), 2))  # repetitive: many groups
    seeds.append((np.full(12, 1, dtype=np.uint8), 2))  # homopolymer
    seeds.append((np.array([1, 2, 3, 4] * 3, dtype=np.uint8), 0))

    rows = []
    totals = np.zeros(len(seeds) + 1, dtype=np.int64)  # +1 empty seed
    for gid, (pattern, k) in enumerate(seeds):
        groups, total, aborted = search_seed_groups(
            host, pattern, k, 1 << 30, allow_native=False
        )
        assert not aborted
        totals[gid] = total
        for g in groups:
            rows.append(
                (gid, g.num_errors, g.cursor.lb, g.cursor.length,
                 g.cursor.lb_rev)
            )
    num_seeds = len(seeds) + 1  # the last seed has zero groups
    rows.sort()  # canonical (gid, errors, lb, len) — the device-path order
    rep = np.array(
        [(lb, lbr, ln, er) for _, er, lb, ln, lbr in rows], dtype=np.int64
    ).reshape(-1, 4)
    gid_of_group = np.array([r[0] for r in rows], dtype=np.int64)
    group_counts = np.bincount(gid_of_group, minlength=num_seeds)
    group_starts = np.zeros(num_seeds + 1, dtype=np.int64)
    np.cumsum(group_counts, out=group_starts[1:])
    return host, device, rep, group_starts, totals, num_seeds


@pytest.mark.parametrize("order_code", [0, 1, 2])
@pytest.mark.parametrize("choice_code", [0, 1, 2])
@pytest.mark.parametrize("erase", [False, True])
def test_device_select_matches_native(fixture, order_code, choice_code, erase):
    host, device, rep, group_starts, totals, num_seeds = fixture
    statuses = np.zeros(num_seeds, dtype=np.int64)
    for hard_cap, soft_cap in [(500, 9), (40, 7), (500, 50)]:
        want = native_select_from_groups_batch(
            host, rep, group_starts, totals, statuses,
            hard_cap, soft_cap, order_code, choice_code, erase,
        )
        got = device_select_from_groups_batch(
            device, rep, group_starts, totals, statuses,
            hard_cap, soft_cap, order_code, choice_code, erase,
        )
        w_anchors, w_counts = want
        g_anchors, g_counts = got
        np.testing.assert_array_equal(
            g_counts, w_counts,
            err_msg=f"counts: caps={hard_cap}/{soft_cap}",
        )
        # compare only the written rows (the tail is scratch in both)
        for s in range(num_seeds):
            nw = int(w_counts[s, 1])
            np.testing.assert_array_equal(
                g_anchors[s, :nw], w_anchors[s, :nw],
                err_msg=(
                    f"anchors seed {s}: caps={hard_cap}/{soft_cap} "
                    f"order={order_code} choice={choice_code} erase={erase}"
                ),
            )


def test_device_select_respects_status_bits(fixture):
    host, device, rep, group_starts, totals, num_seeds = fixture
    statuses = np.zeros(num_seeds, dtype=np.int64)
    statuses[0] = 2  # overflow: seed skipped entirely
    want = native_select_from_groups_batch(
        host, rep, group_starts, totals, statuses, 500, 9, 0, 0, True,
    )
    got = device_select_from_groups_batch(
        device, rep, group_starts, totals, statuses, 500, 9, 0, 0, True,
    )
    np.testing.assert_array_equal(got[1], want[1])
    assert got[1][0, 0] & 2
    assert got[1][0, 1] == 0
