"""Sharded-index collective rank queries vs the host index on a 2D mesh."""

import numpy as np
import pytest

from floxer_tpu.index.fmindex import FmIndex
from floxer_tpu.parallel.sharded_index import (
    make_2d_mesh,
    shard_single_index,
    sharded_rank_all,
)


@pytest.mark.parametrize("index_axis", [2, 4])
def test_sharded_rank_matches_host(index_axis):
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    rng = np.random.default_rng(3)
    sequences = [rng.integers(1, 5, size=1500).astype(np.uint8)]
    host = FmIndex(sequences)

    mesh = make_2d_mesh(jax.devices()[:8], index_axis_size=index_axis)
    sharded = shard_single_index(host.fwd.bwt, index_axis)

    batch = 8 // index_axis * 16
    positions = rng.integers(0, host.n + 1, size=batch).astype(np.int32)
    got = np.asarray(sharded_rank_all(mesh, sharded, positions))

    for i, pos in enumerate(positions):
        want = host.fwd.occ_all(int(pos))
        assert np.array_equal(got[i], want), f"position {pos}"
