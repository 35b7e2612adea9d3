"""Sharded FM-index: BWT rows distributed across an "index" mesh axis.

The hg38-scale configuration (BASELINE.md ladder step 4): one chip cannot
hold the whole occurrence table, so the BWT (fwd and rev) is sharded row-wise
across chips and a global rank query becomes

    occ(c, pos) = sum over shards s of local_occ_s(c, clamp(pos - start_s))

— each chip counts within its own rows and a psum over the index axis
combines the partial counts (ICI collective, the reference has no analogue:
its whole index lives in one node's RAM, floxer.cpp:90-92).

Layout per index shard (built host-side by shard_single_index):
  - bwt_shard: uint8 [shard_len]         padded to the max shard length
  - occ_shard: int32 [nb_shard, SIGMA]   LOCAL cumulative counts
  - shard_start: int32 []                first global row of the shard

Query batches are replicated along the index axis (every chip sees every
position, contributes its partial count); the reads axis shards the batch as
usual, giving a 2D ("reads", "index") mesh where rank queries psum over
"index" only.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..alphabet import SIGMA
from ..index.fmindex import OCC_BLOCK

READS_AXIS = "reads"
INDEX_AXIS = "index"


@dataclass
class HostShardedSingle:
    """Host-side row-sharded single-direction index, ready to device_put."""

    bwt_shards: np.ndarray  # uint8 [S, max_shard_len]
    occ_shards: np.ndarray  # int64 [S, nb+1, SIGMA] local cumulative
    shard_starts: np.ndarray  # int64 [S]
    shard_lengths: np.ndarray  # int64 [S]


def shard_single_index(bwt: np.ndarray, num_shards: int) -> HostShardedSingle:
    n = bwt.shape[0]
    base = -(-n // num_shards)
    base = -(-base // OCC_BLOCK) * OCC_BLOCK  # align shards to occ blocks
    starts = np.minimum(np.arange(num_shards) * base, n)
    lengths = np.minimum(starts + base, n) - starts
    max_len = int(base)
    nb = max_len // OCC_BLOCK + 1

    bwt_shards = np.zeros((num_shards, max_len), dtype=np.uint8)
    occ_shards = np.zeros((num_shards, nb + 1, SIGMA), dtype=np.int64)
    for s in range(num_shards):
        chunk = bwt[starts[s] : starts[s] + lengths[s]]
        bwt_shards[s, : len(chunk)] = chunk
        per_block = np.zeros((nb, SIGMA), dtype=np.int64)
        block_idx = np.arange(len(chunk)) // OCC_BLOCK
        np.add.at(per_block, (block_idx, chunk.astype(np.int64)), 1)
        np.cumsum(per_block, axis=0, out=occ_shards[s, 1:])
    return HostShardedSingle(
        bwt_shards,
        occ_shards,
        starts.astype(np.int64),
        lengths.astype(np.int64),
    )


def _local_rank_all(bwt, occ, positions):
    """Rank within one shard for clamped positions: [B] -> [B, SIGMA]."""
    block = positions // OCC_BLOCK
    base = occ[block]
    start = block * OCC_BLOCK
    offsets = jnp.arange(OCC_BLOCK, dtype=jnp.int32)[None, :]
    gather_idx = jnp.minimum(start[:, None] + offsets, bwt.shape[0] - 1)
    window = bwt[gather_idx].astype(jnp.int32)
    in_range = offsets < (positions - start)[:, None]
    one_hot = (
        window[:, :, None] == jnp.arange(SIGMA, dtype=jnp.int32)[None, None, :]
    )
    return base + jnp.sum(one_hot & in_range[:, :, None], axis=1, dtype=jnp.int32)


def make_sharded_rank_fn(mesh: Mesh):
    """Returns rank_all(bwt_shards, occ_shards, starts, lengths, positions)
    where the shard arrays are sharded along INDEX_AXIS, positions is
    sharded along READS_AXIS and replicated along INDEX_AXIS, and the result
    [B, SIGMA] equals the unsharded occ via a psum over INDEX_AXIS."""

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(INDEX_AXIS, None),  # bwt_shards [S, L]
            P(INDEX_AXIS, None, None),  # occ_shards [S, nb+1, SIGMA]
            P(INDEX_AXIS),  # starts [S]
            P(INDEX_AXIS),  # lengths [S]
            P(READS_AXIS),  # positions [B]
        ),
        out_specs=P(READS_AXIS, None),
        check_vma=False,
    )
    def rank_all(bwt_shards, occ_shards, starts, lengths, positions):
        bwt = bwt_shards[0]
        occ = occ_shards[0].astype(jnp.int32)
        start = starts[0]
        length = lengths[0]
        local_pos = jnp.clip(positions - start, 0, length).astype(jnp.int32)
        local = _local_rank_all(bwt, occ, local_pos)
        return jax.lax.psum(local, INDEX_AXIS)

    return rank_all


def sharded_rank_all(
    mesh: Mesh,
    sharded: HostShardedSingle,
    positions: np.ndarray,
):
    """Convenience wrapper: device_put with the right shardings + run."""
    index_first = NamedSharding(mesh, P(INDEX_AXIS))
    bwt = jax.device_put(
        jnp.asarray(sharded.bwt_shards),
        NamedSharding(mesh, P(INDEX_AXIS, None)),
    )
    occ = jax.device_put(
        jnp.asarray(sharded.occ_shards),
        NamedSharding(mesh, P(INDEX_AXIS, None, None)),
    )
    starts = jax.device_put(jnp.asarray(sharded.shard_starts), index_first)
    lengths = jax.device_put(jnp.asarray(sharded.shard_lengths), index_first)
    positions = jax.device_put(
        jnp.asarray(positions, dtype=jnp.int32),
        NamedSharding(mesh, P(READS_AXIS)),
    )
    fn = make_sharded_rank_fn(mesh)
    return fn(bwt, occ, starts, lengths, positions)


def make_2d_pipeline_step(mesh: Mesh, num_words: int):
    """A full 2D-sharded device step for the dry run: collective rank
    queries over the row-sharded index (the hg38 search stage) fused with
    reads-sharded Myers verification and a global stats psum.

    Shardings: index arrays along INDEX_AXIS; every per-read batch array
    along READS_AXIS (replicated along INDEX_AXIS); outputs along
    READS_AXIS. The verification runs redundantly on each index-shard chip
    (deterministic, identical), which keeps the step collective-free apart
    from the rank psum and the stats reduction.
    """
    from ..ops.myers import myers_batched

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(INDEX_AXIS, None),  # bwt_shards
            P(INDEX_AXIS, None, None),  # occ_shards
            P(INDEX_AXIS),  # starts
            P(INDEX_AXIS),  # lengths
            P(READS_AXIS),  # rank query positions [B]
            P(READS_AXIS, None, None),  # peq [B, SIGMA, W]
            P(READS_AXIS),  # pattern lengths
            P(READS_AXIS, None),  # windows [B, N]
            P(READS_AXIS),  # window lengths
            P(READS_AXIS),  # error budgets
        ),
        out_specs=(P(READS_AXIS, None), P(READS_AXIS), P()),
        check_vma=False,
    )
    def step(
        bwt_shards,
        occ_shards,
        starts,
        lengths,
        positions,
        peq,
        plen,
        windows,
        wlen,
        budgets,
    ):
        # search stage: sharded-index rank with a psum over the index axis
        local_pos = jnp.clip(positions - starts[0], 0, lengths[0]).astype(
            jnp.int32
        )
        local = _local_rank_all(
            bwt_shards[0], occ_shards[0].astype(jnp.int32), local_pos
        )
        ranks = jax.lax.psum(local, INDEX_AXIS)

        # verification stage on the local reads shard
        distances, _ = myers_batched(
            peq, plen, windows.astype(jnp.int32), wlen, num_words=num_words
        )
        accepted = (distances <= budgets).astype(jnp.int32)
        # replicated along INDEX (every index chip verified the same shard)
        num_accepted = jax.lax.psum(jnp.sum(accepted, keepdims=True), READS_AXIS)
        return ranks, accepted, num_accepted

    return step


def make_2d_mesh(devices=None, index_axis_size: int = 2) -> Mesh:
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    assert devices.size % index_axis_size == 0
    grid = devices.reshape(devices.size // index_axis_size, index_axis_size)
    return Mesh(grid, (READS_AXIS, INDEX_AXIS))
