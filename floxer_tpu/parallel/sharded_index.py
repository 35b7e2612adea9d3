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


# ---------------------------------------------------------------------------
# Full sharded index: search + locate against row-sharded BWT and SA samples
# (the hg38-scale configuration where one chip cannot hold the index). The
# frontier search kernel (search_device._frontier_search) and the batched
# locate (index/device_index.locate_batch) run UNCHANGED inside shard_map:
# the ShardedSingleIndex / ShardedDeviceIndex types resolve every rank /
# BWT / SA-sample gather into a local partial plus a psum over INDEX_AXIS.
# Frontier bookkeeping is replicated across index shards (deterministic),
# so the only collectives are the rank psums riding ICI.
# ---------------------------------------------------------------------------


@dataclass
class ShardedHostIndex:
    """Host-side stacked shard arrays of a full bidirectional index, ready
    to device_put along INDEX_AXIS."""

    fwd: HostShardedSingle
    rev: HostShardedSingle
    C: np.ndarray
    sampled_rows: np.ndarray  # int64 [S, ns_per_shard] pad 1<<30
    sampled_values: np.ndarray  # int64 [S, ns_per_shard]
    seq_starts: np.ndarray
    sampling_rate: int
    global_n: int


def shard_full_index(host_index, num_shards: int) -> ShardedHostIndex:
    """Row-shards both directions of a host FmIndex plus its SA samples."""
    fwd = shard_single_index(host_index.fwd.bwt, num_shards)
    rev = shard_single_index(host_index.rev.bwt, num_shards)
    rows = np.asarray(host_index.sampled_rows, dtype=np.int64)
    vals = np.asarray(host_index.sampled_values, dtype=np.int64)
    per = max(1, -(-len(rows) // num_shards))
    srows = np.full((num_shards, per), np.int64(1) << 30, dtype=np.int64)
    svals = np.zeros((num_shards, per), dtype=np.int64)
    for s in range(num_shards):
        chunk = slice(s * per, min((s + 1) * per, len(rows)))
        size = max(0, chunk.stop - chunk.start)
        if size > 0:
            srows[s, :size] = rows[chunk]
            svals[s, :size] = vals[chunk]
    return ShardedHostIndex(
        fwd=fwd,
        rev=rev,
        C=np.asarray(host_index.C, dtype=np.int64),
        sampled_rows=srows,
        sampled_values=svals,
        seq_starts=np.asarray(host_index.seq_starts, dtype=np.int64),
        sampling_rate=host_index.sampling_rate,
        global_n=int(host_index.n),
    )


def _device_put_sharded_host(mesh: Mesh, sh: ShardedHostIndex):
    """device_put every stacked array with its INDEX_AXIS sharding."""
    shard0 = NamedSharding(mesh, P(INDEX_AXIS))
    shard1 = NamedSharding(mesh, P(INDEX_AXIS, None))
    shard2 = NamedSharding(mesh, P(INDEX_AXIS, None, None))
    repl = NamedSharding(mesh, P())

    def put(x, sharding, dtype=None):
        arr = jnp.asarray(x if dtype is None else np.asarray(x, dtype=dtype))
        return jax.device_put(arr, sharding)

    return dict(
        fwd_bwt=put(sh.fwd.bwt_shards, shard1),
        fwd_occ=put(sh.fwd.occ_shards, shard2, np.int32),
        fwd_starts=put(sh.fwd.shard_starts, shard0, np.int32),
        fwd_lengths=put(sh.fwd.shard_lengths, shard0, np.int32),
        rev_bwt=put(sh.rev.bwt_shards, shard1),
        rev_occ=put(sh.rev.occ_shards, shard2, np.int32),
        rev_starts=put(sh.rev.shard_starts, shard0, np.int32),
        rev_lengths=put(sh.rev.shard_lengths, shard0, np.int32),
        C=put(sh.C, repl, np.int32),
        sampled_rows=put(sh.sampled_rows, shard1, np.int32),
        sampled_values=put(sh.sampled_values, shard1, np.int32),
        seq_starts=put(sh.seq_starts, repl, np.int32),
    )


def _local_index(arrs, sh: ShardedHostIndex):
    """Build the in-body ShardedDeviceIndex from shard_map local views."""
    from ..index.device_index import ShardedDeviceIndex, ShardedSingleIndex

    fwd = ShardedSingleIndex(
        arrs["fwd_bwt"][0],
        arrs["fwd_occ"][0],
        arrs["fwd_starts"][0],
        arrs["fwd_lengths"][0],
        axis_name=INDEX_AXIS,
        global_n=sh.global_n,
    )
    rev = ShardedSingleIndex(
        arrs["rev_bwt"][0],
        arrs["rev_occ"][0],
        arrs["rev_starts"][0],
        arrs["rev_lengths"][0],
        axis_name=INDEX_AXIS,
        global_n=sh.global_n,
    )
    return ShardedDeviceIndex(
        fwd=fwd,
        rev=rev,
        C=arrs["C"],
        sampled_rows=arrs["sampled_rows"][0],
        sampled_values=arrs["sampled_values"][0],
        seq_starts=arrs["seq_starts"],
        sampling_rate=sh.sampling_rate,
    )


_ARR_KEYS = (
    "fwd_bwt", "fwd_occ", "fwd_starts", "fwd_lengths",
    "rev_bwt", "rev_occ", "rev_starts", "rev_lengths",
    "C", "sampled_rows", "sampled_values", "seq_starts",
)
_ARR_SPECS = (
    P(INDEX_AXIS, None), P(INDEX_AXIS, None, None), P(INDEX_AXIS), P(INDEX_AXIS),
    P(INDEX_AXIS, None), P(INDEX_AXIS, None, None), P(INDEX_AXIS), P(INDEX_AXIS),
    P(), P(INDEX_AXIS, None), P(INDEX_AXIS, None), P(),
)


def sharded_locate(mesh: Mesh, sh: ShardedHostIndex, rows: np.ndarray):
    """Batched locate against the sharded index: SA rows ->
    (reference_id, position). Bit-identical to the replicated
    DeviceIndex locate."""
    from ..index.device_index import locate_batch

    arrs = _device_put_sharded_host(mesh, sh)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(_ARR_SPECS, P(None)),
        out_specs=(P(None), P(None)),
        check_vma=False,
    )
    def run(arr_tuple, rows_):
        index = _local_index(dict(zip(_ARR_KEYS, arr_tuple)), sh)
        return locate_batch(index, rows_, sampling_rate=sh.sampling_rate)

    rows_dev = jax.device_put(
        jnp.asarray(rows, dtype=jnp.int32), NamedSharding(mesh, P())
    )
    return run(tuple(arrs[k] for k in _ARR_KEYS), rows_dev)


def sharded_frontier_search(
    mesh: Mesh,
    sh: ShardedHostIndex,
    padded_patterns: np.ndarray,
    seed_class: np.ndarray,
    tables,
    frontier_capacity: int,
    report_capacity: int,
    max_iterations: int,
):
    """The device frontier seed search (search_device._frontier_search)
    with the index row-sharded across INDEX_AXIS. Returns the same
    (reports, num_reports, overflow) as the replicated version."""
    from ..search_device import _frontier_search

    arrs = _device_put_sharded_host(mesh, sh)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(_ARR_SPECS, P(None, None), P(None)),
        out_specs=(P(None, None), P(), P(None)),
        check_vma=False,
    )
    def run(arr_tuple, patterns, classes):
        index = _local_index(dict(zip(_ARR_KEYS, arr_tuple)), sh)
        return _frontier_search(
            index,
            patterns,
            classes,
            tables.start,
            tables.end,
            tables.direction,
            tables.lower,
            tables.upper,
            tables.num_searches,
            tables.num_parts,
            frontier_capacity,
            report_capacity,
            max_iterations,
        )

    replicated = NamedSharding(mesh, P())
    patterns_dev = jax.device_put(
        jnp.asarray(padded_patterns, dtype=jnp.int32), replicated
    )
    classes_dev = jax.device_put(
        jnp.asarray(seed_class, dtype=jnp.int32), replicated
    )
    return run(tuple(arrs[k] for k in _ARR_KEYS), patterns_dev, classes_dev)
