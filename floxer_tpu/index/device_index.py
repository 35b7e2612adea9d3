"""Device-resident FM-index: batched rank / LF / locate as JAX gathers.

TPU-native replacement for fmindex-collection's EPR-dictionary rank queries
(include/fmindex.hpp:8, queried per-cursor in search.cpp:173/253): the BWT
and its occ checkpoints live in HBM as flat arrays, and a rank query for a
whole batch of cursors is one checkpoint gather plus a masked popcount over
the partial block — pure VPU work with no host round-trips.

Layout (from index/fmindex.py, shipped with jnp.asarray):
  - bwt:            uint8  [n]       BWT symbols (fwd or rev text)
  - occ:            int32  [nb, 6]   cumulative counts at block boundaries
  - C:              int32  [7]       first-row symbol offsets
  - sampled_rows:   int32  [ns]      sorted SA rows with sampled positions
  - sampled_values: int32  [ns]      the sampled text positions
  - seq_starts:     int32  [num_seqs]

locate() is a fixed-trip-count LF walk (sampling by text position mod rate
guarantees <= rate-1 steps, index/fmindex.py) — a lax.fori_loop of gathers,
one iteration per sampling step, fully batched.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from ..alphabet import SIGMA
from .fmindex import OCC_BLOCK, FmIndex


@jax.tree_util.register_pytree_node_class
@dataclass
class DeviceSingleIndex:
    bwt: jax.Array  # uint8 [n]
    occ: jax.Array  # int32 [nb, SIGMA]

    def tree_flatten(self):
        return (self.bwt, self.occ), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@jax.tree_util.register_pytree_node_class
@dataclass
class DeviceIndex:
    fwd: DeviceSingleIndex
    rev: DeviceSingleIndex
    C: jax.Array  # int32 [SIGMA + 1]
    sampled_rows: jax.Array  # int32 [ns]
    sampled_values: jax.Array  # int32 [ns]
    seq_starts: jax.Array  # int32 [num_seqs]
    sampling_rate: int = 4

    def tree_flatten(self):
        children = (
            self.fwd,
            self.rev,
            self.C,
            self.sampled_rows,
            self.sampled_values,
            self.seq_starts,
        )
        return children, self.sampling_rate

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, sampling_rate=aux)

    @classmethod
    def from_host(cls, index: FmIndex) -> "DeviceIndex":
        def single(host):
            return DeviceSingleIndex(
                jnp.asarray(host.bwt, dtype=jnp.uint8),
                jnp.asarray(host.occ_checkpoints, dtype=jnp.int32),
            )

        return cls(
            fwd=single(index.fwd),
            rev=single(index.rev),
            C=jnp.asarray(index.C, dtype=jnp.int32),
            sampled_rows=jnp.asarray(index.sampled_rows, dtype=jnp.int32),
            sampled_values=jnp.asarray(index.sampled_values, dtype=jnp.int32),
            seq_starts=jnp.asarray(index.seq_starts, dtype=jnp.int32),
            sampling_rate=index.sampling_rate,
        )


def rank_all(index: DeviceSingleIndex, positions: jax.Array) -> jax.Array:
    """occ over all SIGMA symbols for a batch of positions: [B] -> [B, SIGMA].

    One checkpoint gather + a masked one-hot popcount over the partial block
    (OCC_BLOCK wide), the device analogue of the EPR dictionary's
    checkpoint+prefix-sum scheme.
    """
    positions = positions.astype(jnp.int32)
    block = positions // OCC_BLOCK
    base = index.occ[block]  # [B, SIGMA]
    start = block * OCC_BLOCK
    offsets = jnp.arange(OCC_BLOCK, dtype=jnp.int32)[None, :]  # [1, OB]
    gather_idx = jnp.minimum(
        start[:, None] + offsets, index.bwt.shape[0] - 1
    )
    window = index.bwt[gather_idx].astype(jnp.int32)  # [B, OB]
    in_range = offsets < (positions - start)[:, None]  # [B, OB]
    one_hot = (
        window[:, :, None] == jnp.arange(SIGMA, dtype=jnp.int32)[None, None, :]
    )
    partial_counts = jnp.sum(
        one_hot & in_range[:, :, None], axis=1, dtype=jnp.int32
    )
    return base + partial_counts


def rank_symbol(
    index: DeviceSingleIndex, symbol: jax.Array, positions: jax.Array
) -> jax.Array:
    """occ(symbol, position) batched: [B],[B] -> [B]."""
    counts = rank_all(index, positions)
    return jnp.take_along_axis(counts, symbol[:, None].astype(jnp.int32), 1)[:, 0]


def extend_left_all(
    index: DeviceIndex, lb: jax.Array, lb_rev: jax.Array, length: jax.Array
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """All-SIGMA left extension for a batch of bidirectional cursors.

    [B] cursors -> ([B, SIGMA] lb, [B, SIGMA] lb_rev, [B, SIGMA] length),
    mirroring FmIndex.extend_left_all with two rank_all calls.
    """
    lo = rank_all(index.fwd, lb)  # [B, SIGMA]
    hi = rank_all(index.fwd, lb + length)
    counts = hi - lo
    prefix = jnp.cumsum(counts, axis=1) - counts  # exclusive prefix sum
    new_lb = index.C[None, :SIGMA] + lo
    new_lb_rev = lb_rev[:, None] + prefix
    return new_lb, new_lb_rev, counts


def extend_right_all(
    index: DeviceIndex, lb: jax.Array, lb_rev: jax.Array, length: jax.Array
) -> tuple[jax.Array, jax.Array, jax.Array]:
    lo = rank_all(index.rev, lb_rev)
    hi = rank_all(index.rev, lb_rev + length)
    counts = hi - lo
    prefix = jnp.cumsum(counts, axis=1) - counts
    new_lb_rev = index.C[None, :SIGMA] + lo
    new_lb = lb[:, None] + prefix
    return new_lb, new_lb_rev, counts


def lf_step(index: DeviceIndex, rows: jax.Array) -> jax.Array:
    """One batched LF mapping step: row of suffix p -> row of suffix p-1."""
    symbols = index.fwd.bwt[rows].astype(jnp.int32)
    return index.C[symbols] + rank_symbol(index.fwd, symbols, rows)


@partial(jax.jit, static_argnames=("sampling_rate",))
def locate_batch(
    index: DeviceIndex, rows: jax.Array, sampling_rate: int = 4
) -> tuple[jax.Array, jax.Array]:
    """Batched locate: SA rows -> (reference_id, position_in_reference).

    Bounded LF walk of at most sampling_rate - 1 steps (text-position
    sampling), then a searchsorted over sequence starts — the device
    analogue of index.locate (search.cpp:253).
    """
    rows = rows.astype(jnp.int32)

    def body(_, carry):
        cur_rows, steps, done = carry
        idx = jnp.searchsorted(index.sampled_rows, cur_rows)
        idx = jnp.minimum(idx, index.sampled_rows.shape[0] - 1)
        hit = index.sampled_rows[idx] == cur_rows
        newly_done = hit & ~done
        # remember the sampled value for rows that just hit
        steps = jnp.where(newly_done, index.sampled_values[idx] + steps, steps)
        next_rows = lf_step(index, cur_rows)
        cur_rows = jnp.where(hit | done, cur_rows, next_rows)
        # rows still walking accumulate +1 text position
        steps = jnp.where(hit | done, steps, steps + 1)
        return cur_rows, steps, done | hit

    init = (
        rows,
        jnp.zeros_like(rows),
        jnp.zeros(rows.shape, dtype=bool),
    )
    _, positions, done = jax.lax.fori_loop(0, sampling_rate, body, init)

    seq_ids = (
        jnp.searchsorted(index.seq_starts, positions, side="right") - 1
    ).astype(jnp.int32)
    in_seq_positions = positions - index.seq_starts[seq_ids]
    return seq_ids, in_seq_positions
