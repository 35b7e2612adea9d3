"""Device mesh + sharded pipeline steps.

Replaces the reference's thread-pool parallelism (parallelization.cpp) with
SPMD data parallelism over a jax.sharding.Mesh:

  - axis "reads": read batches (seeds, verification tasks) sharded across
    chips — the DP axis; every per-read array is sharded on its batch dim
  - the FM-index is replicated at <= chr21 scale (see SURVEY.md section 2.4);
    the sharded-index path for hg38 adds an "index" axis with collective
    rank gathers (parallel/sharded_index.py)
  - statistics merge with psum over the mesh, replacing the mutex-guarded
    global stats (parallelization.cpp:113-116)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..index.device_index import DeviceIndex, locate_batch
from ..ops.myers import myers_batched

READS_AXIS = "reads"


def make_mesh(devices=None, axis_name: str = READS_AXIS) -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch_spec(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(READS_AXIS))


def replicated_spec(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


@partial(jax.jit, static_argnames=("num_words",))
def pipeline_step(
    index: DeviceIndex,
    seed_patterns_peq: jax.Array,  # uint32 [B, SIGMA, W]
    pattern_lengths: jax.Array,  # int32 [B]
    windows: jax.Array,  # uint8 [B, N] reference windows
    window_lengths: jax.Array,  # int32 [B]
    error_budgets: jax.Array,  # int32 [B]
    probe_rows: jax.Array,  # int32 [B] SA rows to locate (search stage probe)
    num_words: int,
):
    """One fused device step over a (sharded) batch: locate the anchors'
    SA rows, score every (node query, window) pair with the Myers kernel,
    and reduce acceptance stats.

    This is the flagship jitted computation: under a mesh with the batch
    dims sharded along "reads" and the index replicated, XLA partitions it
    into per-chip work with a final cross-chip psum for the stats.
    """
    seq_ids, positions = locate_batch(
        index, probe_rows, sampling_rate=index.sampling_rate
    )
    distances, end_cols = myers_batched(
        seed_patterns_peq,
        pattern_lengths,
        windows.astype(jnp.int32),
        window_lengths,
        num_words,
    )
    accepted = distances <= error_budgets
    num_accepted = jnp.sum(accepted.astype(jnp.int32))
    return {
        "seq_ids": seq_ids,
        "positions": positions,
        "distances": distances,
        "end_cols": end_cols,
        "accepted": accepted,
        "num_accepted": num_accepted,
    }


def sharded_pipeline_step(mesh: Mesh, num_words: int):
    """pipeline_step with explicit input shardings for the mesh: per-read
    arrays on the reads axis, index replicated."""
    batch = shard_batch_spec(mesh)
    repl = replicated_spec(mesh)

    index_shardings = jax.tree_util.tree_map(lambda _: repl, _index_structure())

    return jax.jit(
        partial(pipeline_step, num_words=num_words),
        in_shardings=(index_shardings, batch, batch, batch, batch, batch, batch),
    )


def _index_structure():
    # placeholder pytree with the same structure as DeviceIndex for
    # tree-mapping shardings; values are irrelevant
    from ..index.device_index import DeviceSingleIndex

    zero = jnp.zeros((1,), dtype=jnp.int32)
    single = DeviceSingleIndex(zero, zero, zero)
    return DeviceIndex(single, single, zero, zero, zero, zero, zero, zero)


def allreduce_stats(sums, mins, maxs):
    """Cross-PROCESS stats merge over a one-device-per-process mesh:
    psum for the sum-mergeable slots, pmin/pmax for the order statistics.
    Every process passes its local vectors (stats.to_merge_arrays) and
    receives the fully-merged triple — the multi-host version of the
    reference's global-stats mutex merge (parallelization.cpp:278-281),
    executed as XLA collectives (SURVEY.md section 5.8)."""
    from functools import partial as _partial

    import numpy as np
    from jax.sharding import NamedSharding

    per_process = {}
    for device in jax.devices():
        per_process.setdefault(device.process_index, device)
    devices = np.array([per_process[i] for i in sorted(per_process)])
    mesh = Mesh(devices, ("hosts",))
    spec = P("hosts")
    mine = per_process[jax.process_index()]

    def global_rows(vec):
        local = jnp.asarray(np.asarray(vec, dtype=np.int64)[None, :])
        return jax.make_array_from_single_device_arrays(
            (devices.size, local.shape[1]),
            NamedSharding(mesh, spec),
            [jax.device_put(local, mine)],
        )

    from jax import shard_map

    @_partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=(P(), P(), P()),
    )
    def reduce(s, lo, hi):
        return (
            jax.lax.psum(s, "hosts"),
            jax.lax.pmin(lo, "hosts"),
            jax.lax.pmax(hi, "hosts"),
        )

    merged = jax.jit(reduce)(
        global_rows(sums), global_rows(mins), global_rows(maxs)
    )
    return tuple(np.asarray(part)[0] for part in merged)


def psum_statistics(mesh: Mesh, per_chip_counts: jax.Array) -> jax.Array:
    """Cross-chip stats merge (the reference's global-stats mutex merge,
    parallelization.cpp:278-281, as a collective)."""
    from jax import shard_map

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=P(READS_AXIS),
        out_specs=P(),
    )
    def reduce(counts):
        return jax.lax.psum(jnp.sum(counts, keepdims=True), READS_AXIS)

    return reduce(per_chip_counts)
