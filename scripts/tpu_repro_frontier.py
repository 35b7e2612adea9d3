"""Standalone repro: frontier search at E. coli production shape on TPU.

Run from anywhere: inserts the repo root on sys.path WITHOUT touching
PYTHONPATH (the environment's default PYTHONPATH points at the axon TPU
plugin site dir; overriding it silently downgrades the process to CPU).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from floxer_tpu.backend import ensure_backend

print("backend:", ensure_backend(), flush=True)

from floxer_tpu.index.fmindex import FmIndex  # noqa: E402
from floxer_tpu.io.sequence_io import read_references  # noqa: E402

refs = read_references("/tmp/ecoli/genome1k.fasta")
t0 = time.monotonic()
index = FmIndex([r.rank_sequence for r in refs.records])
print(f"index built in {time.monotonic() - t0:.1f}s", flush=True)

from floxer_tpu.index.device_index import DeviceIndex  # noqa: E402
from floxer_tpu.search_device import (  # noqa: E402
    _BLOCK_FRONTIER,
    _BLOCK_REPORTS,
    _BLOCK_SEEDS,
    SchemeTables,
    _frontier_search,
)
from floxer_tpu.schemes import expand_scheme  # noqa: E402
import jax.numpy as jnp  # noqa: E402

dev = DeviceIndex.from_host(index)

# production-like block: 256 seeds of length ~43, 2 errors
rng = np.random.default_rng(0)
errors = int(os.environ.get('REPRO_ERRORS', 2))
lengths = [int(x) for x in os.environ.get('REPRO_LENGTHS', '42,43,44').split(',')]
class_searches = [expand_scheme(errors, ln) for ln in lengths]
tables = SchemeTables.from_length_classes(class_searches)
pad_len = -(-max(lengths) // 32) * 32
max_iterations = pad_len + errors + 2 * tables.num_parts + 2
print("max_iterations", max_iterations, "num_searches", tables.num_searches,
      "num_parts", tables.num_parts, flush=True)

padded = np.zeros((_BLOCK_SEEDS, pad_len), dtype=np.int32)
seed_class = np.full(_BLOCK_SEEDS, tables.dead_class, dtype=np.int32)
genome = refs.records[0].rank_sequence
for i in range(_BLOCK_SEEDS):
    cls = i % 3
    ln = lengths[cls]
    off = int(rng.integers(0, len(genome) - ln))
    padded[i, :ln] = genome[off : off + ln]
    seed_class[i] = cls

print("dispatch...", flush=True)
t0 = time.monotonic()
out = _frontier_search(
    dev,
    jnp.asarray(padded),
    jnp.asarray(seed_class),
    tables.start,
    tables.end,
    tables.direction,
    tables.lower,
    tables.upper,
    tables.num_searches,
    tables.num_parts,
    _BLOCK_FRONTIER,
    _BLOCK_REPORTS,
    max_iterations,
)
reports, num_reports, overflow = out
print("num_reports:", int(num_reports), "overflow:", int(np.asarray(overflow).sum()),
      f"in {time.monotonic() - t0:.1f}s", flush=True)
print("second dispatch (warm)...", flush=True)
t0 = time.monotonic()
out = _frontier_search(
    dev, jnp.asarray(padded), jnp.asarray(seed_class),
    tables.start, tables.end, tables.direction, tables.lower, tables.upper,
    tables.num_searches, tables.num_parts,
    _BLOCK_FRONTIER, _BLOCK_REPORTS, max_iterations,
)
print("warm num_reports:", int(out[1]), f"in {time.monotonic() - t0:.2f}s", flush=True)
