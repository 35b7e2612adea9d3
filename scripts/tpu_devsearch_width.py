"""Frontier width profile of one chunk: per-iteration live+done totals
from the width telemetry, to size shrink phases."""

import sys
import numpy as np

from floxer_tpu.backend import ensure_backend

ensure_backend()

import jax.numpy as jnp  # noqa: E402

from floxer_tpu import search_device as sd  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 50

from pathlib import Path  # noqa: E402

from floxer_tpu.cli import parse_and_validate  # noqa: E402
from floxer_tpu.io.sequence_io import Queries, read_references  # noqa: E402
from floxer_tpu.pipeline import (  # noqa: E402
    build_or_load_index, make_searcher, prepare_query_tree,
)

DATA = Path.home() / ".cache" / "floxer_tpu" / "bench"
STEM = "chr21s_46000000_2000x20000_s20260819"
cli = parse_and_validate([
    "--reference", str(DATA / f"{STEM}.fasta"),
    "--queries", str(DATA / f"{STEM}.fastq"),
    "--index", str(DATA / f"{STEM}.index.npz"),
    "--output", "/tmp/w.sam", "--error-probability", "0.08",
    "--interval-optimization", "--threads", "4",
])
references = read_references(cli.reference_path)
index = build_or_load_index(cli, references)
host_searcher = make_searcher(cli, index, len(references.records))

queries = []
for q in Queries(cli.queries_path, cli.query_num_errors,
                 cli.query_error_probability, cli.pex_seed_num_errors):
    queries.append(q)
    if len(queries) >= N:
        break
jobs = []
for query in queries:
    _, seeds = prepare_query_tree(query, cli)
    jobs.append((seeds, query.rank_sequence))
    jobs.append((seeds, query.reverse_complement_rank_sequence))

from floxer_tpu.index.device_index import DeviceIndex  # noqa: E402
from floxer_tpu.search_host import assemble_chunk_seed_arrays  # noqa: E402

device_index = DeviceIndex.from_host(index)
searcher = sd.DeviceSearcher(host_searcher, device_index)

# monkeypatch the chunk program to capture widths
orig = sd._frontier_search_chunk
captured = {}

def spy(index_, patterns, *args, **kwargs):
    out = orig(index_, patterns, *args, **kwargs)
    captured["shape"] = patterns.shape
    return out

sd._frontier_search_chunk = spy

# instead simply call _frontier_block path via _run_chunk_fused and also
# grab widths by calling the block directly
arrays = assemble_chunk_seed_arrays(jobs)
rows, ovf = searcher._run_chunk_fused(arrays)
print("reports:", rows.shape[0], "overflow gids:", ovf.shape[0], "pat shape:", captured.get("shape"))

# direct width capture: replicate the fused call but through _frontier_block
eligible = np.flatnonzero(arrays.length_g <= sd._MAX_DEVICE_PATTERN)
err_len = np.stack([arrays.errors_g[eligible], arrays.length_g[eligible]], axis=1)
uniq_pairs, class_of = np.unique(err_len, axis=0, return_inverse=True)
from floxer_tpu.schemes import expand_scheme  # noqa: E402
tables = sd.SchemeTables.from_length_classes(
    [expand_scheme(int(e), int(l)) for e, l in uniq_pairs])
pad_len = -(-int(arrays.length_g[eligible].max()) // 8) * 8
max_iter = pad_len + int(uniq_pairs[:, 0].max()) + 2 * tables.num_parts + 2
gather = arrays.offsets_g[eligible][:, None] + np.arange(pad_len, dtype=np.int64)
in_range = np.arange(pad_len)[None, :] < arrays.length_g[eligible][:, None]
patterns = np.where(in_range, arrays.buffer[np.minimum(gather, arrays.buffer.shape[0] - 1)], 0).astype(np.int32)

def q2(v, floor):
    v = max(int(v), floor)
    g = 1 << max(0, v.bit_length() - 2)
    return -(-v // g) * g

S = q2(eligible.size, 1 << 10)
C = q2(int(eligible.size * tables.num_searches * 1.5), 1 << 15)
pat = np.zeros((S, pad_len), dtype=np.int32)
pat[: eligible.size] = patterns
cls = np.full(S, tables.dead_class, dtype=np.int32)
cls[: eligible.size] = class_of
final, ovf_s, peak = sd._frontier_block(
    device_index, jnp.asarray(pat), jnp.asarray(cls),
    tables.start, tables.end, tables.direction, tables.lower, tables.upper,
    tables.num_searches, tables.num_parts, C, max_iter,
)
print(f"C={C} iters={max_iter} peak={int(np.asarray(peak))} "
      f"overflow={bool(np.asarray(ovf_s))}")
