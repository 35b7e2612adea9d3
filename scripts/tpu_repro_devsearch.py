"""Repro: chunk-level device search alone (no verify kernels) on TPU.

Isolates the TPU worker kernel fault seen in full-pipeline --device-search
runs at E. coli scale: if this crashes, the frontier search itself is the
trigger; if it passes, the fault comes from concurrent dispatch with the
verify kernels.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from floxer_tpu.backend import ensure_backend

print("backend:", ensure_backend(), flush=True)

from floxer_tpu.cli import CommandLineInput  # noqa: E402
from floxer_tpu.index.device_index import DeviceIndex  # noqa: E402
from floxer_tpu.index.fmindex import FmIndex  # noqa: E402
from floxer_tpu.io.sequence_io import read_references, Queries  # noqa: E402
from floxer_tpu.pipeline import make_searcher, prepare_query_tree  # noqa: E402
from floxer_tpu.search_device import DeviceSearcher  # noqa: E402

cli = CommandLineInput(
    reference_path="/tmp/ecoli/genome1k.fasta",
    queries_path="/tmp/ecoli/reads100.fastq",
    output_path="/tmp/ds_only.sam",
    query_error_probability=0.07,
    use_interval_optimization=True,
    num_threads=4,
)

refs = read_references(cli.reference_path)
t0 = time.monotonic()
index = FmIndex([r.rank_sequence for r in refs.records])
print(f"index built in {time.monotonic() - t0:.1f}s", flush=True)

searcher = make_searcher(cli, index, len(refs.records))
dev = DeviceSearcher(searcher, DeviceIndex.from_host(index))

queries = list(Queries(cli.queries_path, cli.query_num_errors, cli.query_error_probability, cli.pex_seed_num_errors))
print(f"{len(queries)} queries", flush=True)

jobs = []
for query in queries:
    _, seeds = prepare_query_tree(query, cli)
    jobs.append((seeds, query.rank_sequence))
    jobs.append((seeds, query.reverse_complement_rank_sequence))

# instrument: log every block's shape and force a sync after each dispatch
orig_run_block = dev._run_block
block_no = [0]


def traced_run_block(padded, seed_class, tables, fcap, rcap, max_iter):
    block_no[0] += 1
    print(
        f"block {block_no[0]}: padded{padded.shape} classes={tables.num_classes} "
        f"searches={tables.num_searches} parts={tables.num_parts} iter={max_iter}",
        flush=True,
    )
    out = orig_run_block(padded, seed_class, tables, fcap, rcap, max_iter)
    if os.environ.get("REPRO_SYNC"):
        print(f"  -> reports={int(out[1])}", flush=True)
    return out


dev._run_block = traced_run_block

t0 = time.monotonic()
results = dev.search_seeds_many(jobs)
dt = time.monotonic() - t0
total = sum(getattr(r, "num_kept_useful_anchors", 0) for r in results) if results else 0
print(f"device search of {len(jobs)} jobs in {dt:.1f}s "
      f"({total} kept anchors)", flush=True)
print("OK", flush=True)
