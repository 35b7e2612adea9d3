"""Profile the host search stage alone on the chr21 bench workload
(~/.cache/floxer_tpu/bench): PEX tree build + seed generation +
chunk-batched native FM search on N reads, plus the native occ-scan
counters (FLOXER_TPU_SEARCH_STATS) when enabled.

Usage: python scripts/profile_chr21_search.py [N_READS] [THREADS] [--perf]
"""

import os
import sys
import time
from pathlib import Path

from floxer_tpu.cli import parse_and_validate
from floxer_tpu.io.sequence_io import Queries, read_references
from floxer_tpu.pipeline import build_or_load_index, make_searcher, prepare_query_tree

DATA = Path(os.environ.get("FLOXER_BENCH_DATA_DIR",
                           Path.home() / ".cache" / "floxer_tpu" / "bench"))
STEM = "chr21s_46000000_2000x20000_s20260819"

N = int(sys.argv[1]) if len(sys.argv) > 1 else 250
THREADS = int(sys.argv[2]) if len(sys.argv) > 2 else 4

REF = os.environ.get("FLOXER_PROFILE_REF", str(DATA / f"{STEM}.fasta"))
QUERIES = os.environ.get("FLOXER_PROFILE_QUERIES", str(DATA / f"{STEM}.fastq"))
INDEX = os.environ.get("FLOXER_PROFILE_INDEX", str(DATA / f"{STEM}.index.npz"))

cli = parse_and_validate(
    [
        "--reference", REF,
        "--queries", QUERIES,
        "--index", INDEX,
        "--output", "/tmp/profile_chr21_search.sam",
        "--error-probability", "0.08",
        "--interval-optimization",
        "--threads", str(THREADS),
    ]
)
references = read_references(cli.reference_path)
t = time.monotonic()
index = build_or_load_index(cli, references)
print(f"index load: {time.monotonic()-t:.2f}s")
searcher = make_searcher(cli, index, len(references.records))

queries = []
stream = iter(
    Queries(cli.queries_path, cli.query_num_errors, cli.query_error_probability,
            cli.pex_seed_num_errors)
)
for q in stream:
    queries.append(q)
    if len(queries) >= N:
        break


def search_stats(reset=False):
    try:
        from floxer_tpu import native
        return native.search_stats(reset)
    except Exception:
        return None


def stage_ns(reset=False):
    try:
        from floxer_tpu import native
        return native.stage_ns(reset)
    except Exception:
        return None


def run_once(tag):
    t0 = time.monotonic()
    jobs = []
    for query in queries:
        pex_tree, seeds = prepare_query_tree(query, cli)
        jobs.append((seeds, query.rank_sequence))
        jobs.append((seeds, query.reverse_complement_rank_sequence))
    t1 = time.monotonic()
    search_stats(reset=True)
    stage_ns(reset=True)
    searched = searcher.search_seeds_many(jobs)
    t2 = time.monotonic()
    stats = search_stats()
    stages = stage_ns()
    print(f"[{tag}] prepare(pex+seeds): {t1-t0:.3f}s   "
          f"native search_many ({THREADS} threads): {t2-t1:.3f}s   "
          f"({N/(t2-t1):.1f} reads/s search-only)")
    if stats is not None:
        print(f"    occ_all={stats[0]/1e6:.1f}M occ_pair={stats[1]/1e6:.1f}M "
              f"dfs_steps={stats[2]/1e6:.1f}M")
    if stages is not None and stages[0]:
        print(f"    worker={stages[0]/1e9:.2f}s select={stages[1]/1e9:.2f}s "
              f"(thread-summed)")
    return searched


run_once("warm")
run_once("run1")
run_once("run2")
run_once("run3")
run_once("run4")
run_once("run5")
