"""Generate ladder-scale read sets from an existing FASTA reference.

Samples reads from the reference with the simulated_dataset mutation
scheme (truth encoded in read names for tools/simulated_dataset verify).
Used for the chr21/hg38 throughput ladders; /tmp workloads are ephemeral,
this script recreates them:

  python scripts/make_scaled_reads.py GENOME.fasta OUT.fastq \
      [num_reads=500] [read_len=20000] [error_rate=0.07] [seed=31415]
"""

import sys

import numpy as np

from floxer_tpu.io.sequence_io import read_references
from floxer_tpu.tools.simulated_dataset import _ranks_to_str, mutate_read


def main() -> int:
    genome = sys.argv[1]
    out_path = sys.argv[2]
    num_reads = int(sys.argv[3]) if len(sys.argv) > 3 else 500
    read_len = int(sys.argv[4]) if len(sys.argv) > 4 else 20_000
    error_rate = float(sys.argv[5]) if len(sys.argv) > 5 else 0.07
    seed = int(sys.argv[6]) if len(sys.argv) > 6 else 31415

    print(f"reading {genome} ...", flush=True)
    refs = read_references(genome)
    # tool-internal alphabet is 0..3; sequence_io ranks are 1..4
    chroms = [r.rank_sequence.astype(np.int64) - 1 for r in refs.records]
    rng = np.random.default_rng(seed)
    num_errors = int(round(read_len * error_rate))
    with open(out_path, "w") as out:
        for i in range(num_reads):
            chrom_i = int(rng.integers(0, len(chroms)))
            chrom = chroms[chrom_i]
            start = int(rng.integers(0, len(chrom) - read_len - 1))
            read = mutate_read(chrom, start, read_len, num_errors, rng)
            name = (
                f"id_{i}_chromosome_{chrom_i}_position_{start}"
                f"_max_errors_{num_errors}"
            )
            out.write(f"@{name}\n{_ranks_to_str(read)}\n+\n{'I'*len(read)}\n")
    print(f"wrote {num_reads} reads to {out_path}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
