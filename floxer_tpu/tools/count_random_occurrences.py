"""FM-index repetitiveness probe (parity: src/main/count_random_occurrences.cpp).

Searches random patterns per (length, errors) combination in a floxer-tpu
index and prints average occurrence counts as TOML — the empirical basis for
the anchor-cap defaults. (The reference draws pattern ranks 0..3, i.e. dna4
ranks that collide with the index sentinel; this version draws real DNA
ranks 1..4.)
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from ..index.fmindex import FmIndex
from ..search_host import search_seed_groups


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="count_random_occurrences",
        description="Search random strings in an FM-Index and output "
        "statistics on how often they were found on average.",
    )
    parser.add_argument(
        "-i", "--index", required=True,
        help="The FM-Index file in which to search (created by floxer-tpu).",
    )
    parser.add_argument("-m", "--min-length", type=int, default=10)
    parser.add_argument("-n", "--max-length", type=int, default=60)
    parser.add_argument(
        "-s", "--searches", type=int, default=1_000_000,
        help="The number of searches per length/error combination.",
    )
    parser.add_argument("-e", "--min-errors", type=int, default=0)
    parser.add_argument("-x", "--max-errors", type=int, default=3)
    args = parser.parse_args(argv)

    index = FmIndex.load(args.index)
    rng = np.random.default_rng(837103474)

    print("runs = [")
    for num_errors in range(args.min_errors, args.max_errors + 1):
        count_averages = []
        for length in range(args.min_length, args.max_length + 1):
            total = 0
            for _ in range(args.searches):
                pattern = rng.integers(1, 5, size=length).astype(np.uint8)
                groups, raw_total, _ = search_seed_groups(
                    index, pattern, num_errors, 1 << 60
                )
                total += raw_total
            count_averages.append(total / args.searches)
        averages = ", ".join(f"{a}" for a in count_averages)
        print(
            f"    {{ num_errors = {num_errors}, "
            f"count_averages = [{averages}] }},"
        )
    print("]")
    return 0


if __name__ == "__main__":
    sys.exit(main())
