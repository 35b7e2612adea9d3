"""Scratch probe: search a pattern in an index and print the anchor groups.

Analogue of the reference's fmindex_test scratch program
(src/main/fmindex_test.cpp, which demonstrates search_ng22's per-match
alignment strings): for a pattern and error budget, prints every reported
anchor group with its located positions and the verified alignment of the
pattern against each hit window.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from ..alphabet import chars_to_ranks
from ..index.fmindex import FmIndex
from ..ops.dp_reference import AlignmentMode, align_semi_global
from ..search_host import search_seed_groups


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="fmindex_probe",
        description="Search a pattern in a floxer-tpu index and print the "
        "anchor groups with their alignments.",
    )
    parser.add_argument("-i", "--index", required=True)
    parser.add_argument("-p", "--pattern", required=True, help="DNA string")
    parser.add_argument("-e", "--errors", type=int, default=1)
    args = parser.parse_args(argv)

    index = FmIndex.load(args.index)
    pattern = chars_to_ranks(args.pattern)

    groups, total, aborted = search_seed_groups(
        index, pattern, args.errors, 1_000_000
    )
    print(f"pattern length {len(pattern)}, errors {args.errors}: "
          f"{len(groups)} groups, {total} raw anchors, aborted={aborted}")
    for g, group in enumerate(groups):
        print(f"group {g}: lb={group.cursor.lb} count={group.cursor.length} "
              f"errors={group.num_errors}")
        for row in range(group.cursor.length):
            seq_id, pos = index.locate(group.cursor.lb + row)
            window_start = max(pos - args.errors, 0)
            seq_start = int(index.seq_starts[seq_id])
            seq_len = int(index.seq_lengths[seq_id])
            window_len = min(
                len(pattern) + 2 * args.errors + 1, seq_len - window_start
            )
            window = index.text[
                seq_start + window_start : seq_start + window_start + window_len
            ]
            result = align_semi_global(
                np.asarray(window),
                pattern,
                args.errors,
                mode=AlignmentMode.WITH_CIGAR,
                reference_span_offset=window_start,
            )
            cigar = (
                result.alignment.cigar_string() if result.alignment else "-"
            )
            print(f"  ref {seq_id} pos {pos}: cigar {cigar}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
