"""Split a FASTQ into chosen-IDs / rest by an ID list file
(parity: src/main/fastq_split.cpp)."""

from __future__ import annotations

import argparse
import sys

from ..io.sequence_io import extract_record_id, read_fastq


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="fastq_split",
        description="Split a FASTQ file into records whose ids are in a "
        "given list and the rest.",
    )
    parser.add_argument("-i", "--input", required=True)
    parser.add_argument(
        "-d", "--ids", required=True, help="File with one record id per line."
    )
    parser.add_argument("-c", "--chosen-output", required=True)
    parser.add_argument("-r", "--rest-output", required=True)
    args = parser.parse_args(argv)

    with open(args.ids) as handle:
        chosen_ids = {line.strip() for line in handle if line.strip()}

    num_chosen = 0
    num_rest = 0
    with open(args.chosen_output, "wb") as chosen, open(
        args.rest_output, "wb"
    ) as rest:
        for tag, seq, qual in read_fastq(args.input):
            record = (
                b"@" + tag.encode("ascii", errors="replace") + b"\n"
                + seq + b"\n+\n" + qual + b"\n"
            )
            if extract_record_id(tag) in chosen_ids:
                chosen.write(record)
                num_chosen += 1
            else:
                rest.write(record)
                num_rest += 1

    print(f"chosen: {num_chosen}, rest: {num_rest}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
