"""Print a PEX tree as Graphviz DOT (parity: src/main/view_pex_tree.cpp)."""

from __future__ import annotations

import argparse
import sys

from ..pex import BuildStrategy, build_pex_tree


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="view_pex_tree",
        description="Print the PEX tree for a (length, errors, seed-errors, "
        "strategy) configuration as Graphviz DOT.",
    )
    parser.add_argument("-l", "--query-length", type=int, required=True)
    parser.add_argument("-e", "--query-errors", type=int, required=True)
    parser.add_argument("-s", "--seed-errors", type=int, default=2)
    parser.add_argument(
        "-b",
        "--bottom-up-pex-tree",
        action="store_true",
        help="Build the PEX tree using the bottom up strategy.",
    )
    args = parser.parse_args(argv)

    strategy = (
        BuildStrategy.BOTTOM_UP
        if args.bottom_up_pex_tree
        else BuildStrategy.RECURSIVE
    )
    tree = build_pex_tree(
        args.query_length, args.query_errors, args.seed_errors, strategy
    )
    print(tree.dot_statement(args.seed_errors), end="")
    return 0


if __name__ == "__main__":
    sys.exit(main())
