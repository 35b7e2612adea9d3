"""CLI entry point: python -m floxer_tpu ... (parity: src/main/floxer.cpp)."""

import sys


def main(argv=None) -> int:
    from .cli import parse_and_validate
    from .pipeline import run

    try:
        cli = parse_and_validate(argv)
    except ValueError as error:
        print(f"[CLI PARSER ERROR]\n{error}", file=sys.stderr)
        return -1
    return run(cli)


if __name__ == "__main__":
    sys.exit(main())
