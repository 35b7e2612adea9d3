"""Multi-host scaling harness: run N strided shards in parallel, merge,
and report reads/s scaling efficiency (BASELINE.md north star: >= 0.8).

Each shard is a separate aligner process with --num-hosts N --host-id i —
exactly the per-host invocation on a pod slice, here launched locally so the
efficiency of the sharding + merge path is measurable anywhere.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time


def run_shards(num_hosts, base_args, output_prefix):
    procs = []
    outputs = []
    for host_id in range(num_hosts):
        output = f"{output_prefix}.shard{host_id}.sam"
        outputs.append(output)
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, "-m", "floxer_tpu",
                    *base_args,
                    "--output", output,
                    "--num-hosts", str(num_hosts),
                    "--host-id", str(host_id),
                ],
                stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL,
            )
        )
    for proc in procs:
        if proc.wait() != 0:
            raise RuntimeError(f"shard failed with {proc.returncode}")
    return outputs


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="scaling_bench")
    parser.add_argument("-r", "--reference", required=True)
    parser.add_argument("-q", "--queries", required=True)
    parser.add_argument("-o", "--output-prefix", required=True)
    parser.add_argument("-n", "--num-hosts", type=int, default=2)
    parser.add_argument("-p", "--error-probability", default="0.07")
    parser.add_argument("-i", "--index", default=None)
    parser.add_argument(
        "--extra",
        default="--interval-optimization",
        help="extra aligner arguments as one space-separated string",
    )
    args = parser.parse_args(argv)

    base = [
        "--reference", args.reference,
        "--queries", args.queries,
        *(
            ["--error-probability", args.error_probability]
            if "--query-errors" not in args.extra
            else []
        ),
        *args.extra.split(),
    ]
    if args.index:
        base += ["--index", args.index]

    num_queries = sum(
        1 for line in open(args.queries) if line.startswith("@")
    )

    started = time.monotonic()
    run_shards(1, base, args.output_prefix + ".single")
    single_seconds = time.monotonic() - started

    started = time.monotonic()
    outputs = run_shards(args.num_hosts, base, args.output_prefix)
    sharded_seconds = time.monotonic() - started

    from ..parallel.multihost import merge_sam_shards

    merge_started = time.monotonic()
    merge_sam_shards(outputs, f"{args.output_prefix}.merged.sam")
    merge_seconds = time.monotonic() - merge_started

    single_rps = num_queries / single_seconds
    sharded_rps = num_queries / (sharded_seconds + merge_seconds)
    efficiency = sharded_rps / (single_rps * args.num_hosts)

    print(
        json.dumps(
            {
                "num_hosts": args.num_hosts,
                "num_queries": num_queries,
                "single_host_reads_per_s": round(single_rps, 3),
                "sharded_reads_per_s": round(sharded_rps, 3),
                "merge_seconds": round(merge_seconds, 3),
                "scaling_efficiency": round(efficiency, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
