"""Multi-host sharding + merge and checkpoint/resume."""

import os
import subprocess
import sys

import pytest


def run_aligner(args):
    env = dict(os.environ)
    env["FLOXER_TPU_PLATFORM"] = "cpu"
    return subprocess.run(
        [sys.executable, "-m", "floxer_tpu", *args],
        capture_output=True,
        text=True,
        env=env,
    )


BASE = [
    "--query-errors", "2", "--seed-errors", "1",
    "--extra-verification-ratio", "2", "--interval-optimization",
]


def _data_args(data_dir, output):
    return [
        "--reference", str(data_dir / "reference.fasta"),
        "--queries", str(data_dir / "queries.fastq"),
        "--output", str(output),
    ]


def test_two_host_shards_merge_to_single_host_output(tmp_path, data_dir):
    single = tmp_path / "single.sam"
    proc = run_aligner(_data_args(data_dir, single) + BASE)
    assert proc.returncode == 0, proc.stderr

    shards = []
    for host_id in range(2):
        shard = tmp_path / f"shard{host_id}.sam"
        proc = run_aligner(
            _data_args(data_dir, shard)
            + BASE
            + ["--num-hosts", "2", "--host-id", str(host_id)]
        )
        assert proc.returncode == 0, proc.stderr
        shards.append(shard)

    merged = tmp_path / "merged.sam"
    proc = subprocess.run(
        [
            sys.executable, "-m", "floxer_tpu.tools.merge_sam",
            "-i", *map(str, shards), "-o", str(merged),
        ],
        capture_output=True,
        text=True,
    )
    assert proc.returncode == 0, proc.stderr
    assert merged.read_text() == single.read_text()


def test_resume_continues_where_left_off(tmp_path, data_dir):
    full = tmp_path / "full.sam"
    proc = run_aligner(_data_args(data_dir, full) + BASE)
    assert proc.returncode == 0, proc.stderr
    assert not (tmp_path / "full.sam.progress").exists()

    # simulate an interrupted run: process only the first 2 queries by
    # crafting the progress file + truncated output from the full run
    partial = tmp_path / "partial.sam"
    lines = full.read_text().splitlines(keepends=True)
    header = [line for line in lines if line.startswith("@")]
    records = [line for line in lines if not line.startswith("@")]
    qnames = []
    for record in records:
        qname = record.split("\t", 1)[0]
        if qname not in qnames:
            qnames.append(qname)
    first_two = set(qnames[:2])
    kept = [r for r in records if r.split("\t", 1)[0] in first_two]
    partial.write_text("".join(header + kept))
    (tmp_path / "partial.sam.progress").write_text("2\n")

    proc = run_aligner(_data_args(data_dir, partial) + BASE + ["--resume"])
    assert proc.returncode == 0, proc.stderr
    assert partial.read_text() == full.read_text()
    assert not (tmp_path / "partial.sam.progress").exists()
