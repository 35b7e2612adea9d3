"""Real multi-process execution: two jax.distributed CPU processes running
the CLI end-to-end, with collective stats merge and SAM shard merge on
process 0 (SURVEY.md section 5.8 — the communication backend the reference
never had)."""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

DATA = Path(__file__).parent / "data"


def _free_port() -> int:
    sock = socket.socket()
    sock.bind(("127.0.0.1", 0))
    port = sock.getsockname()[1]
    sock.close()
    return port


def _spawn(process_id, num_processes, port, tmp_path, out_name, extra=()):
    env = dict(os.environ)
    env.update(
        {
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": str(num_processes),
            "JAX_PROCESS_ID": str(process_id),
            "JAX_PLATFORMS": "cpu",
            "FLOXER_TPU_PLATFORM": "cpu",
            # exactly one CPU device per process: the stats allreduce mesh
            # is one device per process
            "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
        }
    )
    command = [
        sys.executable, "-m", "floxer_tpu",
        "--reference", str(DATA / "reference.fasta"),
        "--queries", str(DATA / "queries.fastq"),
        "--output", str(tmp_path / out_name),
        "--query-errors", "2",
        "--extra-verification-ratio", "2",
        "--interval-optimization",
        "--stats", str(tmp_path / f"stats_{process_id}.toml"),
        *extra,
    ]
    return subprocess.Popen(
        command, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )


def _single_run(tmp_path):
    env = dict(os.environ)
    env.update({"FLOXER_TPU_PLATFORM": "cpu", "JAX_PLATFORMS": "cpu"})
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    out = tmp_path / "single.sam"
    command = [
        sys.executable, "-m", "floxer_tpu",
        "--reference", str(DATA / "reference.fasta"),
        "--queries", str(DATA / "queries.fastq"),
        "--output", str(out),
        "--query-errors", "2",
        "--extra-verification-ratio", "2",
        "--interval-optimization",
        "--stats", str(tmp_path / "stats_single.toml"),
    ]
    proc = subprocess.run(command, env=env, capture_output=True, text=True)
    assert proc.returncode == 0, proc.stderr
    return out


def _stable_stats_lines(path):
    """TOML lines excluding the timing histograms (run-dependent)."""
    lines = []
    skipping = False
    for line in open(path):
        line = line.rstrip("\n")
        if line.startswith("["):
            skipping = "milliseconds" in line
        if not skipping:
            lines.append(line)
    return lines


@pytest.mark.timeout(600)
def test_two_process_distributed_run_matches_single(tmp_path):
    port = _free_port()
    procs = [
        _spawn(process_id, 2, port, tmp_path, "dist.sam")
        for process_id in range(2)
    ]
    outs = [proc.communicate(timeout=420) for proc in procs]
    for proc, (stdout, stderr) in zip(procs, outs):
        assert proc.returncode == 0, stderr
        assert stdout == "", "stdout must stay empty"

    single = _single_run(tmp_path)

    # process 0 merged the canonical SAM; byte-identical to single-process
    merged = tmp_path / "dist.sam"
    assert merged.exists()
    assert merged.read_text() == single.read_text()

    # shard files exist and partition the queries (strided by internal id)
    shard0 = (tmp_path / "dist.shard0.sam").read_text()
    shard1 = (tmp_path / "dist.shard1.sam").read_text()
    names0 = {
        line.split("\t", 1)[0]
        for line in shard0.splitlines()
        if not line.startswith("@")
    }
    names1 = {
        line.split("\t", 1)[0]
        for line in shard1.splitlines()
        if not line.startswith("@")
    }
    assert names0 and names1
    assert not (names0 & names1)

    # collectively merged stats (process 0's TOML) equal the single-run
    # stats on every deterministic histogram
    assert _stable_stats_lines(
        tmp_path / "stats_0.toml"
    ) == _stable_stats_lines(tmp_path / "stats_single.toml")
    # non-zero processes emit no stats report
    assert not (tmp_path / "stats_1.toml").exists()


@pytest.mark.timeout(600)
def test_two_process_distributed_bam_merge(tmp_path):
    """Distributed BAM output: process 0 merges the BGZF shards into one
    BAM whose records match the single-process run (reference writes BAM
    directly in all modes, output.cpp:25-108)."""
    from floxer_tpu.io.sam import read_alignment_records

    port = _free_port()
    procs = [
        _spawn(process_id, 2, port, tmp_path, "dist.bam")
        for process_id in range(2)
    ]
    outs = [proc.communicate(timeout=420) for proc in procs]
    for proc, (stdout, stderr) in zip(procs, outs):
        assert proc.returncode == 0, stderr
        assert stdout == "", "stdout must stay empty"

    single = _single_run(tmp_path)

    merged = tmp_path / "dist.bam"
    assert merged.exists()
    # BGZF magic + BAM magic parse, and record streams match exactly
    merged_records = list(read_alignment_records(merged))
    single_records = list(read_alignment_records(single))
    assert merged_records == single_records
