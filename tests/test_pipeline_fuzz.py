"""Whole-pipeline randomized equivalence: reference vs batched engine on a
generated workload, byte-identical SAM required across option combinations."""

import os
import subprocess
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def workload(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("fuzz")
    rng = np.random.default_rng(123)
    lut = np.frombuffer(b"ACGT", dtype=np.uint8)

    genome = rng.integers(0, 4, size=5000)
    with open(tmp / "ref.fasta", "w") as handle:
        handle.write(">c0\n")
        handle.write(lut[genome[:3000]].tobytes().decode() + "\n")
        handle.write(">c1\n")
        handle.write(lut[genome[3000:]].tobytes().decode() + "\n")

    with open(tmp / "reads.fastq", "w") as handle:
        for i in range(25):
            length = int(rng.integers(120, 400))
            start = int(rng.integers(0, 5000 - length))
            read = genome[start : start + length].copy()
            # mutate: substitutions + indels
            for _ in range(int(rng.integers(0, length // 30))):
                pos = int(rng.integers(0, len(read)))
                op = rng.integers(0, 3)
                if op == 0:
                    read[pos] = (read[pos] + 1 + rng.integers(0, 3)) % 4
                elif op == 1 and len(read) > 50:
                    read = np.delete(read, pos)
                else:
                    read = np.insert(read, pos, rng.integers(0, 4))
            seq = lut[read].tobytes().decode()
            handle.write(f"@fuzz{i}\n{seq}\n+\n{'I' * len(read)}\n")
    return tmp


VARIANTS = [
    ["--error-probability", "0.05"],
    ["--query-errors", "12", "--seed-errors", "1"],
    ["--error-probability", "0.04", "--bottom-up-pex-tree"],
    ["--error-probability", "0.05", "--interval-optimization"],
    ["--error-probability", "0.05", "--without-cigar"],
    ["--error-probability", "0.05", "--direct-full-verification",
     "--interval-optimization"],
    ["--query-errors", "9", "--anchor-choice-strategy", "full_groups"],
]


def test_device_engine_resident_equivalence(workload, tmp_path):
    """engine=device on the CPU backend (kernels in interpret mode) with
    every eligible task forced through the banded kernel: this exercises
    the device-resident gather path (ops/resident.py) end-to-end — the
    pipeline uploads reference/read banks and the batcher dispatches
    offsets, which must yield a byte-identical SAM."""
    outputs = {}
    for engine in ("reference", "device"):
        out = tmp_path / f"{engine}.sam"
        env = dict(os.environ)
        env["FLOXER_TPU_PLATFORM"] = "cpu"
        env["FLOXER_TPU_FORCE_BANDED"] = "1"
        proc = subprocess.run(
            [
                sys.executable, "-m", "floxer_tpu",
                "--reference", str(workload / "ref.fasta"),
                "--queries", str(workload / "reads.fastq"),
                "--output", str(out),
                "--engine", engine,
                "--error-probability", "0.05",
                "--interval-optimization",
            ],
            capture_output=True,
            text=True,
            env=env,
        )
        assert proc.returncode == 0, proc.stderr
        outputs[engine] = out.read_text()
    assert outputs["reference"] == outputs["device"]


@pytest.mark.parametrize("variant", range(len(VARIANTS)))
def test_engine_equivalence_fuzz(workload, tmp_path, variant):
    args = VARIANTS[variant]
    outputs = {}
    for engine in ("reference", "batched"):
        out = tmp_path / f"{engine}.sam"
        env = dict(os.environ)
        env["FLOXER_TPU_PLATFORM"] = "cpu"
        proc = subprocess.run(
            [
                sys.executable, "-m", "floxer_tpu",
                "--reference", str(workload / "ref.fasta"),
                "--queries", str(workload / "reads.fastq"),
                "--output", str(out),
                "--engine", engine,
                *args,
            ],
            capture_output=True,
            text=True,
            env=env,
        )
        assert proc.returncode == 0, proc.stderr
        outputs[engine] = out.read_text()
    assert outputs["reference"] == outputs["batched"], f"variant {args}"


def test_soa_legacy_verify_equivalence(workload, tmp_path):
    """The SoA wave loop (native cache scan, array walks) and the legacy
    object wave loop must produce byte-identical SAM AND identical stats
    TOML (the avoided-root histogram arrives via the vectorized path)."""
    outputs = {}
    for mode in ("soa", "legacy"):
        out = tmp_path / f"{mode}.sam"
        stats = tmp_path / f"{mode}.toml"
        env = dict(os.environ)
        env["FLOXER_TPU_PLATFORM"] = "cpu"
        if mode == "legacy":
            env["FLOXER_TPU_LEGACY_VERIFY"] = "1"
        proc = subprocess.run(
            [
                sys.executable, "-m", "floxer_tpu",
                "--reference", str(workload / "ref.fasta"),
                "--queries", str(workload / "reads.fastq"),
                "--output", str(out),
                "--stats", str(stats),
                "--error-probability", "0.05",
                "--interval-optimization",
            ],
            capture_output=True,
            text=True,
            env=env,
        )
        assert proc.returncode == 0, proc.stderr

        def strip_time_sections(toml: str) -> str:
            # the milliseconds_* histograms are wall-clock and vary run to
            # run; every content-derived histogram must match exactly
            head, _, _ = toml.partition("[milliseconds_spent_in_search")
            return head

        outputs[mode] = (out.read_text(), strip_time_sections(stats.read_text()))
    assert outputs["soa"][0] == outputs["legacy"][0]
    assert outputs["soa"][1] == outputs["legacy"][1]
