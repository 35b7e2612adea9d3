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


@pytest.fixture(scope="module")
def repetitive_workload(tmp_path_factory):
    """Tandem-repeat genome: anchors land on every repeat copy, root spans
    overlap heavily, and broken-walk cascades chain through the interval
    cache — the regime the chain-following speculation targets (chr21
    showed 35-50 waves/chunk)."""
    tmp = tmp_path_factory.mktemp("repfuzz")
    rng = np.random.default_rng(7)
    lut = np.frombuffer(b"ACGT", dtype=np.uint8)

    unit = rng.integers(0, 4, size=240)
    copies = []
    for _ in range(18):
        copy = unit.copy()
        for _ in range(int(rng.integers(0, 6))):  # diverged copies
            pos = int(rng.integers(0, len(copy)))
            copy[pos] = (copy[pos] + 1 + rng.integers(0, 3)) % 4
        copies.append(copy)
    genome = np.concatenate(
        [rng.integers(0, 4, size=300)]
        + copies
        + [rng.integers(0, 4, size=300)]
    )
    with open(tmp / "ref.fasta", "w") as handle:
        handle.write(">rep\n")
        handle.write(lut[genome].tobytes().decode() + "\n")

    with open(tmp / "reads.fastq", "w") as handle:
        for i in range(20):
            length = int(rng.integers(200, 500))
            start = int(rng.integers(0, len(genome) - length))
            read = genome[start : start + length].copy()
            for _ in range(int(rng.integers(0, length // 25))):
                pos = int(rng.integers(0, len(read)))
                op = rng.integers(0, 3)
                if op == 0:
                    read[pos] = (read[pos] + 1 + rng.integers(0, 3)) % 4
                elif op == 1 and len(read) > 60:
                    read = np.delete(read, pos)
                else:
                    read = np.insert(read, pos, rng.integers(0, 4))
            seq = lut[read].tobytes().decode()
            handle.write(f"@rep{i}\n{seq}\n+\n{'I' * len(read)}\n")
    return tmp


@pytest.mark.parametrize(
    "args",
    [
        ["--error-probability", "0.06", "--interval-optimization"],
        ["--error-probability", "0.08", "--interval-optimization",
         "--max-anchors-soft", "12", "--max-anchors-hard", "60"],
    ],
)
def test_repetitive_cascade_equivalence(repetitive_workload, tmp_path, args):
    """Cascade-heavy repeats: the batched engine (chain speculation +
    deferred/lazy tracebacks) must stay byte-identical to the sequential
    reference engine with interval optimization on."""
    outputs = {}
    for engine in ("reference", "batched"):
        out = tmp_path / f"{engine}.sam"
        env = dict(os.environ)
        env["FLOXER_TPU_PLATFORM"] = "cpu"
        proc = subprocess.run(
            [
                sys.executable, "-m", "floxer_tpu",
                "--reference", str(repetitive_workload / "ref.fasta"),
                "--queries", str(repetitive_workload / "reads.fastq"),
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
    assert outputs["reference"] == outputs["batched"], f"args {args}"


def test_fused_engine_equivalence(workload, tmp_path):
    """engine=device with the fused one-dispatch wave path forced (CPU
    backend, kernels in interpret mode): the whole pipeline — resident
    banks, fused wave program, aliveness masking, root finalize — must
    yield a byte-identical SAM to the sequential reference engine."""
    outputs = {}
    for tag, engine, fused in (
        ("reference", "reference", False),
        ("fused", "device", True),
    ):
        out = tmp_path / f"{tag}.sam"
        env = dict(os.environ)
        env["FLOXER_TPU_PLATFORM"] = "cpu"
        if fused:
            env["FLOXER_TPU_FORCE_FUSED"] = "1"
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
        outputs[tag] = out.read_text()
    assert outputs["reference"] == outputs["fused"]
