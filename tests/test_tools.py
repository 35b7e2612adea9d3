"""Research tools: simulate -> align -> verify round trip (the exactness
regression harness), plus smoke tests for the other tools."""

import subprocess
import sys

import pytest


def run_tool(module, args):
    return subprocess.run(
        [sys.executable, "-m", f"floxer_tpu.tools.{module}", *args],
        capture_output=True,
        text=True,
    )


@pytest.fixture(scope="module")
def simulated(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("sim")
    genome = tmp / "genome.fasta"
    reads = tmp / "reads.fastq"
    proc = run_tool(
        "simulated_dataset",
        [
            "create",
            "--genomes", str(genome),
            "--reads", str(reads),
            "--chromosome-length", "3000",
            "--num-chromosomes", "2",
            "--read-length", "150",
            "--num-reads", "12",
            "--error-rate", "0.04",
        ],
    )
    assert proc.returncode == 0, proc.stderr
    return tmp, genome, reads


def test_simulate_align_verify_roundtrip(simulated):
    """Every simulated read must be found at its origin with <= max errors —
    the reference's central exactness property (README.md:10), checked with
    the same harness it used (simulated_dataset verify)."""
    tmp, genome, reads = simulated
    out = tmp / "aligned.sam"
    proc = subprocess.run(
        [
            sys.executable, "-m", "floxer_tpu",
            "--reference", str(genome),
            "--queries", str(reads),
            "--output", str(out),
            "--error-probability", "0.05",
        ],
        capture_output=True,
        text=True,
    )
    assert proc.returncode == 0, proc.stderr

    verify = run_tool(
        "simulated_dataset",
        ["verify", "--alignments", str(out), "--allowed-pos-diff", "7"],
    )
    assert verify.returncode == 0, verify.stderr
    assert "NotFound" not in verify.stdout, verify.stdout
    assert "FoundSuboptimal" not in verify.stdout, verify.stdout
    assert verify.stdout.count("FoundOptimal") == 12, verify.stdout


def test_view_pex_tree():
    proc = run_tool(
        "view_pex_tree",
        ["--query-length", "12", "--query-errors", "3", "--seed-errors", "0"],
    )
    assert proc.returncode == 0, proc.stderr
    assert proc.stdout.startswith("graph {")
    assert proc.stdout.count("errors:") == 7  # 3 inner nodes + 4 leaves


def test_fastq_split(tmp_path, simulated):
    _, _, reads = simulated
    ids = tmp_path / "ids.txt"
    # pick two read ids
    names = [
        line[1:].split()[0]
        for line in open(reads)
        if line.startswith("@")
    ][:2]
    ids.write_text("\n".join(names) + "\n")
    chosen = tmp_path / "chosen.fastq"
    rest = tmp_path / "rest.fastq"
    proc = run_tool(
        "fastq_split",
        [
            "-i", str(reads), "-d", str(ids),
            "-c", str(chosen), "-r", str(rest),
        ],
    )
    assert proc.returncode == 0, proc.stderr
    assert chosen.read_text().count("@id_") == 2
    assert rest.read_text().count("@id_") == 10


def test_count_random_occurrences(tmp_path, simulated):
    tmp, genome, _ = simulated
    # build an index artifact first
    index_path = tmp_path / "probe.npz"
    proc = subprocess.run(
        [
            sys.executable, "-m", "floxer_tpu",
            "--reference", str(genome),
            "--queries", str(tmp / "reads.fastq"),
            "--output", str(tmp_path / "dummy.sam"),
            "--query-errors", "2",
            "--index", str(index_path),
        ],
        capture_output=True,
        text=True,
    )
    assert proc.returncode == 0, proc.stderr
    proc = run_tool(
        "count_random_occurrences",
        [
            "-i", str(index_path),
            "-m", "8", "-n", "10",
            "-s", "20",
            "-e", "0", "-x", "1",
        ],
    )
    assert proc.returncode == 0, proc.stderr
    assert proc.stdout.startswith("runs = [")
    assert "num_errors = 0" in proc.stdout
    assert "num_errors = 1" in proc.stdout


def test_compare_aligner_outputs(tmp_path, simulated):
    tmp, genome, reads = simulated
    out = tmp / "aligned.sam"
    # compare the aligner's own output against itself: everything must be
    # both-mapped / both-unmapped symmetric
    proc = run_tool(
        "compare_aligner_outputs",
        ["-r", str(out), "-n", str(out), "-e", "0.05"],
    )
    assert proc.returncode == 0, proc.stderr
    assert "[general_stats]" in proc.stdout
    assert "floxer_unmapped_and_minimap_mapped = 0" in proc.stdout
    assert "minimap_unmapped_and_floxer_mapped = 0" in proc.stdout
    assert "[floxer_stats_if_floxer_mapped]" in proc.stdout


def test_compare_aligner_outputs_accepts_bam(tmp_path, simulated):
    """BAM input parity with seqan3's sam_file_input: comparing the SAM
    against the BAM of the same run must classify identically to
    SAM-vs-SAM (compare_aligner_outputs.cpp input handling)."""
    tmp, genome, reads = simulated
    sam = tmp / "aligned.sam"
    bam = tmp_path / "aligned.bam"
    proc = subprocess.run(
        [
            sys.executable, "-m", "floxer_tpu",
            "--reference", str(genome),
            "--queries", str(reads),
            "--output", str(bam),
            "--error-probability", "0.05",
        ],
        capture_output=True,
        text=True,
    )
    assert proc.returncode == 0, proc.stderr

    sam_vs_bam = run_tool(
        "compare_aligner_outputs",
        ["-r", str(sam), "-n", str(bam), "-e", "0.05"],
    )
    assert sam_vs_bam.returncode == 0, sam_vs_bam.stderr
    sam_vs_sam = run_tool(
        "compare_aligner_outputs",
        ["-r", str(sam), "-n", str(sam), "-e", "0.05"],
    )
    assert sam_vs_sam.returncode == 0, sam_vs_sam.stderr
    assert sam_vs_bam.stdout == sam_vs_sam.stdout
