"""CLI surface: help tiers, version, validators, command-line echo."""

import subprocess
import sys

import pytest

from floxer_tpu.cli import CommandLineInput, parse_and_validate


def run_cli(args):
    return subprocess.run(
        [sys.executable, "-m", "floxer_tpu", *args],
        capture_output=True,
        text=True,
    )


def test_version():
    proc = run_cli(["--version"])
    assert proc.returncode == 0
    assert proc.stdout.strip() == "0.1.0"


def test_help_tiers():
    basic = run_cli(["--help"]).stdout
    advanced = run_cli(["--advanced-help"]).stdout
    assert "--reference" in basic
    assert "--anchor-group-order" not in basic
    assert "--anchor-group-order" in advanced
    assert "--seed-errors" in advanced


def test_validator_rejects_bad_seed_errors():
    proc = run_cli(
        ["-r", "x.fasta", "-q", "y.fastq", "-o", "z.sam", "-e", "2", "-s", "9"]
    )
    assert proc.returncode != 0
    assert "range" in proc.stderr


def test_cross_validation_requires_error_config():
    with pytest.raises(ValueError, match="error probability must be given"):
        parse_and_validate(
            ["-r", "x.fasta", "-q", "y.fastq", "-o", "z.sam"]
        )


def test_command_line_call_echo():
    cli = CommandLineInput(
        reference_path="/data/hg38.fasta",
        queries_path="reads.fastq",
        output_path="out.bam",
        query_error_probability=0.07,
        use_interval_optimization=True,
    )
    echo = cli.command_line_call()
    assert echo.startswith("floxer ")
    assert "--reference .../hg38.fasta" in echo
    assert "--queries reads.fastq" in echo
    assert "--error-probability 0.07" in echo
    assert "--interval-optimization" in echo
    assert "--query-errors" not in echo
