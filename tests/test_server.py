"""Server mode: a persistent daemon executes CLI jobs over a Unix socket
with byte-identical output to direct invocations (server.py)."""

import subprocess
import sys
import time


def _read_sam_body(path):
    return [
        line
        for line in open(path).read().splitlines()
        if not line.startswith("@PG")  # PG line may embed the argv
    ]


def test_server_runs_jobs_with_identical_output(tmp_path, data_dir):
    import os

    sock = str(tmp_path / "floxer.sock")
    env = dict(os.environ)
    env["FLOXER_TPU_PLATFORM"] = "cpu"
    daemon = subprocess.Popen(
        [sys.executable, "-m", "floxer_tpu", "--serve", sock],
        stderr=subprocess.PIPE,
        text=True,
        env=env,
    )
    try:
        for _ in range(100):
            if os.path.exists(sock):
                break
            time.sleep(0.1)
        assert os.path.exists(sock), "daemon did not create its socket"

        base = [
            "--reference", str(data_dir / "reference.fasta"),
            "--queries", str(data_dir / "queries.fastq"),
            "--interval-optimization",
            "--query-errors", "2",
            "--extra-verification-ratio", "2",
        ]

        direct_out = tmp_path / "direct.sam"
        proc = subprocess.run(
            [sys.executable, "-m", "floxer_tpu", *base, "-o", str(direct_out)],
            capture_output=True, text=True, env=env,
        )
        assert proc.returncode == 0, proc.stderr

        # two jobs through the daemon: the second exercises the warm path
        # (cached index would apply with -i; logger/caches reused)
        for name in ("via_server1.sam", "via_server2.sam"):
            out = tmp_path / name
            proc = subprocess.run(
                [
                    sys.executable, "-m", "floxer_tpu",
                    "--server", sock, *base, "-o", str(out),
                ],
                capture_output=True, text=True, env=env,
            )
            assert proc.returncode == 0, proc.stderr
            assert proc.stdout == ""  # log discipline: stdout stays empty
            assert _read_sam_body(out) == _read_sam_body(direct_out)

        # parser errors are reported, not fatal to the daemon
        proc = subprocess.run(
            [
                sys.executable, "-m", "floxer_tpu", "--server", sock,
                "--reference", str(data_dir / "reference.fasta"),
                "--queries", str(data_dir / "queries.fastq"),
                "-o", str(tmp_path / "bad.sam"),
                # no error budget given -> cross-option validation error
            ],
            capture_output=True, text=True, env=env,
        )
        assert proc.returncode != 0
        assert "error" in proc.stderr.lower()

        # daemon still alive and serving after the failed job
        out = tmp_path / "after_error.sam"
        proc = subprocess.run(
            [
                sys.executable, "-m", "floxer_tpu",
                "--server", sock, *base, "-o", str(out),
            ],
            capture_output=True, text=True, env=env,
        )
        assert proc.returncode == 0, proc.stderr
        assert _read_sam_body(out) == _read_sam_body(direct_out)

        # a client that disconnects right after submitting must not kill
        # the job or the daemon: the output file still gets written
        import json
        import socket as socket_mod

        dropped_out = tmp_path / "dropped_client.sam"
        with socket_mod.socket(socket_mod.AF_UNIX, socket_mod.SOCK_STREAM) as c:
            c.connect(sock)
            request = {
                "argv": [*base, "-o", str(dropped_out)],
                "cwd": str(tmp_path),
            }
            c.sendall((json.dumps(request) + "\n").encode())
            # disconnect immediately, without reading any response
        for _ in range(300):
            if dropped_out.exists() and _read_sam_body(dropped_out) == _read_sam_body(direct_out):
                break
            time.sleep(0.1)
        assert _read_sam_body(dropped_out) == _read_sam_body(direct_out)
        assert daemon.poll() is None, "daemon died after client disconnect"

        proc = subprocess.run(
            [sys.executable, "-m", "floxer_tpu", "--shutdown-server", sock],
            capture_output=True, text=True, env=env,
        )
        assert proc.returncode == 0
        daemon.wait(timeout=30)
    finally:
        if daemon.poll() is None:
            daemon.kill()
            daemon.wait()
