"""Benchmark: production banded verification kernel throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the ACTUAL production Pallas kernel (ops/pallas_myers_banded.py)
at the production PEX-root shape of the evaluation workload (20 kb reads
at 7% error against ~25 kb reference windows; the hot op of the aligner —
the reference names its seqan3 DP engine as the bottleneck,
CONTRIBUTING.md:3-4). The metric is full-DP-equivalent GCUPS: billions of
(pattern x text) cells per second that a full-matrix engine would have to
compute for the same answers — the banded kernel computes the provably
sufficient band (n - m + 2k + 1 rows, ops/myers_banded.py) and is scored
on the work it replaces. The reference publishes no numbers (BASELINE.md),
so vs_baseline is against a 1.0 GCUPS single-core CPU figure, the typical
throughput of a seqan3-class edit-distance implementation.

NOTE an earlier revision reported a 3209 GCUPS figure measured with
block_until_ready() as the sync point; on this backend that call does not
reliably synchronize and the figure was an artifact. Value downloads are
the only trustworthy sync (docs/STATUS.md environment facts).
"""

import json
import time

import numpy as np


def main():
    from floxer_tpu.backend import ensure_backend

    # the TPU tunnel occasionally fails to register its platform on startup;
    # retry a few times before settling for whatever backend is available
    for _ in range(3):
        try:
            if ensure_backend() == "tpu":
                break
        except Exception:  # noqa: BLE001
            pass
        time.sleep(5)

    import jax

    on_tpu = jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)

    # production root-verification shape: 256 x (20.6 kb read @ 7% error,
    # 24.8 kb reference window), band 256 words
    T, M, N, K = 256, 20_600, 24_800, 1_442
    band_words, iters = 256, 3

    n_pad = -(-N // 1024) * 1024
    texts = rng.integers(1, 5, size=(T, n_pad)).astype(np.uint8)
    texts[:, N:] = 0
    patterns = []
    for t in range(T):
        start = int(rng.integers(0, N - M))
        pattern = texts[t, start : start + M].copy()
        for _ in range(M // 20):  # ~5% planted errors
            pos = int(rng.integers(0, M))
            pattern[pos] = 1 + (pattern[pos] % 4)
        patterns.append(pattern)
    text_lengths = np.full(T, N, dtype=np.int64)
    budgets = np.full(T, K, dtype=np.int64)

    if on_tpu:
        from floxer_tpu.ops.pallas_myers_banded import myers_pallas_banded

        # compile + backend warmup (first execution through the tunnel can
        # be slow; it must not pollute the measurement)
        myers_pallas_banded(
            patterns, texts, text_lengths, budgets, band_words=band_words
        )

        # NOTE: block_until_ready() does not reliably synchronize on this
        # backend; a value download is the only trustworthy sync point, so
        # one is taken after the iteration loop (sync=False keeps results
        # on device inside the loop).
        started = time.perf_counter()
        last = None
        for _ in range(iters):
            last = myers_pallas_banded(
                patterns, texts, text_lengths, budgets,
                band_words=band_words, sync=False,
            )
        np.asarray(last[0])
        elapsed = time.perf_counter() - started
    else:
        # no TPU: bench the production CPU engine instead (lane-parallel
        # banded Myers, myers_host.cpp) at the same shape
        from floxer_tpu.native import native_myers_distance_batch

        windows = [texts[t, :N] for t in range(T)]
        probe = native_myers_distance_batch(
            windows[:8], patterns[:8], num_threads=4, budgets=budgets[:8]
        )
        if probe is None:
            raise SystemExit("no TPU backend and no native toolchain")
        started = time.perf_counter()
        for _ in range(iters):
            native_myers_distance_batch(
                windows, patterns, num_threads=4, budgets=budgets
            )
        elapsed = time.perf_counter() - started

    cells = T * M * N * iters  # full-DP-equivalent work
    gcups = cells / elapsed / 1e9
    baseline_gcups = 1.0  # seqan3-class single-core CPU DP

    print(
        json.dumps(
            {
                "metric": "verification_kernel_gcups",
                "value": round(gcups, 3),
                "unit": "GCUPS",
                "vs_baseline": round(gcups / baseline_gcups, 3),
                # provenance: a CPU interpret-mode smoke number must never
                # be mistaken for a TPU measurement
                "backend": jax.default_backend(),
                "shape": f"T={T} M={M} N={N} k={K} band_words={band_words}",
            }
        )
    )


if __name__ == "__main__":
    main()
