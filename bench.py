"""Benchmark: banded verification kernel throughput (GCUPS) on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The metric is billions of DP cell updates per second (GCUPS) of the Myers
bit-parallel semi-global edit-distance kernel — the hot op of the aligner
(the reference's seqan3 DP is its bottleneck, CONTRIBUTING.md:3-4). The
reference publishes no numbers (BASELINE.md), so vs_baseline is measured
against a 1.0 GCUPS single-core CPU figure, the typical throughput of a
seqan3-class banded edit-distance implementation.
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
    import jax.numpy as jnp

    from floxer_tpu.ops.myers import build_peq_vectorized, myers_batched

    rng = np.random.default_rng(0)

    # production-ish inner-node verification shape: many medium pairs
    B, M, N = 256, 512, 1024
    texts = rng.integers(1, 5, size=(B, N)).astype(np.uint8)
    patterns = np.zeros((B, M), dtype=np.uint8)
    for b in range(B):
        start = int(rng.integers(0, N - M))
        patterns[b] = texts[b, start : start + M]
        # plant some errors
        for _ in range(8):
            pos = int(rng.integers(0, M))
            patterns[b, pos] = 1 + (patterns[b, pos] % 4)
    pattern_lengths = np.full(B, M, dtype=np.int32)
    text_lengths = np.full(B, N, dtype=np.int32)

    peq = jnp.asarray(build_peq_vectorized(patterns, pattern_lengths))
    plen = jnp.asarray(pattern_lengths)
    txt = jnp.asarray(texts.astype(np.int32))
    tlen = jnp.asarray(text_lengths)
    W = peq.shape[2]

    # compile + backend warmup (first execution through the tunnel can be
    # slow; it must not pollute the measurement)
    d, e = myers_batched(peq, plen, txt, tlen, num_words=W)
    np.asarray(d)

    # NOTE: block_until_ready() does not reliably synchronize on this
    # backend (timings read absurdly fast); a value download is the only
    # trustworthy sync point, so one is taken after the iteration loop.
    iters = 10
    started = time.perf_counter()
    for _ in range(iters):
        d, e = myers_batched(peq, plen, txt, tlen, num_words=W)
    np.asarray(d)
    elapsed = time.perf_counter() - started

    cells = B * M * N * iters
    gcups = cells / elapsed / 1e9
    baseline_gcups = 1.0  # seqan3-class single-core CPU banded DP

    print(
        json.dumps(
            {
                "metric": "verification_kernel_gcups",
                "value": round(gcups, 3),
                "unit": "GCUPS",
                "vs_baseline": round(gcups / baseline_gcups, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
