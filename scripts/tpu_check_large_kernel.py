"""Validate + time pallas_myers_large on the real TPU chip.

Correctness vs the DP oracle on random root-like shapes, then a steady-state
timing at a representative root shape (pattern ~20 kb, window ~23 kb).
"""

import time

import numpy as np

from floxer_tpu.backend import ensure_backend

for _ in range(6):
    try:
        if ensure_backend() == "tpu":
            break
    except Exception:  # noqa: BLE001
        pass
    time.sleep(5)
import jax  # noqa: E402

print("backend:", jax.default_backend(), flush=True)
if jax.default_backend() != "tpu":
    raise SystemExit("no TPU backend — rerun")

from floxer_tpu.ops.device_dp import pad_batch  # noqa: E402
from floxer_tpu.ops.dp_reference import (  # noqa: E402
    _rightmost_argmin,
    semi_global_dp_matrix,
)
from floxer_tpu.ops.pallas_myers_large import myers_pallas_large  # noqa: E402


def oracle(pattern, text):
    dp = semi_global_dp_matrix(text, pattern)
    last = dp[-1]
    end = _rightmost_argmin(last)
    return int(last[end]), end


rng = np.random.default_rng(7)
patterns, texts = [], []
for _ in range(9):
    m = int(rng.integers(50, 900))
    n = int(rng.integers(m, m + 300))
    text = rng.integers(1, 5, size=n).astype(np.uint8)
    start = int(rng.integers(0, max(1, n - m)))
    pattern = text[start : start + m].copy()
    for _ in range(int(rng.integers(0, 20))):
        pos = int(rng.integers(0, len(pattern)))
        pattern[pos] = 1 + (pattern[pos] % 4)
    patterns.append(pattern)
    texts.append(text)

pat, plen = pad_batch(patterns)
txt, tlen = pad_batch(texts)
t0 = time.monotonic()
distance, end = myers_pallas_large(pat, plen, txt, tlen)
distance = np.asarray(distance)
end = np.asarray(end)
print(f"first call (compile): {time.monotonic() - t0:.1f}s", flush=True)

bad = 0
for i, (pattern, text) in enumerate(zip(patterns, texts)):
    want_d, want_e = oracle(pattern, text)
    if distance[i] != want_d or end[i] != want_e:
        bad += 1
        print(f"MISMATCH row {i}: got ({distance[i]},{end[i]}) want ({want_d},{want_e})")
print("correctness:", "FAIL" if bad else "PASS", flush=True)

# Steady-state timing at root shape: 64 pairs of 20k pattern x 23k window.
m, n, B = 20_000, 23_000, 64
pats = [rng.integers(1, 5, size=m).astype(np.uint8) for _ in range(B)]
txts = [rng.integers(1, 5, size=n).astype(np.uint8) for _ in range(B)]
pat, plen = pad_batch(pats)
txt, tlen = pad_batch(txts)
t0 = time.monotonic()
d, e = myers_pallas_large(pat, plen, txt, tlen)
np.asarray(d)
print(f"root-shape compile+run: {time.monotonic() - t0:.1f}s", flush=True)
for _ in range(3):
    t0 = time.monotonic()
    d, e = myers_pallas_large(pat, plen, txt, tlen)
    np.asarray(d)
    dt = time.monotonic() - t0
    gcups = B * m * n / dt / 1e9
    print(f"steady: {dt:.3f}s  {gcups:.0f} GCUPS", flush=True)
