"""Validate + time the banded Myers kernel on the real TPU.

Correctness vs the full DP oracle at verification-like shapes, then
steady-state timing at the root shape (20 kb pattern, 23 kb window,
7% budget) compared against the full-state large kernel.
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
from floxer_tpu.ops.myers_banded import band_store_bits  # noqa: E402
from floxer_tpu.ops.pallas_myers_banded import myers_pallas_banded  # noqa: E402


def full_oracle(pattern, text):
    dp = semi_global_dp_matrix(text, pattern)
    last = dp[-1]
    end = _rightmost_argmin(last)
    return int(last[end]), end


rng = np.random.default_rng(3)
patterns, texts, budgets = [], [], []
for _ in range(9):
    m = int(rng.integers(200, 1500))
    budget = int(rng.integers(2, max(3, m // 8)))
    n = m + 2 * budget + 1 + int(rng.integers(0, budget))
    text = rng.integers(1, 5, size=n).astype(np.uint8)
    start = int(rng.integers(0, n - m))
    pattern = text[start : start + m].copy()
    for _ in range(int(rng.integers(0, budget))):
        pos = int(rng.integers(0, len(pattern)))
        pattern[pos] = 1 + (pattern[pos] % 4)
    patterns.append(pattern)
    texts.append(text)
    budgets.append(budget)

txt, tlen = pad_batch(texts)
band_bits = max(
    band_store_bits(len(p), len(t), k)
    for p, t, k in zip(patterns, texts, budgets)
)
bw = -(-(-(-band_bits // 32)) // 128) * 128
t0 = time.monotonic()
dist, end = myers_pallas_banded(
    patterns, txt, tlen, np.asarray(budgets), bw, interpret=False
)
print(f"first call (compile): {time.monotonic() - t0:.1f}s", flush=True)

bad = 0
for i, (p, t, k) in enumerate(zip(patterns, texts, budgets)):
    wd, we = full_oracle(p, t)
    if wd <= k:
        if (int(dist[i]), int(end[i])) != (wd, we):
            bad += 1
            print(f"MISMATCH row {i}: got ({dist[i]},{end[i]}) want ({wd},{we})")
    elif int(dist[i]) <= k:
        bad += 1
        print(f"FALSE ACCEPT row {i}")
print("correctness:", "FAIL" if bad else "PASS", flush=True)

# root shape: 64 tasks of 20k pattern, 23141 window, budget 1400
m, B = 20_000, 64
budget = 1400
n = m + 2 * budget + 1 + 1140
pats, wins = [], []
for _ in range(B):
    text = rng.integers(1, 5, size=n).astype(np.uint8)
    start = int(rng.integers(0, n - m))
    p = text[start : start + m].copy()
    idx = rng.integers(0, m, size=budget // 2)
    p[idx] = 1 + (p[idx] % 4)
    pats.append(p)
    wins.append(text)
txt, tlen = pad_batch(wins)
bw_root = -(-(-(-band_store_bits(m, n, budget) // 32)) // 128) * 128
print("root band words:", bw_root, flush=True)
bud = np.full(B, budget)
t0 = time.monotonic()
d, e = myers_pallas_banded(pats, txt, tlen, bud, bw_root, interpret=False)
print(f"root compile+run: {time.monotonic() - t0:.1f}s", flush=True)
for _ in range(3):
    t0 = time.monotonic()
    d, e = myers_pallas_banded(pats, txt, tlen, bud, bw_root, interpret=False)
    dt = time.monotonic() - t0
    gcups = B * m * n / dt / 1e9
    print(f"steady: {dt:.3f}s  {gcups:.0f} full-equivalent GCUPS", flush=True)

# spot-check two roots against the oracle (host DP on 20k x 23k is slow;
# keep it to two)
for i in (0, 1):
    wd, we = full_oracle(pats[i], wins[i])
    ok = (int(d[i]), int(e[i])) == (wd, we) if wd <= budget else int(d[i]) > budget
    print(f"root row {i}: kernel=({int(d[i])},{int(e[i])}) oracle=({wd},{we}) {'OK' if ok else 'BAD'}", flush=True)
