"""Sweep tasks-per-grid-step for the banded kernel at the root shape."""

import importlib
import os
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
from floxer_tpu.ops.myers_banded import band_store_bits  # noqa: E402

rng = np.random.default_rng(1)
m, B, budget = 20_000, 64, 1400
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
bud = np.full(B, budget)

first_ref = None
for group in (8, 16, 32, 64):
    os.environ["FLOXER_TPU_BANDED_GROUP"] = str(group)
    import floxer_tpu.ops.pallas_myers_banded as pmb

    importlib.reload(pmb)
    bw = -(-(-(-band_store_bits(m, n, budget) // 32)) // 128) * 128
    t0 = time.monotonic()
    d, e = pmb.myers_pallas_banded(pats, txt, tlen, bud, bw, interpret=False)
    print(f"group={group} first: {time.monotonic()-t0:.1f}s", flush=True)
    if first_ref is None:
        first_ref = (np.array(d), np.array(e))
    else:
        same = np.array_equal(first_ref[0], d) and np.array_equal(first_ref[1], e)
        print(f"  results match group=8: {same}", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.monotonic()
        d, e = pmb.myers_pallas_banded(pats, txt, tlen, bud, bw, interpret=False)
        best = min(best, time.monotonic() - t0)
    gcups = B * m * n / best / 1e9
    print(f"group={group} steady: {best:.3f}s  {gcups:.0f} GCUPS-equiv", flush=True)
