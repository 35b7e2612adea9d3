"""Break down one production banded-kernel call at the root shape:
host packing vs host->device transfer vs kernel execution vs sync.

The section ablation (tpu_ablate_banded_kernel.py) showed the kernel body
runs ~2.3 us/col with device-resident inputs, while the end-to-end call
(tpu_bench_group_size.py) reads ~10.4 us/col — this script attributes the
difference.
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
import jax.numpy as jnp  # noqa: E402

print("backend:", jax.default_backend(), flush=True)
if jax.default_backend() != "tpu":
    raise SystemExit("no TPU backend — rerun")

from floxer_tpu.ops.device_dp import pad_batch  # noqa: E402
from floxer_tpu.ops.myers_banded import band_store_bits  # noqa: E402
import floxer_tpu.ops.pallas_myers_banded as pmb  # noqa: E402

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
bw = -(-(-(-band_store_bits(m, n, budget) // 32)) // 128) * 128
Np = -(-txt.shape[1] // 1024) * 1024  # packed-kernel column padding
print(f"B={B} m={m} n={n} band_words={bw} Np={Np} group={pmb.SUBLANES}")

# full call (reference number)
d, e = pmb.myers_pallas_banded(pats, txt, tlen, bud, bw)
best_full = 1e9
for _ in range(3):
    t0 = time.monotonic()
    d, e = pmb.myers_pallas_banded(pats, txt, tlen, bud, bw)
    best_full = min(best_full, time.monotonic() - t0)
print(f"full call: {best_full:.3f}s  {best_full/Np*1e6:.2f}us/col", flush=True)

# 1. host packing
best_pack = 1e9
for _ in range(3):
    t0 = time.monotonic()
    vp0, planes0, stream, scalars = pmb.prepare_banded_batch(pats, bud, bw, Np)
    best_pack = min(best_pack, time.monotonic() - t0)
scalars[0][:, 0] = tlen
print(f"host pack: {best_pack:.3f}s", flush=True)

# 2. transfer (per-call bytes: packed texts + packed stream + planes + vp0)
texts_u8 = np.zeros((B, Np), dtype=np.uint8)
texts_u8[:, : txt.shape[1]] = txt
texts_i32 = pmb.pack_nibbles(texts_u8)
nbytes = (
    texts_i32.nbytes + stream.nbytes + planes0.nbytes + vp0.nbytes
    + sum(s.nbytes for s in scalars)
)
dev = jax.devices()[0]


def transfer_once():
    objs = [
        jax.device_put(texts_i32, dev),
        jax.device_put(stream, dev),
        jax.device_put(planes0, dev),
        jax.device_put(vp0, dev),
    ] + [jax.device_put(s, dev) for s in scalars]
    for o in objs:
        o.block_until_ready()
    return objs


objs = transfer_once()
best_xfer = 1e9
for _ in range(3):
    t0 = time.monotonic()
    objs = transfer_once()
    best_xfer = min(best_xfer, time.monotonic() - t0)
print(
    f"transfer: {best_xfer:.3f}s for {nbytes/1e6:.1f} MB "
    f"({nbytes/1e6/best_xfer:.0f} MB/s)",
    flush=True,
)

# 3. kernel with device-resident inputs (download [B,1] outputs as sync)
dt, ds, dp, dv = objs[0], objs[1], objs[2], objs[3]
dscal = tuple(objs[4:])
dist, end = pmb._pallas_banded_call(
    dv, dp, dt, ds, dscal, band_words=bw, num_text=Np, interpret=False
)
np.asarray(dist)
best_kern = 1e9
for _ in range(3):
    t0 = time.monotonic()
    dist, end = pmb._pallas_banded_call(
        dv, dp, dt, ds, dscal, band_words=bw, num_text=Np, interpret=False
    )
    np.asarray(dist)
    best_kern = min(best_kern, time.monotonic() - t0)
print(
    f"kernel (device-resident): {best_kern:.3f}s  "
    f"{best_kern/Np*1e6:.2f}us/col",
    flush=True,
)

# 4. empty-result download round trip
tiny = jnp.zeros((B, 1), jnp.int32)
np.asarray(tiny)
best_rt = 1e9
for _ in range(3):
    t0 = time.monotonic()
    np.asarray(tiny + 1)
    best_rt = min(best_rt, time.monotonic() - t0)
print(f"tiny round trip: {best_rt*1000:.1f}ms", flush=True)

print(
    f"attribution: pack {best_pack:.3f} + xfer {best_xfer:.3f} + "
    f"kernel {best_kern:.3f} = {best_pack+best_xfer+best_kern:.3f} "
    f"vs full {best_full:.3f}",
    flush=True,
)
