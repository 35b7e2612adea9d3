"""Break down the resident-gather verification path on the real TPU.

Production root-bucket shape (E. coli ladder): T=256 tasks, band_words=256,
num_text=26624. Times, separately:
  - repeated full resident calls (dispatch vs sync)
  - prep-only (gathers + on-device planes/Peq build) vs kernel-only
  - the host baseline path (myers_pallas_banded) for comparison
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

from floxer_tpu.ops.pallas_myers_banded import myers_pallas_banded  # noqa: E402
from floxer_tpu.ops import resident as R  # noqa: E402

rng = np.random.default_rng(0)
REF_LEN = 4_600_000
NUM_READS = 64
READ_LEN = 20_000
T = 256
BW = 256
NUM_TEXT = 26624
M = 20_000
N = 23_941
BUDGET = 1400

ref = rng.integers(1, 5, size=REF_LEN).astype(np.uint8)
reads = [
    rng.integers(1, 5, size=READ_LEN).astype(np.uint8)
    for _ in range(NUM_READS)
]
ref_bank = R.ResidentBank([ref])
query_bank = R.ResidentBank(reads)

win_starts = rng.integers(0, REF_LEN - N, size=T).astype(np.int64)
win_lens = np.full(T, N, dtype=np.int64)
read_ids = rng.integers(0, NUM_READS, size=T)
pat_starts = np.asarray(
    [query_bank.base(int(i)) for i in read_ids], dtype=np.int64
)
pat_lens = np.full(T, M, dtype=np.int64)
budgets = np.full(T, BUDGET, dtype=np.int64)


def timed(label, fn, reps=3):
    fn()  # warm (compile)
    best_disp, best_sync = 1e9, 1e9
    for _ in range(reps):
        t0 = time.monotonic()
        out = fn()
        t1 = time.monotonic()
        np.asarray(out[0])
        t2 = time.monotonic()
        best_disp = min(best_disp, t1 - t0)
        best_sync = min(best_sync, t2 - t1)
    print(f"{label:28s}: disp {best_disp:.3f}s  sync {best_sync:.3f}s", flush=True)


# upload banks up front (not part of the timing)
t0 = time.monotonic()
_ = ref_bank.flat.block_until_ready()
_ = query_bank.flat.block_until_ready()
print(f"bank upload: {time.monotonic() - t0:.2f}s "
      f"({(ref_bank.flat.nbytes + query_bank.flat.nbytes) / 1e6:.1f} MB)",
      flush=True)

# full resident call
timed(
    "resident full",
    lambda: R.myers_banded_resident(
        ref_bank, query_bank, win_starts, win_lens, pat_starts, pat_lens,
        budgets, band_words=BW, num_text=NUM_TEXT, sync=False,
    ),
)

# prep-only: the gathers + on-device state build, no pallas kernel
import functools  # noqa: E402


@functools.partial(jax.jit, static_argnames=("band_words", "num_text"))
def prep_only(ref_flat, bank_flat, ww0, wph, wl, pw0, pph, sw0, sph, pl_, bud,
              band_words, num_text):
    num_words = num_text // 8
    texts = R._gather_packed(ref_flat, ww0, wph, num_words)
    stream = R._gather_packed(bank_flat, sw0, sph, num_words)
    b_store = band_words * 32
    patw = R._gather_packed(bank_flat, pw0, pph, b_store // 8)
    codes_lin = R._unpack_codes(patw)
    bit_idx = jnp.arange(b_store, dtype=jnp.int32)[None, :]
    k = bud.astype(jnp.int32)[:, None]
    m = pl_.astype(jnp.int32)[:, None]
    rows = bit_idx + k - (b_store - 1)
    in_pat = (rows >= 1) & (rows <= m)
    gathered = jnp.take_along_axis(
        codes_lin, jnp.clip(rows - 1, 0, b_store - 1), axis=1
    )
    codes = jnp.where(in_pat, gathered, 7)

    def pack(bits):
        return R._pack_bits32(bits.reshape(bits.shape[0], band_words, 32))

    planes0 = jnp.stack(
        [pack((codes & 1) != 0), pack((codes & 2) != 0),
         pack((codes & 4) != 0), pack(rows <= 0)], axis=1)
    vp0 = pack(rows >= 1)
    return texts, stream, planes0, vp0


ww0, wph = R.addr_arrays(win_starts)
pw0, pph = R.addr_arrays(pat_starts)
sw0, sph = R.addr_arrays(pat_starts + budgets)
args = (ref_bank.flat, query_bank.flat,
        jnp.asarray(ww0), jnp.asarray(wph),
        jnp.asarray(win_lens, dtype=jnp.int32),
        jnp.asarray(pw0), jnp.asarray(pph),
        jnp.asarray(sw0), jnp.asarray(sph),
        jnp.asarray(pat_lens, dtype=jnp.int32),
        jnp.asarray(budgets, dtype=jnp.int32))
timed("prep only", lambda: prep_only(*args, band_words=BW, num_text=NUM_TEXT))


# sub-ablate prep: text gather only / plane build only
@functools.partial(jax.jit, static_argnames=("num_words",))
def gathers_only(ref_flat, bank_flat, ww0, wph, sw0, sph, num_words):
    return (R._gather_packed(ref_flat, ww0, wph, num_words),
            R._gather_packed(bank_flat, sw0, sph, num_words))


timed(
    "gathers only",
    lambda: gathers_only(
        args[0], args[1], args[2], args[3], args[7], args[8],
        num_words=NUM_TEXT // 8,
    ),
)

# host-path baseline (per-task slices + transfer) for the same bucket
patterns = [reads[int(i)][:M] for i in read_ids]
texts_np = np.zeros((T, NUM_TEXT), dtype=np.uint8)
for i in range(T):
    texts_np[i, :N] = ref[win_starts[i] : win_starts[i] + N]
timed(
    "host path",
    lambda: myers_pallas_banded(
        patterns, texts_np, win_lens, budgets, band_words=BW, sync=False,
    ),
    reps=2,
)
