"""Isolate the per-column cost floor of the Myers-style Pallas loops.

Variants over the same (outer blocks x inner 128) text loop structure:
  A. empty body (just the block roll + a trivial accumulate)
  B. elementwise-only body (~40 ops, no cross-lane rolls)
  C. rolls-only body (12 pltpu.roll per column)
  D. the real banded body cost reference comes from tpu_bench_group_size
"""

import functools
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
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

print("backend:", jax.default_backend(), flush=True)
if jax.default_backend() != "tpu":
    raise SystemExit("no TPU backend — rerun")

S = 32
BW = 256
LANES = 128
N = 23040


def make_kernel(variant):
    def kernel(texts_ref, out_ref):
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (S, BW), 1)

        def step(j, chars, carry):
            acc, v1, v2 = carry
            if variant == "empty":
                acc = acc + chars.astype(jnp.uint32)
            elif variant == "elementwise":
                x = v1
                for _ in range(20):
                    x = (x ^ v2) + (x | v1)
                    v1 = v1 + jnp.uint32(1)
                acc = acc + x + chars.astype(jnp.uint32)
            elif variant == "rolls":
                x = v1
                for _ in range(12):
                    rolled = pltpu.roll(x, shift=1, axis=1)
                    x = jnp.where(lane_iota >= 1, rolled, jnp.uint32(0)) | v2
                acc = acc + x + chars.astype(jnp.uint32)
            return acc, v1, v2

        def outer(b, carry):
            start = pl.multiple_of(b * LANES, LANES)
            block = texts_ref[:, pl.ds(start, LANES)]

            def inner(k, ic):
                blk, c = ic
                c = step(b * LANES + k, blk[:, 0:1], c)
                blk = pltpu.roll(blk, shift=LANES - 1, axis=1)
                return blk, c

            _, carry = jax.lax.fori_loop(0, LANES, inner, (block, carry))
            return carry

        init = (
            jnp.zeros((S, BW), dtype=jnp.uint32),
            jnp.ones((S, BW), dtype=jnp.uint32),
            jnp.full((S, BW), 3, dtype=jnp.uint32),
        )
        acc, _, _ = jax.lax.fori_loop(0, N // LANES, outer, init)
        out_ref[:, :] = acc

    return kernel


@functools.partial(jax.jit, static_argnames=("variant",))
def run(texts, variant):
    return pl.pallas_call(
        make_kernel(variant),
        grid=(1,),
        in_specs=[
            pl.BlockSpec((S, N), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (S, BW), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((S, BW), jnp.uint32),
    )(texts)


texts = jnp.asarray(
    np.random.default_rng(0).integers(0, 5, size=(S, N)).astype(np.int32)
)
for variant in ("empty", "elementwise", "rolls"):
    out = np.asarray(run(texts, variant))  # compile+first
    best = 1e9
    for _ in range(3):
        t0 = time.monotonic()
        np.asarray(run(texts, variant))
        best = min(best, time.monotonic() - t0)
    per_col = best / N * 1e6
    print(f"{variant}: {best:.4f}s  {per_col:.2f}us/col", flush=True)
