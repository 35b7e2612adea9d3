"""Find what the banded-kernel column loop actually scales with: carried
state arrays vs elementwise ops vs rolls, at S=32/BW=256."""

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


def make_kernel(n_carry, n_ops, n_rolls):
    def kernel(texts_ref, out_ref):
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (S, BW), 1)

        def step(j, chars, arrs):
            # touch every carried array so none is dead
            x = arrs[0] ^ chars.astype(jnp.uint32)
            for a in arrs[1:]:
                x = x + (a & jnp.uint32(7))
            for _ in range(n_ops):
                x = (x ^ arrs[0]) | (x >> jnp.uint32(1))
            for _ in range(n_rolls):
                rolled = pltpu.roll(x, shift=1, axis=1)
                x = jnp.where(lane_iota >= 1, rolled, jnp.uint32(0)) ^ arrs[0]
            out = [x if i == 0 else arrs[i] + jnp.uint32(1) for i in range(len(arrs))]
            return tuple(out)

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

        init = tuple(
            jnp.full((S, BW), i + 1, dtype=jnp.uint32) for i in range(n_carry)
        )
        final = jax.lax.fori_loop(0, N // LANES, outer, init)
        out_ref[:, :] = final[0]

    return kernel


@functools.partial(jax.jit, static_argnames=("n_carry", "n_ops", "n_rolls"))
def run(texts, n_carry, n_ops, n_rolls):
    return pl.pallas_call(
        make_kernel(n_carry, n_ops, n_rolls),
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
for n_carry, n_ops, n_rolls in [
    (3, 0, 0),
    (10, 0, 0),
    (14, 0, 0),
    (10, 40, 0),
    (10, 80, 0),
    (10, 40, 12),
    (3, 80, 12),
    (10, 80, 12),
]:
    np.asarray(run(texts, n_carry, n_ops, n_rolls))
    best = 1e9
    for _ in range(3):
        t0 = time.monotonic()
        np.asarray(run(texts, n_carry, n_ops, n_rolls))
        best = min(best, time.monotonic() - t0)
    print(
        f"carry={n_carry:2d} ops={n_ops:2d} rolls={n_rolls:2d}: "
        f"{best:.4f}s  {best/N*1e6:.2f}us/col",
        flush=True,
    )


# variant: per-column [S,1] -> [S,BW] broadcast ops (the real kernel's
# sliding/pessimism/char selects) — suspected Mosaic slow path
def make_bcast_kernel(n_bcast):
    def kernel(texts_ref, scal_ref, out_ref):
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (S, BW), 1)
        jstar = scal_ref[:, :]  # [S, 1]

        def step(j, chars, carry):
            x, y = carry
            for t in range(n_bcast):
                cond = (j + t) <= jstar  # [S,1]
                x = jnp.where(cond, x ^ y, x)  # [S,1] broadcast where
            x = x + chars.astype(jnp.uint32)
            return x, y + jnp.uint32(1)

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
            jnp.ones((S, BW), dtype=jnp.uint32),
            jnp.full((S, BW), 3, dtype=jnp.uint32),
        )
        x, _ = jax.lax.fori_loop(0, N // LANES, outer, init)
        out_ref[:, :] = x

    return kernel


@functools.partial(jax.jit, static_argnames=("n_bcast",))
def run_bcast(texts, scal, n_bcast):
    return pl.pallas_call(
        make_bcast_kernel(n_bcast),
        grid=(1,),
        in_specs=[
            pl.BlockSpec((S, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (S, BW), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((S, BW), jnp.uint32),
    )(texts, scal)


scal = jnp.asarray(
    np.random.default_rng(1).integers(0, N, size=(S, 1)).astype(np.int32)
)
for n_bcast in (0, 4, 10, 18):
    np.asarray(run_bcast(texts, scal, n_bcast))
    best = 1e9
    for _ in range(3):
        t0 = time.monotonic()
        np.asarray(run_bcast(texts, scal, n_bcast))
        best = min(best, time.monotonic() - t0)
    print(f"bcast={n_bcast:2d}: {best:.4f}s  {best/N*1e6:.2f}us/col", flush=True)
