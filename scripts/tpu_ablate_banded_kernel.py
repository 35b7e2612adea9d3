"""Ablate the REAL production banded kernel section-by-section.

The synthetic microbenches (tpu_microbench_column_loop.py,
tpu_microbench_carry_scaling.py) exonerated carried-state size, elementwise
op count, roll count, and [S,1]->[S,BW] broadcasts individually, yet the
production kernel runs ~11 us/col where the synthetic floor is ~1.3 us/col.
This script times the actual kernel body with sections disabled one at a
time (semantics intentionally broken; only the timing matters — outputs
still consume every carried array so nothing is dead-code eliminated):

  full      — production body
  noslide   — band-slide phase removed (no pack/roll_down/shr chain)
  noeq      — Eq plane XNOR-reduce replaced by a constant mix
  noks      — Kogge-Stone carry scan removed (carry_in = 0)
  noscore   — per-column score extraction (static last-tile slices) removed
  nohshift  — horizontal PH/MH shift phase removed
  nostream2 — second text stream (pattern chars) not rolled/consumed
  minimal   — everything above removed (floor with real carries)
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

SUBLANES = 32
LANES = 128
TOP_BIT = np.uint32(0x80000000)
BW = 256
N = 23040


def make_kernel(variant):
    off = variant.split("+")

    def kernel(
        vp0_ref, planes0_ref, texts_ref, stream_ref,
        tlen_ref, jstar_ref, topshift_ref, mfrozen_ref, minit_ref, binit_ref,
        dist_ref, end_ref,
    ):
        band_words = BW
        num_text = N
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, band_words), 1)
        tile_iota = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, LANES), 1)
        last_tile_lane = tile_iota == LANES - 1
        lane0 = lane_iota == 0
        top_mask_tile = jnp.where(last_tile_lane, TOP_BIT, jnp.uint32(0))
        bit0_lane0 = jnp.where(lane0, jnp.uint32(1), jnp.uint32(0))
        last_slice = band_words - LANES

        tlen = tlen_ref[:, :]
        j_star = jstar_ref[:, :]
        top_shift_col = topshift_ref[:, :]
        m_frozen_pessim = mfrozen_ref[:, :]
        m_init = minit_ref[:, :]
        b_init = binit_ref[:, :]

        log_rounds = max(1, (band_words - 1).bit_length())
        ones = jnp.uint32(0xFFFFFFFF)
        one = jnp.uint32(1)

        def roll_down(x):
            rolled = pltpu.roll(x, shift=band_words - 1, axis=1)
            return jnp.where(lane_iota < band_words - 1, rolled, jnp.uint32(0))

        def roll_up(x, distance):
            rolled = pltpu.roll(x, shift=distance, axis=1)
            return jnp.where(lane_iota >= distance, rolled, jnp.uint32(0))

        def step(j, tchars, pchars, carry):
            vp, vn, p0, p1, p2, am, s_bot, s_m, best, best_end = carry
            col = j + 1
            sliding = col <= j_star

            if "noslide" not in off:
                pack = (
                    (vp & one)
                    | ((vn & one) << 1)
                    | ((p0 & one) << 2)
                    | ((p1 & one) << 3)
                    | ((p2 & one) << 4)
                    | ((am & one) << 5)
                )
                nxt = roll_down(pack)

                def shr(x, i, entering):
                    return (
                        (x >> one)
                        | (((nxt >> jnp.uint32(i)) & one) << jnp.uint32(31))
                        | entering
                    )

                pch = pchars.astype(jnp.uint32)
                glast = lane_iota == band_words - 1
                top_mask = jnp.where(glast, TOP_BIT, jnp.uint32(0))
                e0 = jnp.where(glast & ((pch & one) != 0), TOP_BIT, jnp.uint32(0))
                e1 = jnp.where(
                    glast & ((pch & jnp.uint32(2)) != 0), TOP_BIT, jnp.uint32(0)
                )
                e2 = jnp.where(
                    glast & ((pch & jnp.uint32(4)) != 0), TOP_BIT, jnp.uint32(0)
                )
                vp = jnp.where(sliding, shr(vp, 0, top_mask), vp)
                vn = jnp.where(sliding, shr(vn, 1, jnp.uint32(0)), vn)
                p0 = jnp.where(sliding, shr(p0, 2, e0), p0)
                p1 = jnp.where(sliding, shr(p1, 3, e1), p1)
                p2 = jnp.where(sliding, shr(p2, 4, e2), p2)
                am = jnp.where(sliding, shr(am, 5, jnp.uint32(0)), am)
                s_bot = s_bot + jnp.where(sliding, 1, 0)

            if "noeq" not in off:
                tch = tchars.astype(jnp.uint32)
                m0 = jnp.where((tch & one) != 0, p0, ~p0)
                m1 = jnp.where((tch & jnp.uint32(2)) != 0, p1, ~p1)
                m2 = jnp.where((tch & jnp.uint32(4)) != 0, p2, ~p2)
                eq = (m0 & m1 & m2) | am
            else:
                eq = p0 ^ p1 ^ p2 ^ am ^ tchars.astype(jnp.uint32)

            xv = eq | vn
            a = eq & vp
            t = a + vp
            if "r4" in off:
                # round-5 production scan: radix-4 prefix (see
                # pallas_myers_banded CARRY_SCAN) — half the serial rounds
                gp = jnp.where(t < a, one, jnp.uint32(0)) | (
                    jnp.where(t == ones, one, jnp.uint32(0)) << 1
                )
                d = 1
                while d < BW:
                    s1 = roll_up(gp, d)
                    cg = gp & one
                    cp = gp >> one
                    cg1 = s1 & one
                    cp1 = s1 >> one
                    if 2 * d < BW:
                        s2 = roll_up(gp, 2 * d)
                        s3 = roll_up(gp, min(3 * d, BW - 1))
                        cg2 = s2 & one
                        cp2 = s2 >> one
                        cg3 = s3 & one
                        cp3 = s3 >> one
                        q1 = cp & cp1
                        q2 = q1 & cp2
                        cg = cg | (cp & cg1) | (q1 & cg2) | (q2 & cg3)
                        cp = q2 & cp3
                    else:
                        cg = cg | (cp & cg1)
                        cp = cp & cp1
                    gp = cg | (cp << 1)
                    d *= 4
                carry_in = roll_up(gp & one, 1)
            elif "noks" not in off:
                gp = jnp.where(t < a, one, jnp.uint32(0)) | (
                    jnp.where(t == ones, one, jnp.uint32(0)) << 1
                )
                for k in range(log_rounds):
                    shifted = roll_up(gp, 1 << k)
                    g = gp & one
                    pprop = gp >> one
                    g = g | (pprop & (shifted & one))
                    pprop = pprop & (shifted >> one)
                    gp = g | (pprop << 1)
                carry_in = roll_up(gp & one, 1)
            else:
                carry_in = jnp.uint32(0)
            summ = t + carry_in

            xh = (summ ^ vp) | eq
            ph = vn | ~(xh | vp)
            mh = vp & xh

            if "noscore" not in off:
                pht = ph[:, last_slice:]
                mht = mh[:, last_slice:]
                d_bot = jnp.where((pht & top_mask_tile) != 0, 1, 0) - jnp.where(
                    (mht & top_mask_tile) != 0, 1, 0
                )
                s_bot = s_bot + d_bot
                at_seed = col == j_star
                s_m = jnp.where(
                    at_seed, s_bot, s_m + jnp.where(sliding, 0, d_bot)
                )

            if "nohshift" not in off:
                pessim = jnp.where(
                    sliding,
                    jnp.where(col >= top_shift_col, 1, 0),
                    m_frozen_pessim,
                )
                hpack = (ph >> jnp.uint32(31)) | ((mh >> jnp.uint32(31)) << 1)
                hnxt = roll_up(hpack, 1)
                ph_in = jnp.where(pessim != 0, bit0_lane0, jnp.uint32(0))
                ph_sh = (ph << one) | (hnxt & one) | ph_in
                mh_sh = (mh << one) | ((hnxt >> one) & one)
            else:
                ph_sh, mh_sh = ph, mh

            vp = mh_sh | ~(xv | ph_sh)
            vn = ph_sh & xv

            if "noscore" not in off:
                eligible = (col < tlen) & (col >= j_star)
                improves = eligible & (s_m <= best)
                best = jnp.where(improves, s_m, best)
                best_end = jnp.where(improves, col, best_end)
            else:
                best = best + s_bot[:, :1] * 0 + 1
                best_end = best_end + 1
            return vp, vn, p0, p1, p2, am, s_bot, s_m, best, best_end

        num_blocks = num_text // LANES

        def outer(b, carry):
            start = pl.multiple_of(b * LANES, LANES)
            tblock = texts_ref[:, pl.ds(start, LANES)]
            pblock = stream_ref[:, pl.ds(start, LANES)]

            def inner(k, inner_carry):
                tb, pb, c = inner_carry
                if "nostream2" not in off:
                    c = step(b * LANES + k, tb[:, 0:1], pb[:, 0:1], c)
                    pb = pltpu.roll(pb, shift=LANES - 1, axis=1)
                else:
                    c = step(b * LANES + k, tb[:, 0:1], jnp.zeros(
                        (SUBLANES, 1), jnp.int32), c)
                tb = pltpu.roll(tb, shift=LANES - 1, axis=1)
                return tb, pb, c

            _, _, carry = jax.lax.fori_loop(
                0, LANES, inner, (tblock, pblock, carry)
            )
            return carry

        m_v = jnp.broadcast_to(m_init, (SUBLANES, LANES)).astype(jnp.int32)
        b_v = jnp.broadcast_to(b_init, (SUBLANES, LANES)).astype(jnp.int32)
        init = (
            vp0_ref[:, :],
            jnp.zeros((SUBLANES, BW), dtype=jnp.uint32),
            planes0_ref[:, 0, :],
            planes0_ref[:, 1, :],
            planes0_ref[:, 2, :],
            planes0_ref[:, 3, :],
            b_v,
            m_v,
            m_v,
            jnp.zeros((SUBLANES, LANES), dtype=jnp.int32),
        )
        carry = jax.lax.fori_loop(0, num_blocks, outer, init)
        # consume every carry element so no section is dead
        acc = carry[0]
        for c in carry[1:6]:
            acc = acc ^ c
        sel = last_tile_lane
        mix = carry[6] + carry[7] + carry[8] + carry[9]
        dist_ref[:, :] = jnp.sum(
            jnp.where(sel, mix + acc[:, last_slice:].astype(jnp.int32), 0),
            axis=1, keepdims=True,
        )
        end_ref[:, :] = jnp.sum(jnp.where(sel, carry[9], 0), axis=1, keepdims=True)

    return kernel


@functools.partial(jax.jit, static_argnames=("variant",))
def run(vp0, planes0, texts, stream, scalars, variant):
    B = vp0.shape[0]
    tlen, jstar, topshift, mfrozen, minit, binit = scalars
    spec1 = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple([i] + [0] * (len(shape) - 1)),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        make_kernel(variant),
        grid=(B // SUBLANES,),
        in_specs=[
            spec1((SUBLANES, BW)),
            spec1((SUBLANES, 4, BW)),
            spec1((SUBLANES, N)),
            spec1((SUBLANES, N)),
            spec1((SUBLANES, 1)),
            spec1((SUBLANES, 1)),
            spec1((SUBLANES, 1)),
            spec1((SUBLANES, 1)),
            spec1((SUBLANES, 1)),
            spec1((SUBLANES, 1)),
        ],
        out_specs=[spec1((SUBLANES, 1)), spec1((SUBLANES, 1))],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ],
    )(vp0, planes0, texts, stream, tlen, jstar, topshift, mfrozen, minit, binit)


rng = np.random.default_rng(0)
B = SUBLANES
vp0 = jnp.asarray(rng.integers(0, 2**32, size=(B, BW), dtype=np.uint32))
planes0 = jnp.asarray(rng.integers(0, 2**32, size=(B, 4, BW), dtype=np.uint32))
texts = jnp.asarray(rng.integers(0, 5, size=(B, N)).astype(np.int32))
stream = jnp.asarray(rng.integers(0, 5, size=(B, N)).astype(np.int32))
scalars = tuple(
    jnp.asarray(rng.integers(1, N // 2, size=(B, 1)).astype(np.int32))
    for _ in range(6)
)

VARIANTS = [
    "full",
    "r4",
    "noks",
    "noslide",
    "noeq",
    "noscore",
    "nohshift",
    "nostream2",
    "noslide+noeq+noks+noscore+nohshift+nostream2",
]
for variant in VARIANTS:
    np.asarray(run(vp0, planes0, texts, stream, scalars, variant)[0])
    best = 1e9
    for _ in range(3):
        t0 = time.monotonic()
        np.asarray(run(vp0, planes0, texts, stream, scalars, variant)[0])
        best = min(best, time.monotonic() - t0)
    print(f"{variant:48s}: {best:.4f}s  {best/N*1e6:.2f}us/col", flush=True)
