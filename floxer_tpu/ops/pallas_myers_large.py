"""Pallas TPU kernel: large-pattern Myers edit distance (root verification).

The speed-of-light path for PEX ROOT verifications: whole-read patterns
(tens of kb, W = hundreds of uint32 words) against root windows. The word
axis rides the 128-lane dimension and 8 alignment pairs share a grid step on
the sublane axis, so the VPU is fully occupied even for a handful of roots —
the XLA scan formulation of the same recurrence (ops/myers.py
myers_batched_large) pays per-step gather/allocation overheads that leave it
~100x off peak at these shapes.

Per text character (fori_loop over the window, text tile resident in VMEM):
  - Eq via 6-way select over the SIGMA axis of the VMEM Peq tile
  - the (Eq & VP) + VP carry chain solved by a Kogge-Stone scan across
    lanes: log2(W) rounds of masked lane-rolls over (generate, propagate)
  - cross-word bit shifts as single lane-rolls
  - MSB-row score deltas via a masked any-reduction over lanes

Semantics identical to ops/myers.py (rightmost minimal end column among
columns 0..text_len-1). Verified against the DP oracle by
tests/test_pallas_myers_large.py; used by verify_batch on TPU backends for
word counts above MAX_UNROLLED_WORDS.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..alphabet import SIGMA
from .myers import WORD, build_peq_vectorized
from .pallas_myers_banded import STATIC_BOUNDS

SUBLANES = 8
LANES = 128


def _shift_lanes(x, distance, lane_iota):
    """x shifted toward higher lane indices by `distance`, zero-filled."""
    rolled = pltpu.roll(x, shift=distance, axis=1)
    return jnp.where(lane_iota >= distance, rolled, jnp.uint32(0))


def _kernel(
    peq_ref,  # uint32 [SUBLANES, SIGMA, Wp]
    plen_ref,  # int32 [SUBLANES, 1]
    texts_ref,  # int32 [SUBLANES, Np]
    tlen_ref,  # int32 [SUBLANES, 1]
    dist_ref,  # int32 [SUBLANES, 1]
    end_ref,  # int32 [SUBLANES, 1]
    *,
    num_words_padded: int,
    num_text: int,
):
    Wp = num_words_padded
    plen = plen_ref[:, :]  # [S, 1]
    tlen = tlen_ref[:, :]  # [S, 1]

    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, Wp), 1)

    msb_word = (plen - 1) // WORD  # [S, 1]
    msb_bit = ((plen - 1) % WORD).astype(jnp.uint32)
    msb_mask_scalar = (jnp.uint32(1) << msb_bit).astype(jnp.uint32)  # [S, 1]
    # mask selecting exactly the MSB word lane, carrying the MSB bit
    msb_select = jnp.where(
        lane_iota == msb_word, msb_mask_scalar, jnp.uint32(0)
    )  # [S, Wp]

    active = lane_iota <= msb_word  # [S, Wp]
    ones = jnp.uint32(0xFFFFFFFF)

    vp0 = jnp.where(active, ones, jnp.uint32(0))
    vn0 = jnp.zeros((SUBLANES, Wp), dtype=jnp.uint32)

    log_rounds = max(1, (Wp - 1).bit_length())

    def step(j, chars, carry):
        vp, vn, score, best, best_end = carry

        eq = jnp.zeros((SUBLANES, Wp), dtype=jnp.uint32)
        for s in range(SIGMA):
            eq = jnp.where(chars == s, peq_ref[:, s, :], eq)

        a = eq & vp
        t = a + vp
        g = jnp.where(t < a, jnp.uint32(1), jnp.uint32(0))
        p = jnp.where(t == ones, jnp.uint32(1), jnp.uint32(0))
        # Kogge-Stone inclusive scan of the (g, p) carry monoid across lanes
        for k in range(log_rounds):
            distance = 1 << k
            g_shift = _shift_lanes(g, distance, lane_iota)
            p_shift = _shift_lanes(p, distance, lane_iota)
            g = g | (p & g_shift)
            p = p & p_shift
        carry_in = _shift_lanes(g, 1, lane_iota)
        s_ = t + carry_in

        xh = (s_ ^ vp) | eq
        xv = eq | vn
        ph = vn | ~(xh | vp)
        mh = vp & xh

        ph_shifted = (ph << jnp.uint32(1)) | _shift_lanes(
            ph >> jnp.uint32(31), 1, lane_iota
        )
        mh_shifted = (mh << jnp.uint32(1)) | _shift_lanes(
            mh >> jnp.uint32(31), 1, lane_iota
        )

        vp = jnp.where(active, mh_shifted | ~(xv | ph_shifted), jnp.uint32(0))
        vn = jnp.where(active, ph_shifted & xv, jnp.uint32(0))

        # score/best/best_end stay [S, Wp] with the meaningful value riding
        # each pair's MSB word lane: the per-column update is then purely
        # elementwise (no cross-lane reduction inside the hot loop); other
        # lanes carry don't-care values masked out at extraction time
        score = score + jnp.where((ph & msb_select) != 0, 1, 0)
        score = score - jnp.where((mh & msb_select) != 0, 1, 0)

        eligible = (j + 1) < tlen
        improves = eligible & (score <= best)
        best = jnp.where(improves, score, best)
        best_end = jnp.where(improves, j + 1, best_end)
        return vp, vn, score, best, best_end

    # text consumed in 128-lane blocks: a dynamic per-char lane slice is not
    # Mosaic-addressable, so each block loads once (aligned) and a circular
    # roll brings the next character to lane 0 each step
    num_blocks = num_text // LANES

    def outer(b, carry):
        start = pl.multiple_of(b * LANES, LANES)
        block = texts_ref[:, pl.ds(start, LANES)]  # [S, 128]

        def inner(k, inner_carry):
            block_rot, carry = inner_carry
            chars = block_rot[:, 0:1]  # [S, 1]
            carry = step(b * LANES + k, chars, carry)
            block_rot = pltpu.roll(block_rot, shift=LANES - 1, axis=1)
            return block_rot, carry

        _, carry = jax.lax.fori_loop(0, LANES, inner, (block, carry))
        return carry

    plen_v = jnp.broadcast_to(plen, (SUBLANES, Wp)).astype(jnp.int32)
    init = (
        vp0,
        vn0,
        plen_v,
        plen_v,
        jnp.zeros((SUBLANES, Wp), dtype=jnp.int32),
    )
    # dynamic column bound — see pallas_myers_banded._kernel: columns past
    # the group's max tlen never pass `eligible`, so they are dead work
    if STATIC_BOUNDS:
        blocks_needed = num_blocks
    else:
        blocks_needed = jnp.minimum(
            (jnp.max(tlen) + (LANES - 1)) // LANES, num_blocks
        )
    _, _, _, best, best_end = jax.lax.fori_loop(0, blocks_needed, outer, init)
    sel = msb_select != 0
    dist_ref[:, :] = jnp.sum(jnp.where(sel, best, 0), axis=1, keepdims=True)
    end_ref[:, :] = jnp.sum(jnp.where(sel, best_end, 0), axis=1, keepdims=True)


@functools.partial(
    jax.jit,
    static_argnames=("num_words_padded", "num_text", "interpret"),
)
def _pallas_large_call(
    peq, plen, texts, tlen, num_words_padded, num_text, interpret
):
    B = plen.shape[0]
    grid = (B // SUBLANES,)
    kernel = functools.partial(
        _kernel, num_words_padded=num_words_padded, num_text=num_text
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (SUBLANES, SIGMA, num_words_padded),
                lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((SUBLANES, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (SUBLANES, num_text), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((SUBLANES, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((SUBLANES, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBLANES, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ],
        interpret=interpret,
    )(peq, plen, texts, tlen)


def myers_pallas_large(
    patterns: np.ndarray,
    pattern_lengths: np.ndarray,
    texts: np.ndarray,
    text_lengths: np.ndarray,
    interpret: bool | None = None,
    sync: bool = True,
):
    """Host wrapper: packs layouts, pads the batch to SUBLANES and the word
    axis to LANES multiples, runs the kernel. Returns (distance, end_col);
    sync=False returns device arrays so calls can overlap before download."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    B = patterns.shape[0]
    Bp = -(-B // SUBLANES) * SUBLANES

    peq = build_peq_vectorized(np.asarray(patterns), np.asarray(pattern_lengths))
    W = peq.shape[2]
    Wp = -(-W // LANES) * LANES

    peq_padded = np.zeros((Bp, SIGMA, Wp), dtype=np.uint32)
    peq_padded[:B, :, :W] = peq
    plen = np.ones((Bp, 1), dtype=np.int32)
    plen[:B, 0] = pattern_lengths
    Np = -(-texts.shape[1] // LANES) * LANES
    texts_padded = np.zeros((Bp, Np), dtype=np.int32)
    texts_padded[:B, : texts.shape[1]] = texts
    tlen = np.ones((Bp, 1), dtype=np.int32)
    tlen[:B, 0] = text_lengths

    dist, end = _pallas_large_call(
        jnp.asarray(peq_padded),
        jnp.asarray(plen),
        jnp.asarray(texts_padded),
        jnp.asarray(tlen),
        num_words_padded=Wp,
        num_text=Np,
        interpret=interpret,
    )
    if not sync:
        return dist[:B, 0], end[:B, 0]
    return np.asarray(dist)[:B, 0], np.asarray(end)[:B, 0]
