"""Pallas TPU kernel: batched Myers bit-parallel semi-global edit distance.

The tuned on-chip version of ops/myers.py. One grid step processes a LANE
tile of 128 alignment pairs: the text tile and Peq bitmasks are staged in
VMEM, the Myers state (VP/VN, one uint32 word per 32 pattern rows) lives in
registers across a fori_loop over text positions, and the per-step Eq lookup
is a 6-way select over the symbol dimension (SIGMA = 6) instead of a gather
— all VPU work with zero HBM traffic inside the scan.

Layout choices (host side, myers_verify_batch):
  - batch on the 128-lane dimension, Myers words unrolled (static W)
  - texts transposed to [N, B] so each scan step reads one lane row
  - Peq as [W, SIGMA, B]

Semantics identical to ops/myers.py / ops/dp_reference.py: distance = min
over end columns 0..text_len-1 (rightmost tie-break), returned with the end
column. Falls back to interpret mode off-TPU so the test suite exercises the
same kernel body on the CPU mesh.
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

LANES = 128


def _myers_kernel(
    peq_ref,  # uint32 [W, SIGMA, LANES]
    plen_ref,  # int32 [1, LANES]
    texts_ref,  # int32 [N, LANES]
    tlen_ref,  # int32 [1, LANES]
    dist_ref,  # int32 [1, LANES]
    end_ref,  # int32 [1, LANES]
    *,
    num_words: int,
    num_text: int,
):
    W = num_words
    plen = plen_ref[0, :]
    tlen = tlen_ref[0, :]

    msb_word = (plen - 1) // WORD  # [L]
    msb_bit = ((plen - 1) % WORD).astype(jnp.uint32)
    msb_mask = (jnp.uint32(1) << msb_bit).astype(jnp.uint32)

    ones = jnp.uint32(0xFFFFFFFF)
    zero = jnp.uint32(0)

    vp0 = []
    vn0 = []
    for w in range(W):
        active = jnp.int32(w) <= msb_word
        vp0.append(jnp.where(active, ones, zero))
        vn0.append(jnp.zeros_like(vp0[-1]))

    def step(j, carry):
        vp, vn, score, best, best_end = carry
        chars = texts_ref[j, :]  # [L]

        new_vp = []
        new_vn = []
        add_carry = jnp.zeros_like(vp[0])
        hp_shift_carry = jnp.zeros_like(vp[0])
        hn_shift_carry = jnp.zeros_like(vp[0])
        ph_msb = jnp.zeros_like(vp[0])
        mh_msb = jnp.zeros_like(vp[0])

        for w in range(W):
            # Eq via 6-way select (no gather on TPU lanes)
            eq = jnp.zeros_like(vp[w])
            for s in range(SIGMA):
                eq = jnp.where(chars == s, peq_ref[w, s, :], eq)

            vp_w = vp[w]
            vn_w = vn[w]
            a = eq & vp_w
            t = a + vp_w
            c1 = (t < a).astype(jnp.uint32)
            s_ = t + add_carry
            c2 = (s_ < t).astype(jnp.uint32)
            add_carry = c1 | c2
            xh = (s_ ^ vp_w) | eq
            xv = eq | vn_w

            ph = vn_w | ~(xh | vp_w)
            mh = vp_w & xh

            is_msb_word = msb_word == w
            ph_msb = jnp.where(is_msb_word, ph & msb_mask, ph_msb)
            mh_msb = jnp.where(is_msb_word, mh & msb_mask, mh_msb)

            ph_shifted = (ph << jnp.uint32(1)) | hp_shift_carry
            mh_shifted = (mh << jnp.uint32(1)) | hn_shift_carry
            hp_shift_carry = ph >> jnp.uint32(31)
            hn_shift_carry = mh >> jnp.uint32(31)

            active = jnp.int32(w) <= msb_word
            vp_next = mh_shifted | ~(xv | ph_shifted)
            vn_next = ph_shifted & xv
            new_vp.append(jnp.where(active, vp_next, zero))
            new_vn.append(jnp.where(active, vn_next, zero))

        score = score + (ph_msb != 0).astype(jnp.int32)
        score = score - (mh_msb != 0).astype(jnp.int32)

        eligible = (j + 1) < tlen
        improves = eligible & (score <= best)
        best = jnp.where(improves, score, best)
        best_end = jnp.where(improves, j + 1, best_end)
        return (tuple(new_vp), tuple(new_vn), score, best, best_end)

    carry = (tuple(vp0), tuple(vn0), plen, plen, jnp.zeros_like(plen))
    # dynamic column bound — see pallas_myers_banded._kernel: columns past
    # the tile's max tlen never pass `eligible`, so they are dead work
    if STATIC_BOUNDS:
        bound = num_text
    else:
        bound = jnp.minimum(jnp.max(tlen_ref[:, :]), num_text)
    carry = jax.lax.fori_loop(0, bound, step, carry)
    _, _, _, best, best_end = carry

    dist_ref[0, :] = best
    end_ref[0, :] = best_end


@functools.partial(
    jax.jit, static_argnames=("num_words", "num_text", "interpret")
)
def _myers_pallas_call(
    peq, plen, texts_t, tlen, num_words: int, num_text: int, interpret: bool
):
    B = plen.shape[1]
    grid = (B // LANES,)
    kernel = functools.partial(
        _myers_kernel, num_words=num_words, num_text=num_text
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (num_words, SIGMA, LANES),
                lambda i: (0, 0, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (num_text, LANES), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
        ],
        interpret=interpret,
    )(peq, plen, texts_t, tlen)


def myers_pallas(
    patterns: np.ndarray,
    pattern_lengths: np.ndarray,
    texts: np.ndarray,
    text_lengths: np.ndarray,
    interpret: bool | None = None,
    sync: bool = True,
):
    """Host wrapper: packs layouts and runs the Pallas kernel.

    Returns (distance [B], end_col [B]). The batch is padded up to a
    multiple of 128 lanes internally. sync=False returns device arrays
    (lazy slices) so multiple calls can overlap before any download.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    B = patterns.shape[0]
    Bp = -(-B // LANES) * LANES

    peq = build_peq_vectorized(np.asarray(patterns), np.asarray(pattern_lengths))
    W = peq.shape[2]

    peq_padded = np.zeros((Bp, SIGMA, W), dtype=np.uint32)
    peq_padded[:B] = peq
    plen = np.ones((1, Bp), dtype=np.int32)  # pad rows: length 1, avoids /0
    plen[0, :B] = pattern_lengths
    texts_t = np.zeros((texts.shape[1], Bp), dtype=np.int32)
    texts_t[:, :B] = np.asarray(texts, dtype=np.int32).T
    tlen = np.ones((1, Bp), dtype=np.int32)
    tlen[0, :B] = text_lengths

    # peq laid out words-first for the kernel
    peq_wfirst = np.ascontiguousarray(np.transpose(peq_padded, (2, 1, 0)))

    dist, end = _myers_pallas_call(
        jnp.asarray(peq_wfirst),
        jnp.asarray(plen),
        jnp.asarray(texts_t),
        jnp.asarray(tlen),
        num_words=W,
        num_text=texts.shape[1],
        interpret=interpret,
    )
    if not sync:
        return dist[0, :B], end[0, :B]
    return np.asarray(dist)[0, :B], np.asarray(end)[0, :B]
