"""Pallas TPU kernel: banded sliding-window Myers edit distance.

The production verification kernel for tasks whose band is narrower than
their pattern (PEX roots and large inner nodes): carries Myers state only
for the exactness band of B = n - m + 2*budget + 1 rows (see
ops/myers_banded.py for the algorithm and the proof that results are
byte-equivalent to the full DP for every value the pipeline consumes).
For a 20 kb read at 7% error the band is ~256 words vs ~640 words of full
state — proportionally fewer vector registers per text column AND a
shorter Kogge-Stone carry scan.

Differences from the numpy mirror, chosen so the per-column loop body is
purely elementwise over [SUBLANES, BW] tiles (no cross-lane reductions,
no moving masks):

  - the band stops sliding once its bottom row reaches the pattern end m
    (column j_star = m - budget). From then on the stored rows are a fixed
    superset of the needed band (proof in mirror docstring notes), and the
    score of row m rides the STATIC top bit of the last band word.
  - per-task conditional shifting / carry pessimism are elementwise
    selects on per-task scalars broadcast across lanes.
  - scores/best/best_end are [S, BW] arrays whose meaningful value rides
    the last lane; other lanes hold don't-care values masked at extraction
    (same trick as ops/pallas_myers_large.py).

Host-side preparation (prepare_banded_batch) packs, per task: initial
VP/Peq band words (rows <= 0 all-match, rows 1..budget = pattern prefix),
the entering-row char stream (pattern chars from row budget+1 on), and the
scalars (text length, j_star, carry-pessimism thresholds).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..alphabet import SIGMA
from .myers import WORD

import os

# tasks per grid step. The per-column op chain is serially dependent, so
# with few tasks the kernel is latency-bound; stacking more tasks on the
# sublane axis gives every op more independent work to pipeline. 32 was
# fastest on v5e (see docs/BENCH.md); override for experiments.
SUBLANES = int(os.environ.get("FLOXER_TPU_BANDED_GROUP", "32"))
LANES = 128
TOP_BIT = np.uint32(0x80000000)


def _roll_down(x, lane_iota, bw):
    """Value of the next-higher lane (word p+1), 0 at the last lane."""
    rolled = pltpu.roll(x, shift=bw - 1, axis=1)
    return jnp.where(lane_iota < bw - 1, rolled, jnp.uint32(0))


def _roll_up(x, lane_iota):
    """Value of the next-lower lane (word p-1), 0 at lane 0."""
    rolled = pltpu.roll(x, shift=1, axis=1)
    return jnp.where(lane_iota >= 1, rolled, jnp.uint32(0))


def _kernel(
    vp0_ref,  # uint32 [S, BW]
    peq0_ref,  # uint32 [S, SIGMA, BW]
    texts_ref,  # int32 [S, Np]
    stream_ref,  # int32 [S, Np]
    tlen_ref,  # int32 [S, 1]
    jstar_ref,  # int32 [S, 1]  m - budget
    topshift_ref,  # int32 [S, 1]  B_store - budget (shift-phase pessimism col)
    mfrozen_ref,  # int32 [S, 1]  1 if m >= B_store (frozen-phase pessimism)
    minit_ref,  # int32 [S, 1]  m (initial scores)
    binit_ref,  # int32 [S, 1]  budget (initial bottom score)
    dist_ref,  # int32 [S, 1]
    end_ref,  # int32 [S, 1]
    *,
    band_words: int,
    num_text: int,
):
    BW = band_words
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, BW), 1)
    last_lane = lane_iota == BW - 1
    lane0 = lane_iota == 0
    top_mask = jnp.where(last_lane, TOP_BIT, jnp.uint32(0))
    bit0_lane0 = jnp.where(lane0, jnp.uint32(1), jnp.uint32(0))

    tlen = tlen_ref[:, :]
    j_star = jstar_ref[:, :]
    top_shift_col = topshift_ref[:, :]
    m_frozen_pessim = mfrozen_ref[:, :]  # int32 0/1
    m_init = minit_ref[:, :]
    b_init = binit_ref[:, :]

    log_rounds = max(1, (BW - 1).bit_length())
    ones = jnp.uint32(0xFFFFFFFF)

    def step(j, tchars, pchars, carry):
        vp, vn, peq, s_bot, s_m, best, best_end = carry
        col = j + 1  # [scalar] current text column
        sliding = col <= j_star  # [S,1] band still slides this column

        # --- band slide: shift VP/VN/Peq one bit toward p=0; entering
        # bottom row gets pessimistic VP and its pattern char's Peq bit
        def shr1(x, entering_mask):
            lo = (x >> jnp.uint32(1)) | (
                _roll_down(x, lane_iota, BW) << jnp.uint32(31)
            )
            return lo | entering_mask

        vp_sh = shr1(vp, top_mask)
        vn_sh = shr1(vn, jnp.uint32(0))
        vp = jnp.where(sliding, vp_sh, vp)
        vn = jnp.where(sliding, vn_sh, vn)
        new_peq = []
        for s in range(SIGMA):
            enter = jnp.where(pchars == s, top_mask, jnp.uint32(0))
            new_peq.append(jnp.where(sliding, shr1(peq[s], enter), peq[s]))
        peq = tuple(new_peq)
        s_bot = s_bot + jnp.where(sliding, 1, 0)

        # --- Eq for this text char: 6-way select
        eq = jnp.zeros((SUBLANES, BW), dtype=jnp.uint32)
        for s in range(SIGMA):
            eq = jnp.where(tchars == s, peq[s], eq)

        # --- Myers column update with Kogge-Stone carry scan across lanes
        xv = eq | vn
        a = eq & vp
        t = a + vp
        g = jnp.where(t < a, jnp.uint32(1), jnp.uint32(0))
        p = jnp.where(t == ones, jnp.uint32(1), jnp.uint32(0))
        for k in range(log_rounds):
            distance = 1 << k
            rolled_g = pltpu.roll(g, shift=distance, axis=1)
            rolled_p = pltpu.roll(p, shift=distance, axis=1)
            g_shift = jnp.where(lane_iota >= distance, rolled_g, jnp.uint32(0))
            p_shift = jnp.where(lane_iota >= distance, rolled_p, jnp.uint32(0))
            g = g | (p & g_shift)
            p = p & p_shift
        carry_in = _roll_up(g, lane_iota)
        summ = t + carry_in

        xh = (summ ^ vp) | eq
        ph = vn | ~(xh | vp)
        mh = vp & xh

        # --- score deltas at the band bottom (static top bit, last lane)
        d_bot = jnp.where((ph & top_mask) != 0, 1, 0) - jnp.where(
            (mh & top_mask) != 0, 1, 0
        )
        s_bot = s_bot + d_bot
        at_seed = col == j_star  # row m arrives at the bottom this column
        s_m = jnp.where(at_seed, s_bot, s_m + jnp.where(sliding, 0, d_bot))

        # --- horizontal shift down one row; entering top delta is +1
        # (pessimistic) once the top stored row is a real row, else 0.
        # int32 0/1 arithmetic: jnp.where over two BOOLEAN operands lowers
        # to an i8->i1 truncation Mosaic rejects
        pessim = jnp.where(
            sliding,
            jnp.where(col >= top_shift_col, 1, 0),
            m_frozen_pessim,
        )  # [S,1] int32
        ph_in = jnp.where(pessim != 0, bit0_lane0, jnp.uint32(0))
        ph_sh = (ph << jnp.uint32(1)) | _shift_up_carry(ph, lane_iota) | ph_in
        mh_sh = (mh << jnp.uint32(1)) | _shift_up_carry(mh, lane_iota)

        vp = mh_sh | ~(xv | ph_sh)
        vn = ph_sh & xv

        eligible = (col < tlen) & (col >= j_star)
        improves = eligible & (s_m <= best)
        best = jnp.where(improves, s_m, best)
        best_end = jnp.where(improves, col, best_end)
        return vp, vn, peq, s_bot, s_m, best, best_end

    def _shift_up_carry(x, iota):
        return _roll_up(x >> jnp.uint32(31), iota)

    num_blocks = num_text // LANES

    def outer(b, carry):
        start = pl.multiple_of(b * LANES, LANES)
        tblock = texts_ref[:, pl.ds(start, LANES)]
        pblock = stream_ref[:, pl.ds(start, LANES)]

        def inner(k, inner_carry):
            tb, pb, c = inner_carry
            c = step(b * LANES + k, tb[:, 0:1], pb[:, 0:1], c)
            tb = pltpu.roll(tb, shift=LANES - 1, axis=1)
            pb = pltpu.roll(pb, shift=LANES - 1, axis=1)
            return tb, pb, c

        _, _, carry = jax.lax.fori_loop(0, LANES, inner, (tblock, pblock, carry))
        return carry

    m_v = jnp.broadcast_to(m_init, (SUBLANES, BW)).astype(jnp.int32)
    b_v = jnp.broadcast_to(b_init, (SUBLANES, BW)).astype(jnp.int32)
    peq_init = tuple(peq0_ref[:, s, :] for s in range(SIGMA))
    init = (
        vp0_ref[:, :],
        jnp.zeros((SUBLANES, BW), dtype=jnp.uint32),
        peq_init,
        b_v,
        m_v,
        m_v,
        jnp.zeros((SUBLANES, BW), dtype=jnp.int32),
    )
    carry = jax.lax.fori_loop(0, num_blocks, outer, init)
    _, _, _, _, _, best, best_end = carry
    sel = last_lane
    dist_ref[:, :] = jnp.sum(jnp.where(sel, best, 0), axis=1, keepdims=True)
    end_ref[:, :] = jnp.sum(jnp.where(sel, best_end, 0), axis=1, keepdims=True)


@functools.partial(
    jax.jit, static_argnames=("band_words", "num_text", "interpret")
)
def _pallas_banded_call(
    vp0, peq0, texts, stream, scalars, band_words, num_text, interpret
):
    B = vp0.shape[0]
    grid = (B // SUBLANES,)
    kernel = functools.partial(
        _kernel, band_words=band_words, num_text=num_text
    )
    tlen, jstar, topshift, mfrozen, minit, binit = scalars
    spec1 = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple([i] + [0] * (len(shape) - 1)),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            spec1((SUBLANES, band_words)),
            spec1((SUBLANES, SIGMA, band_words)),
            spec1((SUBLANES, num_text)),
            spec1((SUBLANES, num_text)),
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
        interpret=interpret,
    )(vp0, peq0, texts, stream, tlen, jstar, topshift, mfrozen, minit, binit)


def prepare_banded_batch(
    patterns: list[np.ndarray],
    budgets: np.ndarray,
    band_words: int,
    num_text: int,
):
    """Vectorized host packing of per-task banded state.

    band_words/num_text are the bucket's static shape (band_words a
    multiple of 128 covering every task's nominal band).
    """
    T = len(patterns)
    b_store = band_words * WORD
    vp0 = np.zeros((T, band_words), dtype=np.uint32)
    peq0 = np.zeros((T, SIGMA, band_words), dtype=np.uint32)
    stream = np.full((T, num_text), 255, dtype=np.int32)
    tlen = np.zeros((T, 1), dtype=np.int32)
    jstar = np.zeros((T, 1), dtype=np.int32)
    topshift = np.zeros((T, 1), dtype=np.int32)
    mfrozen = np.zeros((T, 1), dtype=np.int32)
    minit = np.zeros((T, 1), dtype=np.int32)
    binit = np.zeros((T, 1), dtype=np.int32)

    bit_idx = np.arange(b_store)
    bitvals = (np.uint32(1) << (bit_idx % WORD).astype(np.uint32))
    word_idx = bit_idx // WORD

    for t, pattern in enumerate(patterns):
        m = len(pattern)
        k = int(budgets[t])
        rows = bit_idx + k - (b_store - 1)  # absolute row at band pos p
        vp_bits = rows >= 1
        np.add.at(vp0[t], word_idx[vp_bits], bitvals[vp_bits])
        pad_rows = rows <= 0
        in_pat = (rows >= 1) & (rows <= m)
        pat_at = np.zeros(b_store, dtype=np.int64)
        pat_at[in_pat] = pattern[rows[in_pat] - 1]
        for s in range(SIGMA):
            bits = pad_rows | (in_pat & (pat_at == s))
            np.add.at(peq0[t, s], word_idx[bits], bitvals[bits])
        n_stream = min(num_text, max(0, m - k))
        if n_stream > 0:
            stream[t, :n_stream] = pattern[k : k + n_stream]
        jstar[t, 0] = m - k
        topshift[t, 0] = b_store - k
        mfrozen[t, 0] = 1 if m >= b_store else 0
        minit[t, 0] = m
        binit[t, 0] = k
    return vp0, peq0, stream, (tlen, jstar, topshift, mfrozen, minit, binit)


def myers_pallas_banded(
    patterns: list[np.ndarray],
    texts: np.ndarray,  # [T, Np] padded uint8
    text_lengths: np.ndarray,
    budgets: np.ndarray,
    band_words: int,
    interpret: bool | None = None,
    sync: bool = True,
):
    """Banded kernel entry: returns (distance, end_col) per task, with the
    exactness contract of ops/myers_banded.py. Requires 0 < budget < m and
    band_words*32 >= n - m + 2*budget + 1 for every task."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    T = len(patterns)
    Tp = -(-T // SUBLANES) * SUBLANES
    Np = texts.shape[1]
    assert Np % LANES == 0

    vp0, peq0, stream, scalars = prepare_banded_batch(
        patterns, budgets, band_words, Np
    )
    tlen = scalars[0]
    tlen[:, 0] = text_lengths

    def pad(x, fill=0):
        if x.shape[0] == Tp:
            return x
        out = np.full((Tp,) + x.shape[1:], fill, dtype=x.dtype)
        out[:T] = x
        return out

    vp0 = pad(vp0)
    peq0 = pad(peq0)
    stream = pad(stream, 255)
    texts_padded = pad(np.asarray(texts, dtype=np.int32))
    scalars = tuple(pad(s, 1) for s in scalars)

    dist, end = _pallas_banded_call(
        jnp.asarray(vp0),
        jnp.asarray(peq0),
        jnp.asarray(texts_padded),
        jnp.asarray(stream),
        tuple(jnp.asarray(s) for s in scalars),
        band_words=band_words,
        num_text=Np,
        interpret=interpret,
    )
    if not sync:
        return dist[:T, 0], end[:T, 0]
    return np.asarray(dist)[:T, 0], np.asarray(end)[:T, 0]
