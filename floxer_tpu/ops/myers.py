"""Batched Myers bit-parallel semi-global edit distance (pure JAX).

Myers' 1999 bit-vector algorithm for approximate string matching computes
exactly our semi-global recurrence (dp[0][j] = 0, free reference overhangs;
see ops/dp_reference.py) at 32 DP cells per machine word. This module is the
batched multi-word generalization (Hyyro's block scheme): state VP/VN is
[W, B] uint32 with W = ceil(max_pattern/32) words, carries ripple through a
small unrolled word loop, and the text dimension is one lax.scan — so one
jitted call scores a whole padded batch of (pattern, text) pairs.

This is the verification workhorse for EXISTENCE checks and score+end
position (alignment.cpp modes 1 and 2); CIGAR traceback for accepted roots
runs on host from the device-reported end column. The Pallas variant
(pallas_myers.py) keeps the whole scan in VMEM with double-buffered text
tiles; this version is its oracle and the fallback on non-TPU backends.

End-column semantics match dp_reference: rightmost minimal end among columns
0..text_len-1 (update on <=, flush column excluded via the eligibility mask).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..alphabet import SIGMA

WORD = 32


def build_peq(patterns: np.ndarray, pattern_lengths: np.ndarray) -> np.ndarray:
    """Host-side Peq bitmask table: [B, SIGMA, W] uint32.

    Bit i of word w of Peq[b, s] is set iff patterns[b, w*32+i] == s and
    w*32+i < pattern_lengths[b].
    """
    B, M = patterns.shape
    W = -(-M // WORD)
    peq = np.zeros((B, SIGMA, W), dtype=np.uint32)
    for b in range(B):
        m = int(pattern_lengths[b])
        for i in range(m):
            s = int(patterns[b, i])
            peq[b, s, i // WORD] |= np.uint32(1) << np.uint32(i % WORD)
    return peq


def build_peq_vectorized(
    patterns: np.ndarray, pattern_lengths: np.ndarray
) -> np.ndarray:
    """Vectorized Peq construction (no Python-per-char loops)."""
    B, M = patterns.shape
    W = -(-M // WORD)
    padded = np.zeros((B, W * WORD), dtype=np.int64)
    padded[:, :M] = patterns
    idx = np.arange(W * WORD)
    valid = idx[None, :] < pattern_lengths[:, None]  # [B, W*32]
    bits = (np.uint32(1) << (idx % WORD).astype(np.uint32))[None, :]
    peq = np.zeros((B, SIGMA, W), dtype=np.uint32)
    for s in range(SIGMA):
        mask = (padded == s) & valid
        contrib = np.where(mask, bits, 0).astype(np.uint64)
        # sum bits per word (they are disjoint, so add == or)
        peq[:, s, :] = np.add.reduceat(
            contrib, np.arange(0, W * WORD, WORD), axis=1
        ).astype(np.uint32)
    return peq


@partial(jax.jit, static_argnames=("num_words",))
def myers_batched(
    peq: jax.Array,  # uint32 [B, SIGMA, W]
    pattern_lengths: jax.Array,  # int32 [B]
    texts: jax.Array,  # int32/uint8 [B, N]
    text_lengths: jax.Array,  # int32 [B]
    num_words: int,
) -> tuple[jax.Array, jax.Array]:
    """Returns (distance, end_col) per batch row, identical semantics to
    device_dp.batched_semi_global_distance."""
    B = peq.shape[0]
    W = num_words
    texts = texts.astype(jnp.int32)
    pattern_lengths = pattern_lengths.astype(jnp.int32)
    text_lengths = text_lengths.astype(jnp.int32)

    peq_w_first = jnp.transpose(peq, (2, 0, 1))  # [W, B, SIGMA]

    msb_word = (pattern_lengths - 1) // WORD  # [B]
    msb_bit = ((pattern_lengths - 1) % WORD).astype(jnp.uint32)
    msb_mask = (jnp.uint32(1) << msb_bit).astype(jnp.uint32)  # [B]

    # active-word mask: words beyond the pattern stay zeroed so their HP/HN
    # can never pollute the carry chain
    word_ids = jnp.arange(W, dtype=jnp.int32)[:, None]  # [W, 1]
    active = word_ids <= msb_word[None, :]  # [W, B]

    ones = jnp.uint32(0xFFFFFFFF)

    vp0 = jnp.where(active, ones, jnp.uint32(0))
    vn0 = jnp.zeros((W, B), dtype=jnp.uint32)
    score0 = pattern_lengths

    def step(carry, j):
        vp, vn, score, best, best_end = carry
        chars = texts[:, j]  # [B]
        # Eq per word: gather the char's bitmask column
        eq = jnp.take_along_axis(
            peq_w_first, chars[None, :, None], axis=2
        ).squeeze(-1)  # [W, B]

        # --- multi-word Myers step with rippling carries ---
        add_carry = jnp.zeros((B,), dtype=jnp.uint32)
        hp_shift_carry = jnp.zeros((B,), dtype=jnp.uint32)
        hn_shift_carry = jnp.zeros((B,), dtype=jnp.uint32)
        new_vp = []
        new_vn = []
        ph_msb_acc = jnp.zeros((B,), dtype=jnp.uint32)
        mh_msb_acc = jnp.zeros((B,), dtype=jnp.uint32)

        for w in range(W):
            eq_w = eq[w]
            vp_w = vp[w]
            vn_w = vn[w]
            # Xh = (((Eq & VP) + VP) ^ VP) | Eq  with add carry across words
            a = eq_w & vp_w
            t = a + vp_w
            c1 = (t < a).astype(jnp.uint32)
            s = t + add_carry
            c2 = (s < t).astype(jnp.uint32)
            add_carry = c1 | c2
            xh = (s ^ vp_w) | eq_w
            xv = eq_w | vn_w

            ph = vn_w | ~(xh | vp_w)
            mh = vp_w & xh

            # record the MSB-row deltas for rows living in this word
            is_msb_word = msb_word == w
            ph_msb_acc = jnp.where(is_msb_word, (ph & msb_mask), ph_msb_acc)
            mh_msb_acc = jnp.where(is_msb_word, (mh & msb_mask), mh_msb_acc)

            # shift Ph/Mh left by one across words (carry = previous MSB)
            ph_shifted = (ph << jnp.uint32(1)) | hp_shift_carry
            mh_shifted = (mh << jnp.uint32(1)) | hn_shift_carry
            hp_shift_carry = ph >> jnp.uint32(31)
            hn_shift_carry = mh >> jnp.uint32(31)

            vp_next = mh_shifted | ~(xv | ph_shifted)
            vn_next = ph_shifted & xv
            new_vp.append(vp_next)
            new_vn.append(vn_next)

        vp = jnp.stack(new_vp)
        vn = jnp.stack(new_vn)
        # mask inactive words back to the neutral state
        vp = jnp.where(active, vp, jnp.uint32(0))
        vn = jnp.where(active, vn, jnp.uint32(0))

        score = score + (ph_msb_acc != 0).astype(jnp.int32)
        score = score - (mh_msb_acc != 0).astype(jnp.int32)

        eligible = (j + 1) < text_lengths
        improves = eligible & (score <= best)
        best = jnp.where(improves, score, best)
        best_end = jnp.where(improves, j + 1, best_end)
        return (vp, vn, score, best, best_end), None

    N = texts.shape[1]
    init = (vp0, vn0, score0, score0, jnp.zeros((B,), dtype=jnp.int32))
    (vp, vn, score, best, best_end), _ = jax.lax.scan(
        step, init, jnp.arange(N, dtype=jnp.int32)
    )
    return best, best_end


# patterns up to this many words use the unrolled-word kernel; beyond it the
# carry-scan kernel avoids a W-times-unrolled trace
MAX_UNROLLED_WORDS = 8


@partial(jax.jit, static_argnames=("num_words",))
def myers_batched_large(
    peq: jax.Array,  # uint32 [B, SIGMA, W]
    pattern_lengths: jax.Array,  # int32 [B]
    texts: jax.Array,  # int32/uint8 [B, N]
    text_lengths: jax.Array,  # int32 [B]
    num_words: int,
) -> tuple[jax.Array, jax.Array]:
    """Large-pattern variant: the word dimension is a vector axis instead of
    an unrolled loop. The only true cross-word dependency — the carry chain
    of the (Eq & VP) + VP addition — is resolved with a Kogge-Stone
    generate/propagate prefix scan (log W depth); the bit-shift carries are
    a plain word roll. Handles 100k-base root verifications (W ~ 3200) in
    one compiled kernel.

    Layout [B, W]: the word axis sits on the 128-lane dimension, so even a
    batch-of-one root verification (the common case under interval
    optimization) fills the VPU — a [W, B] layout would leave 127/128 lanes
    idle at B = 1."""
    B = peq.shape[0]
    W = num_words
    texts = texts.astype(jnp.int32)
    pattern_lengths = pattern_lengths.astype(jnp.int32)
    text_lengths = text_lengths.astype(jnp.int32)

    msb_word = (pattern_lengths - 1) // WORD  # [B]
    msb_bit = ((pattern_lengths - 1) % WORD).astype(jnp.uint32)
    msb_mask = (jnp.uint32(1) << msb_bit).astype(jnp.uint32)  # [B]

    word_ids = jnp.arange(W, dtype=jnp.int32)[None, :]  # [1, W]
    active = word_ids <= msb_word[:, None]  # [B, W]
    ones = jnp.uint32(0xFFFFFFFF)

    vp0 = jnp.where(active, ones, jnp.uint32(0))
    vn0 = jnp.zeros((B, W), dtype=jnp.uint32)

    def carry_combine(left, right):
        # (g, p) monoid for carry lookahead: right after left
        gl, pl = left
        gr, pr = right
        return gr | (pr & gl), pr & pl

    UNROLL = 4

    def one_char(vp, vn, score, best, best_end, j):
        chars = texts[:, j]  # [B]
        eq = jnp.take_along_axis(
            peq, chars[:, None, None], axis=1
        )[:, 0, :]  # [B, W]

        a = eq & vp
        t = a + vp  # wrapping add, carries resolved below
        g = (t < a).astype(jnp.uint32)  # carry generate
        p = (t == ones).astype(jnp.uint32)  # carry propagate
        G, _ = jax.lax.associative_scan(carry_combine, (g, p), axis=1)
        # exclusive carries: word w receives the inclusive scan up to w-1
        carry_in = jnp.concatenate(
            [jnp.zeros((B, 1), dtype=jnp.uint32), G[:, :-1]], axis=1
        )
        s = t + carry_in

        xh = (s ^ vp) | eq
        xv = eq | vn
        ph = vn | ~(xh | vp)
        mh = vp & xh

        # MSB-row deltas, gathered at each lane's top word
        ph_msb = (
            jnp.take_along_axis(ph, msb_word[:, None].astype(jnp.int32), 1)[:, 0]
            & msb_mask
        )
        mh_msb = (
            jnp.take_along_axis(mh, msb_word[:, None].astype(jnp.int32), 1)[:, 0]
            & msb_mask
        )

        # cross-word left shift: word w takes word w-1's MSB
        def shift1(x):
            carry = jnp.concatenate(
                [
                    jnp.zeros((B, 1), dtype=jnp.uint32),
                    x[:, :-1] >> jnp.uint32(31),
                ],
                axis=1,
            )
            return (x << jnp.uint32(1)) | carry

        ph_shifted = shift1(ph)
        mh_shifted = shift1(mh)

        vp = jnp.where(active, mh_shifted | ~(xv | ph_shifted), jnp.uint32(0))
        vn = jnp.where(active, ph_shifted & xv, jnp.uint32(0))

        score = score + (ph_msb != 0).astype(jnp.int32)
        score = score - (mh_msb != 0).astype(jnp.int32)

        eligible = (j + 1) < text_lengths
        improves = eligible & (score <= best)
        best = jnp.where(improves, score, best)
        best_end = jnp.where(improves, j + 1, best_end)
        return vp, vn, score, best, best_end

    def step(carry, block):
        vp, vn, score, best, best_end = carry
        # a small unrolled block per scan iteration amortizes the per-step
        # loop overhead of lax.scan
        for u in range(UNROLL):
            vp, vn, score, best, best_end = one_char(
                vp, vn, score, best, best_end, block * UNROLL + u
            )
        return (vp, vn, score, best, best_end), None

    N = texts.shape[1]
    num_blocks = -(-N // UNROLL)
    if N % UNROLL:
        texts = jnp.pad(texts, ((0, 0), (0, num_blocks * UNROLL - N)))
    init = (
        vp0,
        vn0,
        pattern_lengths,
        pattern_lengths,
        jnp.zeros((B,), dtype=jnp.int32),
    )
    (_, _, _, best, best_end), _ = jax.lax.scan(
        step, init, jnp.arange(num_blocks, dtype=jnp.int32)
    )
    return best, best_end


def myers_distance(
    patterns: np.ndarray,
    pattern_lengths: np.ndarray,
    texts: np.ndarray,
    text_lengths: np.ndarray,
    sync: bool = True,
):
    """Convenience wrapper: builds Peq on host and runs the batched kernel.

    Dispatch: unrolled-word kernel for small patterns; for large patterns the
    VMEM-resident Pallas kernel on TPU (ops/pallas_myers_large), the XLA
    carry-scan formulation elsewhere.

    With sync=False the TPU paths return device arrays without forcing a
    download, so a caller submitting several batches can overlap their
    dispatches and download all results at the end (np.asarray is the
    reliable sync point on this backend)."""
    if jax.default_backend() == "tpu":
        max_len = int(np.max(pattern_lengths)) if len(pattern_lengths) else 0
        if max_len > MAX_UNROLLED_WORDS * WORD:
            from .pallas_myers_large import myers_pallas_large

            return myers_pallas_large(
                np.asarray(patterns),
                np.asarray(pattern_lengths),
                np.asarray(texts),
                np.asarray(text_lengths),
                interpret=False,
                sync=sync,
            )
        from .pallas_myers import myers_pallas

        return myers_pallas(
            np.asarray(patterns),
            np.asarray(pattern_lengths),
            np.asarray(texts),
            np.asarray(text_lengths),
            interpret=False,
            sync=sync,
        )

    peq = build_peq_vectorized(np.asarray(patterns), np.asarray(pattern_lengths))
    W = peq.shape[2]
    kernel = myers_batched if W <= MAX_UNROLLED_WORDS else myers_batched_large
    return kernel(
        jnp.asarray(peq),
        jnp.asarray(pattern_lengths, dtype=jnp.int32),
        jnp.asarray(texts),
        jnp.asarray(text_lengths, dtype=jnp.int32),
        num_words=W,
    )
