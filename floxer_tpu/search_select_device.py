"""On-device anchor selection: caps, ordering, choice, locate, dominance.

The device-side mirror of native/search.cpp `select_one` (itself the
behavioral port of the reference's search.cpp:190-318): given the frontier
search's deduplicated, canonically ordered anchor GROUPS per seed, apply

  - the hard-cap seed exclusion (search.cpp:190-202),
  - the group ordering (count_first / errors_first / none,
    search.cpp:204-229),
  - the anchor choice strategy (round_robin rotation / full_groups /
    first_reported, search.cpp:239-299) up to the soft cap,
  - batched locate of every chosen SA row (index/device_index.locate_batch,
    the bounded LF-walk — search.cpp:253),
  - and the erase-useless dominance sweep (search.cpp:352-389)

entirely as batched/segmented device ops: the BASELINE north star's
"heuristic anchor selection as top-k reductions on device". Output is
bit-identical to native_select_from_groups_batch (asserted across every
config combination by tests/test_select_device.py), so DeviceSearcher can
swap the native stage for this one without touching the SoA assembly.

Why a dense [seeds, soft_cap] group table is enough: every group emits its
first anchor no earlier than emission #(its rank in choice order) — in
round_robin, round 0 visits all groups (each has count >= 1) in choice
order; in full_groups the prefix rows before group i are >= i. So a group
ranked >= soft_cap within its seed can never emit before the soft cap
binds, and only the first soft_cap choice-ordered groups matter.

Selection is emission-centric: a fori_loop over emission slots e ∈
[0, soft_cap) computes, per seed in parallel, which (group, row) pair the
e-th emission takes — for round_robin via the per-round emission counts
n_r (groups with count > r), for full_groups via prefix row counts. The
emission index e itself is the within-seed emission order, which the final
(reference, position)-stable ordering and the dominance sweep both key on.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .index.device_index import DeviceIndex, locate_batch

# counts[:, 0] status bits, matching native/search.cpp select_one
_STATUS_OVERFLOW = 2
_STATUS_EXCLUDED = 4

_I32MAX = np.int32(2**31 - 1)


def _seg_rank_and_bounds(gid_sorted, group_starts):
    """Within-segment rank of each row of a gid-sorted flat array, given
    the per-seed segment starts (the sort is stable with gid primary, so
    segment row ranges match the unsorted layout)."""
    n = gid_sorted.shape[0]
    row = jnp.arange(n, dtype=jnp.int32)
    seg_first = group_starts[gid_sorted]
    return row - seg_first


@partial(
    jax.jit,
    static_argnames=(
        "soft_cap",
        "order_code",
        "choice_code",
        "erase_useless",
    ),
)
def _select_kernel(
    index: DeviceIndex,
    lb,  # int32 [G] group SA lower bound (fwd)
    cnt,  # int32 [G] group size (cursor length)
    err,  # int32 [G] group error count
    gid,  # int32 [G] owning seed, ascending; padding rows gid == S
    perm,  # int32 [G] host-computed group-order permutation (introsort)
    group_starts,  # int32 [S + 1]
    totals,  # int32 [S] raw anchor totals per seed
    statuses,  # int32 [S] incoming status bits
    hard_cap: jnp.ndarray,  # int32 scalar
    soft_cap: int,
    order_code: int,
    choice_code: int,
    erase_useless: bool,
):
    S = totals.shape[0]
    CAP = soft_cap
    G = lb.shape[0]

    # ---- seed-level status (hard cap; incoming overflow bits) ----
    excluded = (totals > hard_cap) & (choice_code != 2)
    status = statuses | jnp.where(excluded, _STATUS_EXCLUDED, 0)
    seed_ok = (status & (_STATUS_OVERFLOW | _STATUS_EXCLUDED)) == 0

    # ---- group ordering within each seed ----
    # the permutation is computed on host with the faithful introsort
    # replica (utils/introsort.py) so tie placement matches the native
    # std::sort path bit-exactly; `perm` arrives as an input array
    del order_code  # retained in the jit key: orders share no programs
    lb_s = lb[perm]
    cnt_s = cnt[perm]
    err_s = err[perm]
    gid_s = gid[perm]

    # ---- dense [S, CAP] table of the first CAP choice-ordered groups ----
    rank = _seg_rank_and_bounds(gid_s, group_starts)
    keep = (rank < CAP) & (gid_s < S)
    slot = jnp.where(keep, gid_s * CAP + rank, S * CAP)

    def dense(values, fill):
        out = jnp.full((S * CAP + 1,), fill, dtype=jnp.int32)
        out = out.at[slot].set(jnp.where(keep, values, fill), mode="drop")
        return out[:-1].reshape(S, CAP)

    d_lb = dense(lb_s, 0)
    d_cnt = dense(cnt_s, 0)  # 0-count columns = padding
    d_err = dense(err_s, 0)

    kept_raw = jnp.where(seed_ok, jnp.minimum(totals, CAP), 0)

    # ---- emission-centric choice ----
    # emission e of a seed resolves to (group g_e, row r_e); SA row =
    # lb[g_e] + r_e. The loops below are over the STATIC soft cap.
    if choice_code == 0:
        # round_robin: per-round emission counts n_r = #{groups: cnt > r},
        # cumulative S_r; emission e falls in round r with S_r <= e <
        # S_{r+1}, visiting the (e - S_r)-th group with cnt > r in order.
        def n_col(r, acc):
            col = jnp.sum(d_cnt > r, axis=1).astype(jnp.int32)
            return jax.lax.dynamic_update_slice_in_dim(
                acc, col[:, None], r, axis=1
            )

        n_rounds = jax.lax.fori_loop(
            0, CAP, n_col, jnp.zeros((S, CAP), dtype=jnp.int32)
        )
        s_cum = jnp.cumsum(n_rounds, axis=1) - n_rounds  # exclusive

        def emit_rr(e, acc):
            rows, errs, valid = acc
            r = jnp.sum(s_cum <= e, axis=1).astype(jnp.int32) - 1  # [S]
            k = e - jnp.take_along_axis(s_cum, r[:, None], axis=1)[:, 0]
            mask = d_cnt > r[:, None]
            csum = jnp.cumsum(mask.astype(jnp.int32), axis=1)
            is_target = mask & (csum == (k + 1)[:, None])
            got = jnp.sum(is_target.astype(jnp.int32), axis=1) > 0
            pick_lb = jnp.sum(jnp.where(is_target, d_lb, 0), axis=1)
            pick_err = jnp.sum(jnp.where(is_target, d_err, 0), axis=1)
            ok = got & (e < kept_raw)
            rows = jax.lax.dynamic_update_slice_in_dim(
                rows, (pick_lb + r)[:, None], e, axis=1
            )
            errs = jax.lax.dynamic_update_slice_in_dim(
                errs, pick_err[:, None], e, axis=1
            )
            valid = jax.lax.dynamic_update_slice_in_dim(
                valid, ok[:, None], e, axis=1
            )
            return rows, errs, valid

        sa_rows, em_err, em_valid = jax.lax.fori_loop(
            0,
            CAP,
            emit_rr,
            (
                jnp.zeros((S, CAP), dtype=jnp.int32),
                jnp.zeros((S, CAP), dtype=jnp.int32),
                jnp.zeros((S, CAP), dtype=bool),
            ),
        )
    else:
        # full_groups / first_reported: rows in group order
        prefix = jnp.cumsum(d_cnt, axis=1) - d_cnt  # exclusive row prefix

        def emit_fg(e, acc):
            rows, errs, valid = acc
            g = jnp.sum(
                (prefix <= e) & (d_cnt > 0), axis=1
            ).astype(jnp.int32) - 1
            g_cl = jnp.clip(g, 0, CAP - 1)[:, None]
            row_in_g = e - jnp.take_along_axis(prefix, g_cl, axis=1)[:, 0]
            pick_lb = jnp.take_along_axis(d_lb, g_cl, axis=1)[:, 0]
            pick_err = jnp.take_along_axis(d_err, g_cl, axis=1)[:, 0]
            ok = (g >= 0) & (e < kept_raw)
            rows = jax.lax.dynamic_update_slice_in_dim(
                rows, (pick_lb + row_in_g)[:, None], e, axis=1
            )
            errs = jax.lax.dynamic_update_slice_in_dim(
                errs, pick_err[:, None], e, axis=1
            )
            valid = jax.lax.dynamic_update_slice_in_dim(
                valid, ok[:, None], e, axis=1
            )
            return rows, errs, valid

        sa_rows, em_err, em_valid = jax.lax.fori_loop(
            0,
            CAP,
            emit_fg,
            (
                jnp.zeros((S, CAP), dtype=jnp.int32),
                jnp.zeros((S, CAP), dtype=jnp.int32),
                jnp.zeros((S, CAP), dtype=bool),
            ),
        )

    # ---- batched locate: SA rows -> (reference id, in-reference pos) ----
    flat_rows = jnp.where(em_valid, sa_rows, 0).reshape(-1)
    ref_flat, pos_flat = locate_batch(index, flat_rows)
    ref = ref_flat.reshape(S, CAP).astype(jnp.int32)
    pos = pos_flat.reshape(S, CAP).astype(jnp.int32)

    # ---- final ordering: stable by reference over emission order, then
    # (erase_useless) stable by position within a reference ----
    emission = jax.lax.broadcasted_iota(jnp.int32, (S, CAP), 1)
    big_ref = jnp.where(em_valid, ref, _I32MAX)  # invalid slots sort last
    if erase_useless:
        keys = (emission, pos, big_ref)
    else:
        keys = (emission, big_ref)
    order = jnp.lexsort(keys, axis=1)
    ref_o = jnp.take_along_axis(big_ref, order, axis=1)
    pos_o = jnp.take_along_axis(pos, order, axis=1)
    err_o = jnp.take_along_axis(em_err, order, axis=1)
    valid_o = jnp.take_along_axis(em_valid, order, axis=1)

    if erase_useless:
        # dominance sweep (search.cpp:352-389): a pivot marks the run of
        # followers it dominates; the first non-dominated follower may mark
        # the pivot back (retroactively) and becomes the new pivot.
        # Vectorized across seeds; scanned over the CAP position-sorted
        # columns with segment resets at reference changes.
        def sweep(carry, col):
            p_ref, p_pos, p_err, p_idx, p_live = carry
            a_ref, a_pos, a_err, a_idx, a_valid = col
            same_seg = a_valid & p_live & (a_ref == p_ref)
            d = jnp.abs(p_pos - a_pos)
            piv_dominates = same_seg & (p_err <= a_err) & (d <= a_err - p_err)
            a_dominates = same_seg & (a_err <= p_err) & (d <= p_err - a_err)
            direct_mark = piv_dominates  # mark this column, pivot stays
            # pivot hand-off when the follower is not dominated (or the
            # segment changed / pivot was dead)
            handoff = (a_valid & ~same_seg) | (same_seg & ~piv_dominates)
            retro_mark = same_seg & ~piv_dominates & a_dominates
            retro_idx = jnp.where(retro_mark, p_idx, CAP)
            new_carry = (
                jnp.where(handoff, a_ref, p_ref),
                jnp.where(handoff, a_pos, p_pos),
                jnp.where(handoff, a_err, p_err),
                jnp.where(handoff, a_idx, p_idx),
                p_live | a_valid,
            )
            return new_carry, (direct_mark, retro_idx, retro_mark)

        idx_cols = jax.lax.broadcasted_iota(jnp.int32, (S, CAP), 1)
        carry0 = (
            jnp.full((S,), -1, dtype=jnp.int32),
            jnp.zeros((S,), dtype=jnp.int32),
            jnp.zeros((S,), dtype=jnp.int32),
            jnp.zeros((S,), dtype=jnp.int32),
            jnp.zeros((S,), dtype=bool),
        )
        cols = (
            ref_o.T,
            pos_o.T,
            err_o.T,
            idx_cols.T,
            valid_o.T,
        )
        _, (direct_T, retro_idx_T, retro_mark_T) = jax.lax.scan(
            sweep, carry0, cols
        )
        marked = direct_T.T  # [S, CAP]
        # apply retroactive pivot marks (at most one per scan step)
        retro_idx = retro_idx_T.T  # [S, CAP] target column or CAP
        retro_mark = retro_mark_T.T
        seed_base = (
            jax.lax.broadcasted_iota(jnp.int32, (S, CAP), 0) * (CAP + 1)
        )
        # non-marking steps carry retro_idx == CAP, landing in the padding
        # column that is sliced away below (their written value is False)
        flat_marks = jnp.zeros((S * (CAP + 1),), dtype=bool)
        flat_marks = flat_marks.at[
            (seed_base + retro_idx).reshape(-1)
        ].set(retro_mark.reshape(-1), mode="drop")
        marked = marked | flat_marks.reshape(S, CAP + 1)[:, :CAP]
        survives = valid_o & ~marked
        # compact survivors to the front, preserving order
        comp_rank = jnp.cumsum(survives.astype(jnp.int32), axis=1) - 1
        target = jnp.where(survives, comp_rank, CAP)
        out_flat = jnp.zeros((S * (CAP + 1), 3), dtype=jnp.int32)
        rows3 = jnp.stack([ref_o, pos_o, err_o], axis=-1)
        out_flat = out_flat.at[
            (seed_base + target).reshape(-1)
        ].set(rows3.reshape(-1, 3), mode="drop")
        anchors = out_flat.reshape(S, CAP + 1, 3)[:, :CAP]
        num_written = jnp.sum(survives.astype(jnp.int32), axis=1)
        kept_useful = num_written
    else:
        anchors = jnp.stack([ref_o, pos_o, err_o], axis=-1)
        anchors = jnp.where(valid_o[:, :, None], anchors, 0)
        num_written = kept_raw
        kept_useful = kept_raw

    counts = jnp.stack(
        [
            status,
            num_written,
            kept_raw,
            kept_useful,
            totals,
        ],
        axis=1,
    ).astype(jnp.int32)
    return anchors, counts


def device_select_from_groups_batch(
    device_index: DeviceIndex,
    groups_flat: np.ndarray,  # int64 [G, 4] (lb, lb_rev, len, err), canonical
    group_starts: np.ndarray,  # int64 [S + 1]
    totals: np.ndarray,  # int64 [S]
    statuses: np.ndarray,  # int64 [S]
    hard_cap: int,
    soft_cap: int,
    order_code: int,
    choice_code: int,
    erase_useless: bool,
):
    """Drop-in device replacement for native_select_from_groups_batch:
    returns (anchors int64 [S, soft_cap, 3], counts int64 [S, 5])."""
    S = len(totals)
    G = groups_flat.shape[0]
    if S == 0:
        return (
            np.zeros((0, soft_cap, 3), dtype=np.int64),
            np.zeros((0, 5), dtype=np.int64),
        )
    # pad shapes to powers of two: a bounded set of compiled programs
    Sp = 1
    while Sp < S:
        Sp *= 2
    Gp = max(Sp, 1)
    while Gp < max(G, 1):
        Gp *= 2

    gid = np.repeat(
        np.arange(S, dtype=np.int32),
        np.diff(group_starts).astype(np.int64),
    )
    lb = np.zeros(Gp, dtype=np.int32)
    cnt = np.zeros(Gp, dtype=np.int32)
    err = np.zeros(Gp, dtype=np.int32)
    gid_p = np.full(Gp, Sp, dtype=np.int32)
    lb[:G] = groups_flat[:, 0]
    cnt[:G] = groups_flat[:, 2]
    err[:G] = groups_flat[:, 3]
    gid_p[:G] = gid

    # per-seed group-order permutation on host: the faithful introsort
    # replica (utils/introsort.py) so ties — and the degenerate
    # errors_first predicate — land exactly where the native std::sort
    # path puts them
    perm = np.arange(Gp, dtype=np.int32)
    if order_code in (0, 1):
        from .utils.introsort import (
            count_first_comp,
            errors_first_comp,
            std_sort,
        )

        comp = count_first_comp if order_code == 0 else errors_first_comp
        counts64 = groups_flat[:, 2]
        errs64 = groups_flat[:, 3]
        for s in range(S):
            a, b = int(group_starts[s]), int(group_starts[s + 1])
            if b - a > 1:
                seg = list(range(a, b))
                std_sort(
                    seg,
                    lambda i, j: comp(
                        (counts64[i], errs64[i]), (counts64[j], errs64[j])
                    ),
                )
                perm[a:b] = seg
    starts_p = np.zeros(Sp + 1, dtype=np.int32)
    starts_p[: S + 1] = group_starts
    starts_p[S + 1 :] = group_starts[S]
    totals_p = np.zeros(Sp, dtype=np.int32)
    totals_p[:S] = np.minimum(totals, _I32MAX)
    statuses_p = np.zeros(Sp, dtype=np.int32)
    statuses_p[:S] = statuses

    anchors, counts = _select_kernel(
        device_index,
        jnp.asarray(lb),
        jnp.asarray(cnt),
        jnp.asarray(err),
        jnp.asarray(gid_p),
        jnp.asarray(perm),
        jnp.asarray(starts_p),
        jnp.asarray(totals_p),
        jnp.asarray(statuses_p),
        jnp.int32(min(hard_cap, int(_I32MAX))),
        soft_cap=int(soft_cap),
        order_code=int(order_code),
        choice_code=int(choice_code),
        erase_useless=bool(erase_useless),
    )
    anchors = np.asarray(anchors[:S]).astype(np.int64)
    counts = np.asarray(counts[:S]).astype(np.int64)
    return anchors, counts
