// Batched bit-parallel semi-global edit distance on the host.
//
// Native mirror of ops/dp_reference.semi_global_dp_matrix +
// _rightmost_argmin (the reference-pinned seqan3-compatible optimum:
// dp[0][j] = 0 free text prefix, query aligned end-to-end, optimum =
// rightmost minimal end column EXCLUDING the flush-with-window-end
// column). Used by the batch verifier's host fallback when no
// accelerator is present — Myers' multi-word bit-vector algorithm runs
// ~50-100x faster than the vectorized numpy DP at verification shapes.
//
// Build: compiled into libfloxer_native.so (Makefile NATIVE_SRCS).

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int kSigma = 8;  // rank alphabet 0..5 (+ padding headroom)

void one_task(
    const uint8_t* window, int64_t n,
    const uint8_t* pattern, int64_t m,
    int64_t* out_distance, int64_t* out_end,
    std::vector<uint64_t>& eq_scratch) {
    if (m <= 0) {
        *out_distance = 0;
        *out_end = 0;
        return;
    }
    int64_t const words = (m + 63) / 64;
    eq_scratch.assign(static_cast<size_t>(kSigma * words), 0);
    uint64_t* eq = eq_scratch.data();
    for (int64_t i = 0; i < m; i++) {
        int const symbol = pattern[i] & (kSigma - 1);
        eq[symbol * words + i / 64] |= uint64_t(1) << (i % 64);
    }

    std::vector<uint64_t> vp(static_cast<size_t>(words), ~uint64_t(0));
    std::vector<uint64_t> vn(static_cast<size_t>(words), 0);
    int64_t const msb_word = (m - 1) / 64;
    uint64_t const msb_mask = uint64_t(1) << ((m - 1) % 64);

    int64_t score = m;
    int64_t best = m;   // column 0: dp[m][0] = m
    int64_t best_end = 0;
    // eligible end columns are 0..n-1 (the flush column n is excluded),
    // so only the first n-1 text characters can improve the optimum
    for (int64_t j = 1; j < n; j++) {
        const uint64_t* eq_row = eq + (window[j - 1] & (kSigma - 1)) * words;
        uint64_t add_carry = 0, hp_carry = 0, hn_carry = 0;
        int64_t delta = 0;
        for (int64_t w = 0; w < words; w++) {
            uint64_t const eq_w = eq_row[w];
            uint64_t const vp_w = vp[w];
            uint64_t const vn_w = vn[w];
            uint64_t const a = eq_w & vp_w;
            uint64_t t = a + vp_w;
            uint64_t c1 = t < a;
            uint64_t const s = t + add_carry;
            c1 |= s < t;
            add_carry = c1;
            uint64_t const xh = (s ^ vp_w) | eq_w;
            uint64_t const xv = eq_w | vn_w;
            uint64_t ph = vn_w | ~(xh | vp_w);
            uint64_t mh = vp_w & xh;
            if (w == msb_word) {
                delta = int64_t((ph & msb_mask) != 0) -
                        int64_t((mh & msb_mask) != 0);
            }
            uint64_t const ph_out = ph >> 63;
            uint64_t const mh_out = mh >> 63;
            ph = (ph << 1) | hp_carry;
            mh = (mh << 1) | hn_carry;
            hp_carry = ph_out;
            hn_carry = mh_out;
            vp[w] = mh | ~(xv | ph);
            vn[w] = ph & xv;
        }
        score += delta;
        if (score <= best) {  // <= keeps the RIGHTMOST minimal column
            best = score;
            best_end = j;
        }
    }
    *out_distance = best;
    *out_end = best_end;
}

// Banded sliding-window variant: exact mirror of ops/myers_banded.py
// (myers_banded_np) with 64-bit words — carries only the exactness band of
// B = n - m + 2*budget + 1 rows. Output-equivalent to the full DP for
// every value the pipeline consumes (distance <= budget exact; otherwise
// the reject decision agrees; proof in the mirror's module docstring).
void one_task_banded(
    const uint8_t* window, int64_t n,
    const uint8_t* pattern, int64_t m,
    int64_t budget,
    int64_t* out_distance, int64_t* out_end,
    std::vector<uint64_t>& scratch) {
    constexpr int kRanks = 6;  // real alphabet ranks 0..5
    int64_t const b_nominal = (n - m) + 2 * budget + 1;
    int64_t const bw = (b_nominal + 63) / 64;
    int64_t const b_store = bw * 64;

    // scratch layout: vp | vn | m_mask | peq[kRanks]
    scratch.assign(static_cast<size_t>((3 + kRanks) * bw), 0);
    uint64_t* vp = scratch.data();
    uint64_t* vn = vp + bw;
    uint64_t* m_mask = vn + bw;
    uint64_t* peq = m_mask + bw;

    // initial band at column 0: band position p holds absolute row
    // i(p) = budget - (b_store - 1 - p); rows <= 0 are the free-start
    // padding (all-match, flat), rows 1..budget carry the pattern prefix
    for (int64_t p = 0; p < b_store; p++) {
        int64_t const row = p + budget - (b_store - 1);
        uint64_t const bit = uint64_t(1) << (p % 64);
        int64_t const w = p / 64;
        if (row >= 1) {
            vp[w] |= bit;
            if (row <= m) peq[(pattern[row - 1] % kRanks) * bw + w] |= bit;
        } else {
            for (int s = 0; s < kRanks; s++) peq[int64_t(s) * bw + w] |= bit;
        }
    }

    auto shift_right_one = [bw](uint64_t* words, int entering) {
        for (int64_t w = 0; w < bw - 1; w++) {
            words[w] = (words[w] >> 1) | (words[w + 1] << 63);
        }
        words[bw - 1] >>= 1;
        if (entering) words[bw - 1] |= uint64_t(1) << 63;
    };

    uint64_t const top_bit = uint64_t(1) << 63;
    int64_t s_bot = budget;
    int64_t s_m = m;
    int64_t best = m;
    int64_t best_end = 0;
    int64_t const j_star = m - budget;
    int64_t const top_real_after = b_store - 1 - budget;

    std::vector<uint64_t> xv_v(static_cast<size_t>(bw)),
        ph_v(static_cast<size_t>(bw)), mh_v(static_cast<size_t>(bw));
    uint64_t* xv = xv_v.data();
    uint64_t* ph = ph_v.data();
    uint64_t* mh = mh_v.data();

    for (int64_t j = 0; j < n; j++) {
        int64_t const col = j + 1;
        shift_right_one(vp, 1);
        shift_right_one(vn, 0);
        s_bot += 1;
        int64_t const enter_row = j + budget;  // pattern index of new row
        int const ch = enter_row < m ? pattern[enter_row] % kRanks : -1;
        for (int s = 0; s < kRanks; s++) {
            shift_right_one(peq + int64_t(s) * bw, ch == s);
        }
        shift_right_one(m_mask, col == j_star);

        int const tch = window[j] % kRanks;
        const uint64_t* eq = peq + int64_t(tch) * bw;

        uint64_t add_carry = 0;
        for (int64_t w = 0; w < bw; w++) {
            uint64_t const eq_w = eq[w];
            uint64_t const vp_w = vp[w];
            uint64_t const a = eq_w & vp_w;
            uint64_t t = a + vp_w;
            uint64_t c1 = t < a;
            uint64_t const s = t + add_carry;
            c1 |= s < t;
            add_carry = c1;
            uint64_t const xh = (s ^ vp_w) | eq_w;
            xv[w] = eq_w | vn[w];
            ph[w] = vn[w] | ~(xh | vp_w);
            mh[w] = vp_w & xh;
        }

        s_bot += int64_t((ph[bw - 1] & top_bit) != 0) -
                 int64_t((mh[bw - 1] & top_bit) != 0);
        if (col == j_star) {
            s_m = s_bot;
        } else {
            int ph_m = 0, mh_m = 0;
            for (int64_t w = 0; w < bw; w++) {
                ph_m |= (ph[w] & m_mask[w]) != 0;
                mh_m |= (mh[w] & m_mask[w]) != 0;
            }
            s_m += int64_t(ph_m) - int64_t(mh_m);
        }

        uint64_t ph_carry = col > top_real_after ? 1 : 0;
        uint64_t mh_carry = 0;
        for (int64_t w = 0; w < bw; w++) {
            uint64_t const ph_out = ph[w] >> 63;
            uint64_t const mh_out = mh[w] >> 63;
            uint64_t const ph_sh = (ph[w] << 1) | ph_carry;
            uint64_t const mh_sh = (mh[w] << 1) | mh_carry;
            ph_carry = ph_out;
            mh_carry = mh_out;
            vp[w] = mh_sh | ~(xv[w] | ph_sh);
            vn[w] = ph_sh & xv[w];
        }

        if (col >= j_star && col < n && s_m <= best) {
            best = s_m;
            best_end = col;
        }
    }
    *out_distance = best;
    *out_end = best_end;
}

}  // namespace

extern "C" {

int floxer_myers_distance_batch(
    const uint8_t* window_buffer, const int64_t* window_offsets,
    const int64_t* window_lengths,
    const uint8_t* pattern_buffer, const int64_t* pattern_offsets,
    const int64_t* pattern_lengths,
    const int64_t* budgets,  // -1 = unknown -> always full-state
    int64_t num_tasks,
    int64_t* out_distance, int64_t* out_end,
    int64_t num_threads) {
    if (num_tasks <= 0) return 0;
    if (num_threads < 1) num_threads = 1;
    if (num_threads > num_tasks) num_threads = num_tasks;

    auto worker = [&](int64_t begin, int64_t end) {
        std::vector<uint64_t> eq_scratch;
        std::vector<uint64_t> band_scratch;
        for (int64_t t = begin; t < end; t++) {
            int64_t const m = pattern_lengths[t];
            int64_t const n = window_lengths[t];
            int64_t const budget = budgets ? budgets[t] : -1;
            bool banded = budget > 0 && budget < m && n >= m - budget;
            if (banded) {
                // banded wins when its band state is strictly narrower
                int64_t const bw_band = ((n - m) + 2 * budget + 1 + 63) / 64;
                int64_t const bw_full = (m + 63) / 64;
                banded = bw_band < bw_full;
            }
            if (banded) {
                one_task_banded(
                    window_buffer + window_offsets[t], n,
                    pattern_buffer + pattern_offsets[t], m,
                    budget, out_distance + t, out_end + t, band_scratch);
            } else {
                one_task(
                    window_buffer + window_offsets[t], n,
                    pattern_buffer + pattern_offsets[t], m,
                    out_distance + t, out_end + t, eq_scratch);
            }
        }
    };
    if (num_threads == 1) {
        worker(0, num_tasks);
        return 0;
    }
    std::vector<std::thread> threads;
    int64_t const chunk = (num_tasks + num_threads - 1) / num_threads;
    for (int64_t b = 0; b < num_tasks; b += chunk) {
        int64_t const e = b + chunk < num_tasks ? b + chunk : num_tasks;
        threads.emplace_back(worker, b, e);
    }
    for (auto& thread : threads) thread.join();
    return 0;
}

}  // extern "C"
