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

}  // namespace

extern "C" {

int floxer_myers_distance_batch(
    const uint8_t* window_buffer, const int64_t* window_offsets,
    const int64_t* window_lengths,
    const uint8_t* pattern_buffer, const int64_t* pattern_offsets,
    const int64_t* pattern_lengths,
    int64_t num_tasks,
    int64_t* out_distance, int64_t* out_end,
    int64_t num_threads) {
    if (num_tasks <= 0) return 0;
    if (num_threads < 1) num_threads = 1;
    if (num_threads > num_tasks) num_threads = num_tasks;

    auto worker = [&](int64_t begin, int64_t end) {
        std::vector<uint64_t> eq_scratch;
        for (int64_t t = begin; t < end; t++) {
            one_task(
                window_buffer + window_offsets[t], window_lengths[t],
                pattern_buffer + pattern_offsets[t], pattern_lengths[t],
                out_distance + t, out_end + t, eq_scratch);
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
