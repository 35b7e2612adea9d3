// Verified-interval cache scan over walk arrays.
//
// Native mirror of floxer_tpu.intervals.VerifiedIntervals +
// verify_batch._simulate_key / _scan's cache decisions (themselves the
// behavioral port of the reference's verified_intervals usage,
// src/lib/verification.cpp:119-136 and src/lib/intervals.cpp:84-127):
// per (query, orientation, reference) segment, walks are visited in anchor
// order; a walk whose trimmed root interval is contained in a single
// stored interval is "avoided"; otherwise its (untrimmed) root interval is
// inserted according to the walk's state. Runs the 91k-walk-per-chunk
// simulation in one call instead of a Python loop per walk.
//
// states: 0 = uncomputed (optimistic: report as needed + insert)
//         1 = pending-ok (cheap checks passed: insert, not re-reported)
//         2 = computed, all pre-root levels exist (insert)
//         3 = computed, broken before the root (no insert)
// out_flags: 0 = avoided (cache hit), 1 = needed, 2 = passed through
//
// Build: compiled into libfloxer_native.so (Makefile NATIVE_SRCS).

#include <algorithm>
#include <cstdint>
#include <vector>

namespace {

struct Cache {
    std::vector<int64_t> starts;  // sorted
    std::vector<int64_t> ends;    // parallel
    std::vector<int64_t> pmax;    // prefix max of ends
    bool dirty = false;

    void refresh() {
        if (!dirty && pmax.size() == starts.size()) return;
        pmax.resize(starts.size());
        int64_t running = INT64_MIN;
        for (size_t i = 0; i < starts.size(); i++) {
            running = ends[i] > running ? ends[i] : running;
            pmax[i] = running;
        }
        dirty = false;
    }

    bool contains(int64_t lo, int64_t hi) {
        if (starts.empty()) return false;
        refresh();
        auto it = std::upper_bound(starts.begin(), starts.end(), lo);
        if (it == starts.begin()) return false;
        return pmax[static_cast<size_t>(it - starts.begin()) - 1] >= hi;
    }

    void insert(int64_t lo, int64_t hi) {
        if (contains(lo, hi)) return;
        auto const pos =
            std::upper_bound(starts.begin(), starts.end(), lo) -
            starts.begin();
        starts.insert(starts.begin() + pos, lo);
        ends.insert(ends.begin() + pos, hi);
        dirty = true;
    }
};

}  // namespace

extern "C" {

// Returns the number of "needed" walks (flag 1), or -1 on bad input.
int64_t floxer_cache_scan(
    const int64_t* seg_begin, const int64_t* seg_end, int64_t num_segs,
    const int64_t* sorted_ids,
    const int64_t* trim_lo, const int64_t* trim_hi,
    const int64_t* ins_lo, const int64_t* ins_hi,
    const uint8_t* state, int64_t enabled, uint8_t* out_flags) {
    int64_t need = 0;
    for (int64_t s = 0; s < num_segs; s++) {
        Cache cache;
        for (int64_t k = seg_begin[s]; k < seg_end[s]; k++) {
            int64_t const w = sorted_ids[k];
            if (enabled && cache.contains(trim_lo[w], trim_hi[w])) {
                out_flags[w] = 0;
                continue;
            }
            uint8_t const st = state[w];
            if (st == 0) {
                out_flags[w] = 1;
                need++;
                if (enabled) cache.insert(ins_lo[w], ins_hi[w]);
            } else if (st == 1 || st == 2) {
                out_flags[w] = 2;
                if (enabled) cache.insert(ins_lo[w], ins_hi[w]);
            } else if (st == 3) {
                out_flags[w] = 2;
            } else {
                return -1;
            }
        }
    }
    return need;
}

}  // extern "C"
