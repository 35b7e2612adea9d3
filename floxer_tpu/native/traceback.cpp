// Banded CIGAR traceback from a device-reported (end column, distance).
//
// Native port of floxer_tpu.ops.dp_reference.banded_cigar_traceback: the
// band |j - i - (end_col - m)| <= distance around the optimal path's
// diagonal is recomputed with the same semi-global recurrence and the same
// tie preference (insertion, then diagonal, then deletion), so the emitted
// op sequence is byte-identical to the Python oracle. Used for accepted
// PEX roots only (verification.cpp:206-213) — one call per reported
// alignment.

#include <cstddef>
#include <cstdint>
#include <limits>
#include <vector>

namespace {
constexpr int32_t BIG = 1 << 28;

// op codes: 0 '=', 1 'X', 2 'I' (consumes query), 3 'D' (consumes reference)
// trace codes: 0 diagonal, 1 up, 2 left
}  // namespace

extern "C" {

int floxer_banded_traceback(const uint8_t* ref, int64_t n, const uint8_t* query,
                            int64_t m, int64_t end_col, int64_t distance,
                            int64_t* out_begin, uint8_t* out_ops,
                            int64_t max_ops, int64_t* out_num_ops) {
    int64_t const half = distance < 0 ? 0 : distance;
    int64_t const width = 2 * half + 1;
    int64_t const center = end_col - m;

    // dp over two rolling rows; full trace matrix for the walk-back
    std::vector<int32_t> prev(width, BIG), curr(width, BIG);
    std::vector<uint8_t> trace;
    trace.resize(static_cast<size_t>(m) * width);

    auto col_of = [&](int64_t i, int64_t d) { return i + center - half + d; };

    for (int64_t d = 0; d < width; d++) {
        int64_t const j = col_of(0, d);
        prev[d] = (j >= 0 && j <= n) ? 0 : BIG;  // free leading ref gaps
    }

    for (int64_t i = 1; i <= m; i++) {
        uint8_t* trace_row = trace.data() + static_cast<size_t>(i - 1) * width;
        int32_t left_val = BIG;  // dp[i][j-1] within this row
        for (int64_t d = 0; d < width; d++) {
            int64_t const j = col_of(i, d);
            if (j < 0 || j > n) {
                curr[d] = BIG;
                trace_row[d] = 0;
                left_val = BIG;
                continue;
            }
            // vertical: dp[i-1][j] = prev[d+1]
            int32_t const up = (d + 1 < width ? prev[d + 1] : BIG) + 1;
            // diagonal: dp[i-1][j-1] = prev[d]
            int32_t diag = BIG;
            if (j >= 1 && prev[d] < BIG) {
                diag = prev[d] + (ref[j - 1] != query[i - 1] ? 1 : 0);
            }
            int32_t const left = (j >= 1 ? left_val : BIG) + 1;
            // preference on ties: up (insertion), diagonal, left (deletion)
            int32_t best;
            uint8_t move;
            if (up <= diag && up <= left) {
                best = up;
                move = 1;
            } else if (diag <= left) {
                best = diag;
                move = 0;
            } else {
                best = left;
                move = 2;
            }
            curr[d] = best >= BIG ? BIG : best;
            trace_row[d] = move;
            left_val = curr[d];
        }
        std::swap(prev, curr);
    }

    // walk back from (m, end_col)
    {
        int64_t const d_end = end_col - col_of(m, 0);
        if (d_end < 0 || d_end >= width || prev[d_end] != distance) return 1;
    }

    int64_t i = m;
    int64_t j = end_col;
    int64_t num_ops = 0;
    std::vector<uint8_t> reversed_ops;
    reversed_ops.reserve(m + half + 1);
    while (i > 0) {
        int64_t const d = j - col_of(i, 0);
        if (d < 0 || d >= width) return 2;
        uint8_t const move = trace[static_cast<size_t>(i - 1) * width + d];
        if (move == 1) {
            reversed_ops.push_back(2);  // I
            i -= 1;
        } else if (move == 0) {
            reversed_ops.push_back(ref[j - 1] == query[i - 1] ? 0 : 1);
            i -= 1;
            j -= 1;
        } else {
            reversed_ops.push_back(3);  // D
            j -= 1;
        }
    }

    num_ops = static_cast<int64_t>(reversed_ops.size());
    if (num_ops > max_ops) return 3;
    for (int64_t k = 0; k < num_ops; k++)
        out_ops[k] = reversed_ops[num_ops - 1 - k];
    *out_begin = j;
    *out_num_ops = num_ops;
    return 0;
}

}  // extern "C"
