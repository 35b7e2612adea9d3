// SA-IS suffix array construction (Nong, Zhang, Chan 2009).
//
// Native replacement for the index-build hot path: the reference delegates
// suffix-array construction to fmindex-collection's C++ build
// (src/main/floxer.cpp:92-97); here it backs floxer_tpu.index.fmindex, which
// falls back to numpy prefix doubling when this library is unavailable.
//
// The input text is remapped to 1..256 with a unique appended 0 sentinel, so
// multi-sequence concatenations with internal rank-0 separators are handled.
// Index type is templated: int32 for texts under 2^31 (half the memory),
// int64 beyond.
//
// Build: g++ -O3 -march=native -shared -fPIC sais.cpp -o libsais.so

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

template <typename I>
void get_buckets(const I* T, I n, I K, std::vector<I>& bkt, bool end) {
    std::fill(bkt.begin(), bkt.end(), I(0));
    for (I i = 0; i < n; i++) bkt[T[i]]++;
    I sum = 0;
    for (I c = 0; c <= K; c++) {
        sum += bkt[c];
        bkt[c] = end ? sum : sum - bkt[c];
    }
}

template <typename I>
void induce_l(const I* T, I* SA, I n, I K, const std::vector<bool>& stype,
              std::vector<I>& bkt) {
    get_buckets(T, n, K, bkt, false);
    for (I i = 0; i < n; i++) {
        I j = SA[i] - 1;
        if (SA[i] > 0 && !stype[j]) SA[bkt[T[j]]++] = j;
    }
}

template <typename I>
void induce_s(const I* T, I* SA, I n, I K, const std::vector<bool>& stype,
              std::vector<I>& bkt) {
    get_buckets(T, n, K, bkt, true);
    for (I i = n - 1; i >= 0; i--) {
        I j = SA[i] - 1;
        if (SA[i] > 0 && stype[j]) SA[--bkt[T[j]]] = j;
    }
}

// T[n-1] must be the unique smallest character (sentinel).
template <typename I>
void sais(const I* T, I* SA, I n, I K) {
    std::vector<bool> stype(n);
    stype[n - 1] = true;
    for (I i = n - 2; i >= 0; i--)
        stype[i] = T[i] < T[i + 1] || (T[i] == T[i + 1] && stype[i + 1]);

    auto is_lms = [&](I i) { return i > 0 && stype[i] && !stype[i - 1]; };

    std::vector<I> bkt(K + 1);

    // stage 1: approximately sort LMS suffixes by induced sorting
    std::fill(SA, SA + n, I(-1));
    get_buckets(T, n, K, bkt, true);
    for (I i = 1; i < n; i++)
        if (is_lms(i)) SA[--bkt[T[i]]] = i;
    induce_l(T, SA, n, K, stype, bkt);
    induce_s(T, SA, n, K, stype, bkt);

    // compact the sorted LMS substrings into the front of SA
    I n1 = 0;
    for (I i = 0; i < n; i++)
        if (SA[i] > 0 && is_lms(SA[i])) SA[n1++] = SA[i];
    // the sentinel suffix (position n-1) is LMS and sorts first
    // note: is_lms(n-1) is true because T[n-1] is the unique smallest

    // name the LMS substrings in SA[n1..n)
    std::fill(SA + n1, SA + n, I(-1));
    I name = 0;
    I prev = -1;
    for (I i = 0; i < n1; i++) {
        I pos = SA[i];
        bool diff = false;
        if (prev == -1) {
            diff = true;
        } else {
            for (I d = 0;; d++) {
                if (T[pos + d] != T[prev + d] ||
                    stype[pos + d] != stype[prev + d]) {
                    diff = true;
                    break;
                }
                if (d > 0 && (is_lms(pos + d) || is_lms(prev + d))) {
                    // both reached the next LMS with equal content
                    diff = !(is_lms(pos + d) && is_lms(prev + d));
                    break;
                }
            }
        }
        if (diff) {
            name++;
            prev = pos;
        }
        SA[n1 + pos / 2] = name - 1;
    }
    for (I i = n - 1, j = n - 1; i >= n1; i--)
        if (SA[i] >= 0) SA[j--] = SA[i];

    // stage 2: sort the reduced problem
    I* SA1 = SA;
    I* T1 = SA + n - n1;
    if (name < n1) {
        sais<I>(T1, SA1, n1, name - 1);
    } else {
        for (I i = 0; i < n1; i++) SA1[T1[i]] = i;
    }

    // stage 3: induce the full SA from the sorted LMS suffixes
    std::vector<I> lms_positions;
    lms_positions.reserve(n1);
    for (I i = 1; i < n; i++)
        if (is_lms(i)) lms_positions.push_back(i);
    for (I i = 0; i < n1; i++) SA1[i] = lms_positions[SA1[i]];

    std::fill(SA + n1, SA + n, I(-1));
    get_buckets(T, n, K, bkt, true);
    for (I i = n1 - 1; i >= 0; i--) {
        I j = SA[i];
        SA[i] = -1;
        SA[--bkt[T[j]]] = j;
    }
    induce_l(T, SA, n, K, stype, bkt);
    induce_s(T, SA, n, K, stype, bkt);
}

template <typename I>
int build(const uint8_t* text, int64_t n, int64_t* sa_out) {
    std::vector<I> T(n + 1);
    for (int64_t i = 0; i < n; i++) T[i] = I(text[i]) + 1;
    T[n] = 0;
    std::vector<I> SA(n + 1);
    sais<I>(T.data(), SA.data(), I(n + 1), I(256));
    for (int64_t i = 0; i < n; i++) sa_out[i] = SA[i + 1];
    return 0;
}

}  // namespace

extern "C" {

int floxer_build_suffix_array(const uint8_t* text, int64_t n, int64_t* sa_out) {
    if (n <= 0) return 0;
    if (n + 1 < (int64_t(1) << 31)) {
        return build<int32_t>(text, n, sa_out);
    }
    return build<int64_t>(text, n, sa_out);
}

}  // extern "C"
