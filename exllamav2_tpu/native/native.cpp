// Native runtime helpers.
//
// TPU-native counterparts of the reference's CPU-side C++ components:
//   * partial string matching for stop/banned strings
//     (exllamav2_ext/cpp/generator.cpp:12-54 partial_strings_match)
//   * simulated-annealing bit allocation for the converter
//     (exllamav2_ext/ext_quant.cpp sim_anneal)
//   * multi-threaded bulk file reader for checkpoint loading
//     (exllamav2_ext/ext_stloader.cpp:11-60, 8 threads x 1 MiB blocks)
//
// Compiled lazily by exllamav2_tpu/native/__init__.py with g++ and bound
// via ctypes; every entry point has a pure-Python fallback.

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <cmath>
#include <random>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// String matching (UTF-32 code points, like the reference)
// ---------------------------------------------------------------------------

// Find the earliest full occurrence of any needle in haystack.
// Returns (match_pos << 32) | needle_idx, or -1 if none.
int64_t find_first_match(const uint32_t* hay, int64_t hay_len,
                         const uint32_t* needles, const int64_t* offsets,
                         int64_t num_needles)
{
    int64_t best_pos = -1, best_idx = -1;
    for (int64_t n = 0; n < num_needles; n++) {
        const uint32_t* nd = needles + offsets[n];
        int64_t nd_len = offsets[n + 1] - offsets[n];
        if (nd_len == 0 || nd_len > hay_len) continue;
        for (int64_t i = 0; i + nd_len <= hay_len; i++) {
            if (best_pos >= 0 && i >= best_pos) break;
            if (memcmp(hay + i, nd, nd_len * 4) == 0) {
                if (best_pos < 0 || i < best_pos) {
                    best_pos = i; best_idx = n;
                }
                break;
            }
        }
    }
    if (best_pos < 0) return -1;
    return (best_pos << 32) | best_idx;
}

// Longest k such that the haystack's suffix equals a prefix (length k) of
// some needle (the "held text" overlap, generator.cpp:38-52).
int64_t max_partial_overlap(const uint32_t* hay, int64_t hay_len,
                            const uint32_t* needles, const int64_t* offsets,
                            int64_t num_needles)
{
    int64_t best = 0;
    for (int64_t n = 0; n < num_needles; n++) {
        const uint32_t* nd = needles + offsets[n];
        int64_t nd_len = offsets[n + 1] - offsets[n];
        int64_t maxk = nd_len < hay_len ? nd_len : hay_len;
        for (int64_t k = maxk; k > best; k--) {
            if (memcmp(hay + hay_len - k, nd, k * 4) == 0) {
                best = k;
                break;
            }
        }
    }
    return best;
}

// ---------------------------------------------------------------------------
// Simulated annealing bit allocation (ext_quant.cpp sim_anneal analog)
// ---------------------------------------------------------------------------

void sim_anneal(int64_t num_slots, const int64_t* slot_offsets,
                const int64_t* costs, const float* errs,
                int64_t budget, int64_t iters, uint64_t seed,
                float temp_start, int64_t* choice /* in/out */)
{
    std::mt19937_64 rng(seed);
    std::uniform_real_distribution<double> uni(0.0, 1.0);

    int64_t cost = 0;
    for (int64_t i = 0; i < num_slots; i++)
        cost += costs[slot_offsets[i] + choice[i]];

    double temp = temp_start;
    for (int64_t it = 0; it < iters; it++) {
        temp *= 0.9997;
        int64_t i = (int64_t)(rng() % num_slots);
        int64_t opts = slot_offsets[i + 1] - slot_offsets[i];
        int64_t j = (int64_t)(rng() % opts);
        int64_t dc = costs[slot_offsets[i] + j]
                   - costs[slot_offsets[i] + choice[i]];
        double de = (double)errs[slot_offsets[i] + j]
                  - (double)errs[slot_offsets[i] + choice[i]];
        if (cost + dc > budget) continue;
        if (de <= 0.0 || uni(rng) < exp(-de / (temp > 1e-12 ? temp : 1e-12))) {
            choice[i] = j;
            cost += dc;
        }
    }

    // greedy top-up with leftover budget (optimize.py:149-158)
    bool improved = true;
    while (improved) {
        improved = false;
        double best_r = 0.0;
        int64_t bi = -1, bj = -1, bdc = 0;
        for (int64_t i = 0; i < num_slots; i++) {
            int64_t opts = slot_offsets[i + 1] - slot_offsets[i];
            for (int64_t j = 0; j < opts; j++) {
                int64_t dc = costs[slot_offsets[i] + j]
                           - costs[slot_offsets[i] + choice[i]];
                double de = (double)errs[slot_offsets[i] + j]
                          - (double)errs[slot_offsets[i] + choice[i]];
                if (dc > 0 && de < 0 && cost + dc <= budget) {
                    double r = -de / (double)dc;
                    if (r > best_r) { best_r = r; bi = i; bj = j; bdc = dc; }
                }
            }
        }
        if (bi >= 0) {
            choice[bi] = bj;
            cost += bdc;
            improved = true;
        }
    }
}

// ---------------------------------------------------------------------------
// Threaded bulk file read (ext_stloader.cpp analog)
// ---------------------------------------------------------------------------

int64_t read_file_threaded(const char* path, int64_t offset, int64_t size,
                           uint8_t* dest, int64_t num_threads)
{
    if (num_threads < 1) num_threads = 1;
    const int64_t BLOCK = 1 << 20;               // 1 MiB blocks
    std::vector<std::thread> threads;
    std::vector<int64_t> done(num_threads, 0);
    for (int64_t t = 0; t < num_threads; t++) {
        threads.emplace_back([=, &done]() {
            FILE* f = fopen(path, "rb");
            if (!f) return;
            for (int64_t blk = t * BLOCK; blk < size;
                 blk += num_threads * BLOCK) {
                int64_t n = size - blk < BLOCK ? size - blk : BLOCK;
                if (fseeko(f, offset + blk, SEEK_SET) != 0) break;
                if ((int64_t)fread(dest + blk, 1, (size_t)n, f) != n) break;
                done[t] += n;
            }
            fclose(f);
        });
    }
    int64_t total = 0;
    for (int64_t t = 0; t < num_threads; t++) {
        threads[t].join();
        total += done[t];
    }
    return total;
}

}  // extern "C"
