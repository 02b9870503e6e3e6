// taskpack — native task-packing engine for deepsensornz_tpu.
//
// Host-side hot path of the TaskLoader: grouping station observation rows
// by timestamp and packing them into padded fixed-shape (B, N, ·) batches
// with validity masks. In the reference stack this role is played by the
// per-date pandas row selection + ragged Task assembly
// (nzdownscale/downscaler/train.py:560-637, validate_ERA.py:79 builds ~720
// tasks per month call); here it is a single C++ pass over flat arrays.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in the build image).
// Build: g++ -O3 -march=native -shared -fPIC taskpack.cpp -o libtaskpack.so

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// Deterministic splitmix64 for sampling seeds.
inline uint64_t splitmix64(uint64_t &state) {
    uint64_t z = (state += 0x9E3779B97F4A7C15ULL);
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
    z = (z ^ (z >> 27)) * 0x94D4A2C62D94ACDFULL;
    return z ^ (z >> 31);
}

}  // namespace

extern "C" {

// Group rows by requested dates and pack padded batches.
//
// rows:   times[n_rows] (int64, epoch seconds), x1/x2[n_rows] (f32),
//         values[n_rows * n_cols] (f32, row-major), finite-target filtering
//         is the caller's job.
// dates:  dates[n_dates] (int64, epoch seconds) — one output batch per date.
// mode:   0 = all rows of the date;
//         1 = fraction `frac` of rows (deterministic per-date seed);
//         2 = exactly `count` rows (min(count, available)).
// outputs (caller-allocated):
//         out_x[n_dates*capacity*2], out_y[n_dates*capacity*n_cols],
//         out_mask[n_dates*capacity], out_counts[n_dates].
// Pad coordinates are written as -1000 so RBF weights underflow to zero.
// Returns 0 on success, -1 if any date has more rows than `capacity`.
int pack_station_batches(
    const int64_t *times, const float *x1, const float *x2,
    const float *values, int64_t n_rows, int64_t n_cols,
    const int64_t *dates, int64_t n_dates,
    int64_t capacity, int mode, double frac, int64_t count, uint64_t seed,
    float *out_x, float *out_y, float *out_mask, int64_t *out_counts) {
    // bucket row indices by date via a sorted-date binary search
    std::vector<int64_t> order(n_dates);
    for (int64_t i = 0; i < n_dates; ++i) order[i] = i;
    std::vector<int64_t> sorted_dates(dates, dates + n_dates);
    // simple insertion-friendly sort of (date, original index)
    std::vector<std::pair<int64_t, int64_t>> di(n_dates);
    for (int64_t i = 0; i < n_dates; ++i) di[i] = {dates[i], i};
    std::sort(di.begin(), di.end());

    std::vector<std::vector<int64_t>> buckets(n_dates);
    for (int64_t r = 0; r < n_rows; ++r) {
        int64_t t = times[r];
        // binary search over sorted (date, idx); a date may appear multiple
        // times (duplicate requested timestamps) — fill every duplicate.
        auto lo = std::lower_bound(
            di.begin(), di.end(), std::make_pair(t, (int64_t)-1));
        for (auto it = lo; it != di.end() && it->first == t; ++it)
            buckets[it->second].push_back(r);
    }

    const float PAD_COORD = -1000.0f;
    for (int64_t d = 0; d < n_dates; ++d) {
        auto &rows = buckets[d];
        // sampling
        int64_t keep = (int64_t)rows.size();
        if (mode == 1) {
            keep = (int64_t)(frac * (double)rows.size() + 0.5);
            if (keep < 0) keep = 0;
            if (keep > (int64_t)rows.size()) keep = rows.size();
        } else if (mode == 2) {
            keep = count < (int64_t)rows.size() ? count : (int64_t)rows.size();
        }
        if (mode != 0 && keep < (int64_t)rows.size()) {
            // deterministic partial Fisher–Yates keyed on (seed, date)
            uint64_t st = seed ^ (uint64_t)dates[d] * 0x9E3779B97F4A7C15ULL;
            for (int64_t i = 0; i < keep; ++i) {
                int64_t j = i + (int64_t)(splitmix64(st) % (uint64_t)(rows.size() - i));
                std::swap(rows[i], rows[j]);
            }
        }
        if (keep > capacity) return -1;

        float *bx = out_x + d * capacity * 2;
        float *by = out_y + d * capacity * n_cols;
        float *bm = out_mask + d * capacity;
        for (int64_t i = 0; i < capacity; ++i) {
            if (i < keep) {
                int64_t r = rows[i];
                bx[i * 2 + 0] = x1[r];
                bx[i * 2 + 1] = x2[r];
                std::memcpy(by + i * n_cols, values + r * n_cols,
                            sizeof(float) * (size_t)n_cols);
                bm[i] = 1.0f;
            } else {
                bx[i * 2 + 0] = PAD_COORD;
                bx[i * 2 + 1] = PAD_COORD;
                std::memset(by + i * n_cols, 0, sizeof(float) * (size_t)n_cols);
                bm[i] = 0.0f;
            }
        }
        out_counts[d] = keep;
    }
    return 0;
}

// Bilinear interpolation of a regular grid at scattered points —
// the aux-at-targets gather (one call replaces a Python loop over
// channels × points). grid is (h, w) row-major; g1/g2 are the ASCENDING
// coordinate vectors. NaNs in the grid are treated as 0.
void interp_grid_points(
    const float *grid, int64_t h, int64_t w,
    const double *g1, const double *g2,
    const double *px1, const double *px2, int64_t n_pts,
    float *out) {
    auto locate = [](const double *g, int64_t n, double p, int64_t &i0, double &wgt) {
        int64_t lo = 0, hi = n - 1;
        if (p <= g[0]) { i0 = 0; wgt = 0.0; return; }
        if (p >= g[n - 1]) { i0 = n - 2; wgt = 1.0; return; }
        while (hi - lo > 1) {
            int64_t mid = (lo + hi) / 2;
            if (g[mid] <= p) lo = mid; else hi = mid;
        }
        i0 = lo;
        double span = g[lo + 1] - g[lo];
        wgt = span > 1e-300 ? (p - g[lo]) / span : 0.0;
    };
    for (int64_t i = 0; i < n_pts; ++i) {
        int64_t i1, i2;
        double w1, w2;
        locate(g1, h, px1[i], i1, w1);
        locate(g2, w, px2[i], i2, w2);
        auto at = [&](int64_t a, int64_t b) {
            float v = grid[a * w + b];
            return (v == v) ? (double)v : 0.0;  // NaN → 0
        };
        out[i] = (float)(
            at(i1, i2) * (1 - w1) * (1 - w2) +
            at(i1, i2 + 1) * (1 - w1) * w2 +
            at(i1 + 1, i2) * w1 * (1 - w2) +
            at(i1 + 1, i2 + 1) * w1 * w2);
    }
}

}  // extern "C"
