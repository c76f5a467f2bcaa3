// Native host-side image preprocessing kernels.
//
// The reference gets its host preprocessing speed from OpenCV's C++
// (data/preprocessing/resize.py:148); this library plays that role for
// the TPU framework's host data path: nearest/bilinear resize and RGB
// normalization over HWC numpy buffers, multithreaded over rows.
// Exposed via ctypes (nicr_mtsa_tpu/native/__init__.py); the numpy
// implementations remain as the portable fallback and the golden
// reference in tests.
//
// Semantics contract (must match data/preprocessing/resize.py):
//   nearest:  src_index = floor(dst_index * src / dst)   (cv2.INTER_NEAREST)
//   bilinear: half-pixel centers, edge clamp              (cv2.INTER_LINEAR)

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>
#include <thread>
#include <vector>

namespace {

int hardware_threads() {
    unsigned n = std::thread::hardware_concurrency();
    return n ? static_cast<int>(n) : 1;
}

template <typename F>
void parallel_rows(int n_rows, F&& fn) {
    int n_threads = std::min(hardware_threads(), n_rows);
    if (n_threads <= 1) {
        fn(0, n_rows);
        return;
    }
    std::vector<std::thread> threads;
    int chunk = (n_rows + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; ++t) {
        int lo = t * chunk;
        int hi = std::min(n_rows, lo + chunk);
        if (lo >= hi) break;
        threads.emplace_back([lo, hi, &fn] { fn(lo, hi); });
    }
    for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// Nearest resize for arbitrary element size (exact for any dtype --
// labels, ids, bool): HWC row-major.
void nearest_resize(const uint8_t* src, uint8_t* dst,
                    int h_in, int w_in, int h_out, int w_out,
                    int channels, int elem_size) {
    const int px = channels * elem_size;
    std::vector<int> xi(w_out);
    for (int x = 0; x < w_out; ++x) {
        int sx = static_cast<int>((static_cast<int64_t>(x) * w_in) / w_out);
        xi[x] = std::min(sx, w_in - 1) * px;
    }
    parallel_rows(h_out, [&](int lo, int hi) {
        for (int y = lo; y < hi; ++y) {
            int sy = static_cast<int>(
                (static_cast<int64_t>(y) * h_in) / h_out);
            sy = std::min(sy, h_in - 1);
            const uint8_t* srow = src + static_cast<int64_t>(sy) * w_in * px;
            uint8_t* drow = dst + static_cast<int64_t>(y) * w_out * px;
            for (int x = 0; x < w_out; ++x) {
                std::memcpy(drow + static_cast<int64_t>(x) * px,
                            srow + xi[x], px);
            }
        }
    });
}

// Bilinear resize for uint8 HWC images (half-pixel centers, edge
// clamp); output rounded to nearest.
void bilinear_resize_u8(const uint8_t* src, uint8_t* dst,
                        int h_in, int w_in, int h_out, int w_out,
                        int channels) {
    std::vector<int> x0(w_out), x1(w_out);
    std::vector<float> fx(w_out);
    for (int x = 0; x < w_out; ++x) {
        float c = (x + 0.5f) * (static_cast<float>(w_in) / w_out) - 0.5f;
        int c0 = static_cast<int>(std::floor(c));
        fx[x] = c - c0;
        x0[x] = std::clamp(c0, 0, w_in - 1);
        x1[x] = std::clamp(c0 + 1, 0, w_in - 1);
    }
    parallel_rows(h_out, [&](int lo, int hi) {
        for (int y = lo; y < hi; ++y) {
            float cy = (y + 0.5f) * (static_cast<float>(h_in) / h_out)
                       - 0.5f;
            int y0 = static_cast<int>(std::floor(cy));
            float fy = cy - y0;
            int y0c = std::clamp(y0, 0, h_in - 1);
            int y1c = std::clamp(y0 + 1, 0, h_in - 1);
            const uint8_t* r0 =
                src + static_cast<int64_t>(y0c) * w_in * channels;
            const uint8_t* r1 =
                src + static_cast<int64_t>(y1c) * w_in * channels;
            uint8_t* drow =
                dst + static_cast<int64_t>(y) * w_out * channels;
            for (int x = 0; x < w_out; ++x) {
                const int a = x0[x] * channels, b = x1[x] * channels;
                const float wx = fx[x];
                for (int c = 0; c < channels; ++c) {
                    float top = r0[a + c] * (1.f - wx) + r0[b + c] * wx;
                    float bot = r1[a + c] * (1.f - wx) + r1[b + c] * wx;
                    float v = top * (1.f - fy) + bot * fy;
                    drow[x * channels + c] =
                        static_cast<uint8_t>(std::lround(
                            std::clamp(v, 0.f, 255.f)));
                }
            }
        }
    });
}

// Additive jitter in uint8 HSV space over an RGB image: hue wraps
// modulo 180, saturation/value clip to [0, 255]. Pixelwise twin of
// data/preprocessing/augmentation.py adjust_hsv (OpenCV uint8 HSV
// convention, H in [0, 180)); rounding is round-half-even (std::rint
// under the default FE_TONEAREST) to match numpy's np.round exactly.
void hsv_jitter_u8(const uint8_t* src, uint8_t* dst, int64_t n_pixels,
                   int h_offset, int s_offset, int v_offset) {
    const int n_threads = static_cast<int>(
        std::min<int64_t>(hardware_threads(), n_pixels));
    auto work = [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; ++i) {
            const uint8_t* p = src + i * 3;
            uint8_t* q = dst + i * 3;
            const int r = p[0], g = p[1], b = p[2];

            // --- rgb -> uint8 hsv (rgb_to_hsv_uint8) ---
            const int v = std::max(r, std::max(g, b));
            const int mn = std::min(r, std::min(g, b));
            const int diff = v - mn;
            const int s =
                v == 0 ? 0 : (255 * diff + v / 2) / std::max(v, 1);
            int h_half;
            if (diff == 0) {
                h_half = 0;
            } else {
                const double ds = diff;  // diff >= 1 here
                double hdeg;
                if (v == r) {
                    hdeg = (60.0 * (g - b)) / ds;
                } else if (v == g) {
                    hdeg = 120.0 + (60.0 * (b - r)) / ds;
                } else {
                    hdeg = 240.0 + (60.0 * (r - g)) / ds;
                }
                if (hdeg < 0.0) hdeg += 360.0;
                h_half = static_cast<int>(std::rint(hdeg / 2.0)) % 180;
            }

            // --- jitter (adjust_hsv) ---
            int hj = (h_half + h_offset) % 180;
            if (hj < 0) hj += 180;
            const int sj = std::clamp(s + s_offset, 0, 255);
            const int vj = std::clamp(v + v_offset, 0, 255);

            // --- uint8 hsv -> rgb (hsv_to_rgb_uint8) ---
            const double hd = hj * 2.0;
            const double sd = sj / 255.0;
            const double vd = vj / 255.0;
            const double c = vd * sd;
            const double hp = hd / 60.0;
            const double x = c * (1.0 - std::fabs(std::fmod(hp, 2.0)
                                                  - 1.0));
            const double m = vd - c;
            const int hi6 = static_cast<int>(std::floor(hp)) % 6;
            double rr, gg, bb;
            switch (hi6) {
                case 0: rr = c; gg = x; bb = 0; break;
                case 1: rr = x; gg = c; bb = 0; break;
                case 2: rr = 0; gg = c; bb = x; break;
                case 3: rr = 0; gg = x; bb = c; break;
                case 4: rr = x; gg = 0; bb = c; break;
                default: rr = c; gg = 0; bb = x; break;
            }
            q[0] = static_cast<uint8_t>(std::clamp(
                std::rint((rr + m) * 255.0), 0.0, 255.0));
            q[1] = static_cast<uint8_t>(std::clamp(
                std::rint((gg + m) * 255.0), 0.0, 255.0));
            q[2] = static_cast<uint8_t>(std::clamp(
                std::rint((bb + m) * 255.0), 0.0, 255.0));
        }
    };
    if (n_threads <= 1) {
        work(0, n_pixels);
        return;
    }
    std::vector<std::thread> threads;
    const int64_t chunk = (n_pixels + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; ++t) {
        const int64_t lo = t * chunk;
        const int64_t hi = std::min<int64_t>(n_pixels, lo + chunk);
        if (lo >= hi) break;
        threads.emplace_back([lo, hi, &work] { work(lo, hi); });
    }
    for (auto& th : threads) th.join();
}

// uint8 HWC rgb -> float32 normalized: (x - mean[c]) / std[c].
void normalize_u8_to_f32(const uint8_t* src, float* dst,
                         int n_pixels, int channels,
                         const float* mean, const float* stddev) {
    std::vector<float> inv(channels);
    for (int c = 0; c < channels; ++c) inv[c] = 1.f / stddev[c];
    parallel_rows(n_pixels, [&](int lo, int hi) {
        for (int i = lo; i < hi; ++i) {
            const uint8_t* s = src + static_cast<int64_t>(i) * channels;
            float* d = dst + static_cast<int64_t>(i) * channels;
            for (int c = 0; c < channels; ++c)
                d[c] = (s[c] - mean[c]) * inv[c];
        }
    });
}

}  // extern "C"
