// Native runtime kernels for gesture2vec_tpu's host-side data path.
//
// The reference framework is pure Python (SURVEY.md section 2: zero
// native components), so these are new TPU-framework runtime pieces,
// not ports: the corpus-ingest hot loops that run on the host CPU while
// the TPU trains - BVH motion-block decoding and batched euler->rotmat
// conversion. Exposed as plain C symbols and bound with ctypes (no
// pybind11 dependency); gesture2vec_tpu/utils/native.py compiles this
// file on demand with g++ -O3 and falls back to numpy when unavailable.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

extern "C" {

// Parse whitespace-separated floats from text[0:len) into out.
// Returns the number parsed (stops at max_out).
int64_t g2v_parse_floats(const char* text, int64_t len, double* out,
                         int64_t max_out) {
    const char* p = text;
    const char* end = text + len;
    int64_t n = 0;
    while (p < end && n < max_out) {
        while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' ||
                           *p == '\r')) {
            ++p;
        }
        if (p >= end) break;
        char* next = nullptr;
        double v = strtod(p, &next);
        if (next == p) {  // unparseable token: skip it
            while (p < end && !(*p == ' ' || *p == '\t' || *p == '\n' ||
                                *p == '\r')) {
                ++p;
            }
            continue;
        }
        out[n++] = v;
        p = next;
    }
    return n;
}

// Batched intrinsic-ZXY euler (degrees) -> row-major 3x3 rotation
// matrices. euler: (n, 3) [z, x, y] per row; out: (n, 9).
void g2v_euler_zxy_to_rotmat(const double* euler_deg, int64_t n,
                             double* out) {
    const double d2r = 0.017453292519943295;
    for (int64_t i = 0; i < n; ++i) {
        const double az = euler_deg[3 * i + 0] * d2r;
        const double ax = euler_deg[3 * i + 1] * d2r;
        const double ay = euler_deg[3 * i + 2] * d2r;
        const double cz = cos(az), sz = sin(az);
        const double cx = cos(ax), sx = sin(ax);
        const double cy = cos(ay), sy = sin(ay);
        double* m = out + 9 * i;
        // R = Rz(az) @ Rx(ax) @ Ry(ay)
        m[0] = cz * cy - sz * sx * sy;
        m[1] = -sz * cx;
        m[2] = cz * sy + sz * sx * cy;
        m[3] = sz * cy + cz * sx * sy;
        m[4] = cz * cx;
        m[5] = sz * sy - cz * sx * cy;
        m[6] = -cx * sy;
        m[7] = sx;
        m[8] = cx * cy;
    }
}

// Sliding-window extraction: frames (T, D) -> windows (N, W, D) where
// N = (T - W) / stride + 1. Saves a Python-level copy loop at ingest.
int64_t g2v_extract_windows(const float* frames, int64_t T, int64_t D,
                            int64_t W, int64_t stride, float* out,
                            int64_t max_windows) {
    if (W > T || stride <= 0) return 0;
    int64_t n = (T - W) / stride + 1;
    if (n > max_windows) n = max_windows;
    for (int64_t k = 0; k < n; ++k) {
        memcpy(out + k * W * D, frames + k * stride * D,
               sizeof(float) * W * D);
    }
    return n;
}

}  // extern "C"

#include <charconv>

extern "C" {

// Format a (rows, cols) float64 matrix as BVH motion text: each row is
// "%.6f"-formatted values space-separated, newline-terminated - the
// exporter's hot loop (a 30-minute clip is ~2.5M Python format calls
// otherwise). Uses std::to_chars (locale-free, correctly rounded fixed
// notation, identical output to printf/%-formatting). Returns bytes
// written, or -1 if cap would overflow.
int64_t g2v_format_motion(const double* vals, int64_t rows, int64_t cols,
                          char* out, int64_t cap) {
    char* p = out;
    char* end = out + cap;
    for (int64_t r = 0; r < rows; ++r) {
        for (int64_t c = 0; c < cols; ++c) {
            if (end - p < 32) return -1;
            if (c) *p++ = ' ';
            auto res = std::to_chars(p, end, vals[r * cols + c],
                                     std::chars_format::fixed, 6);
            if (res.ec != std::errc()) return -1;
            p = res.ptr;
        }
        if (p >= end) return -1;
        *p++ = '\n';
    }
    return p - out;
}

}  // extern "C"
