// audioio: native host-side audio helpers.
//
// The reference accelerates its host hot loops with hand-written AVX2/NEON
// assembly (internal/runtime/tensor/dot_amd64.s etc.). On TPU the device
// compute path is XLA/Pallas; the remaining host-side hot loop in the serving
// path is PCM conversion of decoded audio blocks before they hit the HTTP
// socket. This file provides that as a small C++ kernel exposed over a plain
// C ABI (loaded with ctypes; no pybind11 dependency).
//
// Build: `make -C go_pocket_tts_tpu/native` (produces libaudioio.so).

#include <cstdint>
#include <cstddef>
#include <cmath>

extern "C" {

// Clamp float32 samples to [-1, 1] and convert to little-endian int16.
// dst must hold n int16 values. Returns n.
//
// Truncates toward zero (plain C cast) — NOT round-to-nearest — so the bytes
// are identical to the NumPy fallback (`utils/wav.py` astype) and the
// on-device conversion (`runtime/generate.py` jnp int16 convert): golden and
// parity sha256es must not depend on whether this library loads.
size_t pcm16_from_f32(const float* src, int16_t* dst, size_t n) {
    for (size_t i = 0; i < n; ++i) {
        float v = src[i];
        if (v > 1.0f) v = 1.0f;
        if (v < -1.0f) v = -1.0f;
        dst[i] = (int16_t)(v * 32767.0f);
    }
    return n;
}

// Peak-absolute value of a float32 buffer (used by peak normalization and
// the parity harness's peakAbs stat).
float peak_abs_f32(const float* src, size_t n) {
    float peak = 0.0f;
    for (size_t i = 0; i < n; ++i) {
        float v = src[i] < 0.0f ? -src[i] : src[i];
        if (v > peak) peak = v;
    }
    return peak;
}

// Direct-form-I biquad over float32 samples with float64 state — the
// sequential recursion behind the serving-path `--dc-block` flag
// (`internal/audio/dsp.go:12-78` uses algo-dsp's highpass; the coefficients
// are computed by the Python caller). One pass, n multiply-adds.
size_t biquad_df1_f32(const float* src, float* dst, size_t n,
                      double b0, double b1, double b2, double a1, double a2) {
    double x1 = 0.0, x2 = 0.0, y1 = 0.0, y2 = 0.0;
    for (size_t i = 0; i < n; ++i) {
        const double xi = (double)src[i];
        const double yi = b0 * xi + b1 * x1 + b2 * x2 - a1 * y1 - a2 * y2;
        x2 = x1; x1 = xi;
        y2 = y1; y1 = yi;
        dst[i] = (float)yi;
    }
    return n;
}

// Interleave/scale int16 → float32 (WAV decode hot path).
size_t f32_from_pcm16(const int16_t* src, float* dst, size_t n) {
    const float inv = 1.0f / 32768.0f;
    for (size_t i = 0; i < n; ++i) {
        dst[i] = (float)src[i] * inv;
    }
    return n;
}

}  // extern "C"

// CRC-16, polynomial 0x8005, MSB-first, init 0 — the FLAC frame footer CRC
// (`utils/flac.py`). The per-byte Python table loop was 53% of the whole
// FLAC encode; this is the same algorithm in C. Thread-safe table init via
// a C++ magic static.
namespace {
struct Crc16Table {
    uint16_t t[256];
    Crc16Table() {
        for (int i = 0; i < 256; ++i) {
            uint16_t c = (uint16_t)(i << 8);
            for (int b = 0; b < 8; ++b)
                c = (c & 0x8000) ? (uint16_t)((c << 1) ^ 0x8005)
                                 : (uint16_t)(c << 1);
            t[i] = c;
        }
    }
};
}  // namespace

extern "C" {

uint16_t crc16_8005(const uint8_t* data, size_t n) {
    static const Crc16Table table;
    uint16_t crc = 0;
    for (size_t i = 0; i < n; ++i)
        crc = (uint16_t)(table.t[((crc >> 8) ^ data[i]) & 0xFF]
                         ^ (uint16_t)(crc << 8));
    return crc;
}

}  // extern "C"
