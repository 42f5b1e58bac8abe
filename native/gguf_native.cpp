// codec_tpu native runtime: GGUF tensor dequantization + dtype conversion.
//
// TPU-native counterpart of the reference's C++ loader hot path
// (reference behavior: src/codec.cpp:303-449 streams tensor bytes into
// backend buffers; ggml dequantizes quantized blocks on read). Here the
// Python GGUFReader parses headers and calls into this library to convert
// raw tensor bytes to float32 host buffers that are then transferred once
// to TPU HBM. Exposed through ctypes (no pybind11 dependency).
//
// Formats (bit-exact with codec_tpu/io/gguf.py and the reference spec):
//   Q8_0 : 34-byte blocks  {f16 d; int8 q[32]}            x = d*q
//   Q4_K : 144-byte blocks {f16 d,dmin; u8 sc[12]; u8 qs[128]}
//          x = d*sc6*q - dmin*m6 (8 sub-blocks of 32, packed 6-bit scales)
//   Q5_K : 176-byte blocks {f16 d,dmin; u8 sc[12]; u8 qh[32]; u8 ql[128]}
//
// Build: scripts/build_native.sh  (g++ -O3 -shared; OpenMP row parallelism)

#include <cstdint>
#include <cstring>
#include <cmath>

#if defined(_OPENMP)
#include <omp.h>
#endif

extern "C" {

static inline float f16_to_f32(uint16_t h) {
    const uint32_t sign = (uint32_t)(h & 0x8000u) << 16;
    const uint32_t exp  = (h >> 10) & 0x1Fu;
    const uint32_t man  = h & 0x3FFu;
    uint32_t bits;
    if (exp == 0) {
        if (man == 0) {
            bits = sign;
        } else {
            // subnormal: normalize
            int e = -1;
            uint32_t m = man;
            do { m <<= 1; ++e; } while (!(m & 0x400u));
            bits = sign | ((uint32_t)(127 - 15 - e) << 23) | ((m & 0x3FFu) << 13);
        }
    } else if (exp == 31) {
        bits = sign | 0x7F800000u | (man << 13);
    } else {
        bits = sign | ((exp + 112u) << 23) | (man << 13);
    }
    float f;
    std::memcpy(&f, &bits, sizeof f);
    return f;
}

void codec_native_f16_to_f32(const uint16_t * src, int64_t n, float * dst) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; ++i) {
        dst[i] = f16_to_f32(src[i]);
    }
}

void codec_native_bf16_to_f32(const uint16_t * src, int64_t n, float * dst) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; ++i) {
        const uint32_t bits = (uint32_t)src[i] << 16;
        std::memcpy(&dst[i], &bits, sizeof(float));
    }
}

void codec_native_dequant_q8_0(const uint8_t * src, int64_t n_elems, float * dst) {
    const int64_t n_blocks = n_elems / 32;
#pragma omp parallel for schedule(static)
    for (int64_t b = 0; b < n_blocks; ++b) {
        const uint8_t * p = src + b * 34;
        uint16_t dh;
        std::memcpy(&dh, p, 2);
        const float d = f16_to_f32(dh);
        const int8_t * q = (const int8_t *)(p + 2);
        float * o = dst + b * 32;
        for (int i = 0; i < 32; ++i) {
            o[i] = d * (float)q[i];
        }
    }
}

// Unpack the 12-byte 6-bit scale/min block (K-quants layout).
static inline void unpack_scale_min_k4(const uint8_t * sc, uint8_t * ls, uint8_t * lm) {
    for (int j = 0; j < 4; ++j) {
        ls[j] = sc[j] & 63;
        lm[j] = sc[j + 4] & 63;
    }
    for (int j = 4; j < 8; ++j) {
        ls[j] = (uint8_t)((sc[j + 4] & 0x0F) | ((sc[j - 4] >> 6) << 4));
        lm[j] = (uint8_t)((sc[j + 4] >> 4) | ((sc[j] >> 6) << 4));
    }
}

void codec_native_dequant_q4_k(const uint8_t * src, int64_t n_elems, float * dst) {
    const int64_t n_blocks = n_elems / 256;
#pragma omp parallel for schedule(static)
    for (int64_t b = 0; b < n_blocks; ++b) {
        const uint8_t * p = src + b * 144;
        uint16_t dh, mh;
        std::memcpy(&dh, p, 2);
        std::memcpy(&mh, p + 2, 2);
        const float d = f16_to_f32(dh);
        const float dmin = f16_to_f32(mh);
        uint8_t ls[8], lm[8];
        unpack_scale_min_k4(p + 4, ls, lm);
        const uint8_t * qs = p + 16;
        float * o = dst + b * 256;
        for (int g = 0; g < 4; ++g) {               // 4 groups of 64 elems
            const float s_lo = d * (float)ls[2 * g];
            const float m_lo = dmin * (float)lm[2 * g];
            const float s_hi = d * (float)ls[2 * g + 1];
            const float m_hi = dmin * (float)lm[2 * g + 1];
            const uint8_t * q = qs + g * 32;
            float * olo = o + g * 64;
            float * ohi = olo + 32;
            for (int i = 0; i < 32; ++i) {
                olo[i] = s_lo * (float)(q[i] & 0x0F) - m_lo;
                ohi[i] = s_hi * (float)(q[i] >> 4) - m_hi;
            }
        }
    }
}

void codec_native_dequant_q5_k(const uint8_t * src, int64_t n_elems, float * dst) {
    const int64_t n_blocks = n_elems / 256;
#pragma omp parallel for schedule(static)
    for (int64_t b = 0; b < n_blocks; ++b) {
        const uint8_t * p = src + b * 176;
        uint16_t dh, mh;
        std::memcpy(&dh, p, 2);
        std::memcpy(&mh, p + 2, 2);
        const float d = f16_to_f32(dh);
        const float dmin = f16_to_f32(mh);
        uint8_t ls[8], lm[8];
        unpack_scale_min_k4(p + 4, ls, lm);
        const uint8_t * qh = p + 16;
        const uint8_t * ql = p + 48;
        float * o = dst + b * 256;
        for (int g = 0; g < 4; ++g) {
            const uint8_t m1 = (uint8_t)(1u << (2 * g));
            const uint8_t m2 = (uint8_t)(1u << (2 * g + 1));
            const float s_lo = d * (float)ls[2 * g];
            const float mn_lo = dmin * (float)lm[2 * g];
            const float s_hi = d * (float)ls[2 * g + 1];
            const float mn_hi = dmin * (float)lm[2 * g + 1];
            const uint8_t * q = ql + g * 32;
            float * olo = o + g * 64;
            float * ohi = olo + 32;
            for (int i = 0; i < 32; ++i) {
                const int lo = (q[i] & 0x0F) + ((qh[i] & m1) ? 16 : 0);
                const int hi = (q[i] >> 4) + ((qh[i] & m2) ? 16 : 0);
                olo[i] = s_lo * (float)lo - mn_lo;
                ohi[i] = s_hi * (float)hi - mn_hi;
            }
        }
    }
}

int codec_native_version(void) { return 1; }

}  // extern "C"
