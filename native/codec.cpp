// Native sample codec for strugatzki_tpu.
//
// Role: the performance-critical inner loops of audio file I/O — PCM/float
// decode with deinterleave and encode with interleave — the part the
// reference delegates to libsndfile inside scsynth (SURVEY §2.2).  Exposed
// as a small C ABI consumed via ctypes (strugatzki_tpu/io/native.py); the
// NumPy implementation remains as a portable fallback.
//
// Layout conventions match the Python side: planar float32 [channels][frames]
// on the framework side, interleaved sample frames on the file side.  Loops
// run channel-major with a unit-stride planar row and a constant-stride
// interleaved pointer — no per-sample division — so compilers can vectorize.
//
// Build: `make -C native` (produces libstrugatzki_codec.so).

#include <cmath>
#include <cstdint>
#include <cstring>

namespace {

inline uint16_t bswap16(uint16_t v) { return __builtin_bswap16(v); }
inline uint32_t bswap32(uint32_t v) { return __builtin_bswap32(v); }
inline uint64_t bswap64(uint64_t v) { return __builtin_bswap64(v); }

constexpr float kInv16 = 1.0f / 32768.0f;
constexpr double kInv24 = 1.0 / 8388608.0;
constexpr double kInv32 = 1.0 / 2147483648.0;

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// decode: interleaved file bytes -> planar float32 [channels][frames]
// fmt codes: 2 = int16, 3 = int24, 4 = int32, 5 = float32, 6 = float64
// ---------------------------------------------------------------------------

int strug_decode(const uint8_t* raw, float* out, int64_t frames,
                 int32_t channels, int32_t fmt, int32_t big_endian) {
  switch (fmt) {
    case 2: {  // int16
      const int16_t* src = reinterpret_cast<const int16_t*>(raw);
      for (int32_t c = 0; c < channels; ++c) {
        float* dst = out + static_cast<int64_t>(c) * frames;
        const int16_t* s = src + c;
        for (int64_t f = 0; f < frames; ++f, s += channels) {
          int16_t v = *s;
          if (big_endian) v = static_cast<int16_t>(bswap16(static_cast<uint16_t>(v)));
          dst[f] = static_cast<float>(v) * kInv16;
        }
      }
      return 0;
    }
    case 3: {  // int24 (packed 3-byte)
      for (int32_t c = 0; c < channels; ++c) {
        float* dst = out + static_cast<int64_t>(c) * frames;
        const uint8_t* p = raw + static_cast<int64_t>(c) * 3;
        const int64_t stride = static_cast<int64_t>(channels) * 3;
        for (int64_t f = 0; f < frames; ++f, p += stride) {
          int32_t v = big_endian
              ? (static_cast<int32_t>(p[0]) << 16) | (p[1] << 8) | p[2]
              : (static_cast<int32_t>(p[2]) << 16) | (p[1] << 8) | p[0];
          if (v >= (1 << 23)) v -= (1 << 24);
          dst[f] = static_cast<float>(v * kInv24);
        }
      }
      return 0;
    }
    case 4: {  // int32
      const int32_t* src = reinterpret_cast<const int32_t*>(raw);
      for (int32_t c = 0; c < channels; ++c) {
        float* dst = out + static_cast<int64_t>(c) * frames;
        const int32_t* s = src + c;
        for (int64_t f = 0; f < frames; ++f, s += channels) {
          int32_t v = *s;
          if (big_endian) v = static_cast<int32_t>(bswap32(static_cast<uint32_t>(v)));
          dst[f] = static_cast<float>(v * kInv32);
        }
      }
      return 0;
    }
    case 5: {  // float32
      const uint32_t* src = reinterpret_cast<const uint32_t*>(raw);
      for (int32_t c = 0; c < channels; ++c) {
        float* dst = out + static_cast<int64_t>(c) * frames;
        const uint32_t* s = src + c;
        for (int64_t f = 0; f < frames; ++f, s += channels) {
          uint32_t bits = *s;
          if (big_endian) bits = bswap32(bits);
          float v;
          std::memcpy(&v, &bits, 4);
          dst[f] = v;
        }
      }
      return 0;
    }
    case 6: {  // float64
      const uint64_t* src = reinterpret_cast<const uint64_t*>(raw);
      for (int32_t c = 0; c < channels; ++c) {
        float* dst = out + static_cast<int64_t>(c) * frames;
        const uint64_t* s = src + c;
        for (int64_t f = 0; f < frames; ++f, s += channels) {
          uint64_t bits = *s;
          if (big_endian) bits = bswap64(bits);
          double v;
          std::memcpy(&v, &bits, 8);
          dst[f] = static_cast<float>(v);
        }
      }
      return 0;
    }
    default:
      return -1;
  }
}

// ---------------------------------------------------------------------------
// encode: planar float32 [channels][frames] -> interleaved file bytes
// ---------------------------------------------------------------------------

static inline int32_t clamp_round(double v, double lo, double hi) {
  double r = std::nearbyint(v);  // round-half-to-even, matching numpy round
  if (r < lo) r = lo;
  if (r > hi) r = hi;
  return static_cast<int32_t>(r);
}

int strug_encode(const float* in, uint8_t* raw, int64_t frames,
                 int32_t channels, int32_t fmt, int32_t big_endian) {
  switch (fmt) {
    case 2: {
      int16_t* dst = reinterpret_cast<int16_t*>(raw);
      for (int32_t c = 0; c < channels; ++c) {
        const float* src = in + static_cast<int64_t>(c) * frames;
        int16_t* d = dst + c;
        for (int64_t f = 0; f < frames; ++f, d += channels) {
          int16_t v = static_cast<int16_t>(clamp_round(
              static_cast<double>(src[f]) * 32768.0, -32768.0, 32767.0));
          if (big_endian) v = static_cast<int16_t>(bswap16(static_cast<uint16_t>(v)));
          *d = v;
        }
      }
      return 0;
    }
    case 3: {
      for (int32_t c = 0; c < channels; ++c) {
        const float* src = in + static_cast<int64_t>(c) * frames;
        uint8_t* p = raw + static_cast<int64_t>(c) * 3;
        const int64_t stride = static_cast<int64_t>(channels) * 3;
        for (int64_t f = 0; f < frames; ++f, p += stride) {
          int32_t v = clamp_round(static_cast<double>(src[f]) * 8388608.0,
                                  -8388608.0, 8388607.0);
          uint32_t u = static_cast<uint32_t>(v < 0 ? v + (1 << 24) : v);
          if (big_endian) {
            p[0] = (u >> 16) & 0xFF; p[1] = (u >> 8) & 0xFF; p[2] = u & 0xFF;
          } else {
            p[2] = (u >> 16) & 0xFF; p[1] = (u >> 8) & 0xFF; p[0] = u & 0xFF;
          }
        }
      }
      return 0;
    }
    case 4: {
      int32_t* dst = reinterpret_cast<int32_t*>(raw);
      for (int32_t c = 0; c < channels; ++c) {
        const float* src = in + static_cast<int64_t>(c) * frames;
        int32_t* d = dst + c;
        for (int64_t f = 0; f < frames; ++f, d += channels) {
          double r = std::nearbyint(static_cast<double>(src[f]) * 2147483648.0);
          if (r < -2147483648.0) r = -2147483648.0;
          if (r > 2147483647.0) r = 2147483647.0;
          int32_t v = static_cast<int32_t>(r);
          if (big_endian) v = static_cast<int32_t>(bswap32(static_cast<uint32_t>(v)));
          *d = v;
        }
      }
      return 0;
    }
    case 5: {
      uint32_t* dst = reinterpret_cast<uint32_t*>(raw);
      for (int32_t c = 0; c < channels; ++c) {
        const float* src = in + static_cast<int64_t>(c) * frames;
        uint32_t* d = dst + c;
        for (int64_t f = 0; f < frames; ++f, d += channels) {
          uint32_t bits;
          std::memcpy(&bits, &src[f], 4);
          if (big_endian) bits = bswap32(bits);
          *d = bits;
        }
      }
      return 0;
    }
    case 6: {
      uint64_t* dst = reinterpret_cast<uint64_t*>(raw);
      for (int32_t c = 0; c < channels; ++c) {
        const float* src = in + static_cast<int64_t>(c) * frames;
        uint64_t* d = dst + c;
        for (int64_t f = 0; f < frames; ++f, d += channels) {
          double v = static_cast<double>(src[f]);
          uint64_t bits;
          std::memcpy(&bits, &v, 8);
          if (big_endian) bits = bswap64(bits);
          *d = bits;
        }
      }
      return 0;
    }
    default:
      return -1;
  }
}

// NaN fixup with per-chunk state reset (NonRealtimeProcessor.scala:178-190
// semantics): planar [channels][frames], the carried last-value resets to 0
// at every `chunk` boundary.
int strug_fix_nans(float* data, int64_t frames, int32_t channels,
                   int64_t chunk) {
  if (chunk <= 0) return -1;
  for (int32_t c = 0; c < channels; ++c) {
    float* row = data + static_cast<int64_t>(c) * frames;
    for (int64_t start = 0; start < frames; start += chunk) {
      const int64_t stop = start + chunk < frames ? start + chunk : frames;
      float last = 0.0f;
      for (int64_t i = start; i < stop; ++i) {
        const float v = row[i];
        if (v != v) row[i] = last; else last = v;
      }
    }
  }
  return 0;
}

}  // extern "C"
