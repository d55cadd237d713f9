// Host-side audio codecs for the serving scheduler's upload path.
//
// The scheduler uploads each tick's new audio as 8-bit G.711-style
// mu-law (see asr_streaming_tpu/models/serving.py).  numpy's vectorized
// encode (quantize + 64K-LUT fancy index) costs ~50 ms for a full
// 512-slot tick on this host; this single-pass C++ loop does the same
// work in a few ms.  Exactly matches the Python LUT path bit for bit:
// the table below is built with the identical formula.
//
// Build: make -C native/audio   ->  libasrcodec.so (ctypes)

#include <cmath>
#include <cstdint>
#include <cstring>

namespace {

constexpr double kMu = 255.0;

struct MulawTable {
  uint8_t lut[65536];
  MulawTable() {
    for (int i = 0; i < 65536; ++i) {
      int16_t s = (int16_t)(uint16_t)i;
      double v = (double)s / 32767.0;
      if (v > 1.0) v = 1.0;
      if (v < -1.0) v = -1.0;
      double y = (v >= 0 ? 1.0 : -1.0) *
                 std::log1p(kMu * std::fabs(v)) / std::log1p(kMu);
      // np.round is round-half-to-even; nearbyint matches under the
      // default FP rounding mode (lround would round half away)
      lut[i] = (uint8_t)std::nearbyint((y + 1.0) * 127.5);
    }
  }
};

const MulawTable kTable;

inline uint8_t encode_one(float x) {
  float scaled = x * 32767.0f;
  if (scaled > 32767.0f) scaled = 32767.0f;
  if (scaled < -32768.0f) scaled = -32768.0f;
  int16_t q = (int16_t)scaled;   // trunc toward zero, like np .astype
  return kTable.lut[(uint16_t)q];
}

}  // namespace

extern "C" {

// float32 [-1,1] -> uint8 mu-law, n samples.
void asr_mulaw_encode(const float* x, uint8_t* out, int64_t n) {
  for (int64_t i = 0; i < n; ++i) out[i] = encode_one(x[i]);
}

// float32 -> int16 PCM (the lossless upload path), n samples.
void asr_pcm16_encode(const float* x, int16_t* out, int64_t n) {
  for (int64_t i = 0; i < n; ++i) {
    float scaled = x[i] * 32767.0f;
    if (scaled > 32767.0f) scaled = 32767.0f;
    if (scaled < -32768.0f) scaled = -32768.0f;
    out[i] = (int16_t)scaled;
  }
}

}  // extern "C"
