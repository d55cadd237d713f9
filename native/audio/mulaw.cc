// Host-side audio codecs for the serving scheduler's upload path.
//
// The scheduler uploads each tick's new audio as 8-bit G.711-style
// mu-law (see asr_streaming_tpu/models/serving.py).  numpy's vectorized
// encode (quantize + 64K-LUT fancy index) costs ~50 ms for a full
// 512-slot tick on this host; the scalar C++ LUT loop does the same
// work in ~6 ms, and the AVX-512 path below (clamp/convert in vector
// registers + vpgatherdd over the padded LUT) in ~2 ms.  The gather
// entry points additionally fan rows out over threads when the host has
// cores (serving rigs do — the dev VM's single CPU stays serial).
// Exactly matches the Python LUT path bit for bit: the table below is
// built with the identical formula, and the vector float pipeline
// (mul, clamp, truncating convert) mirrors the scalar one op for op.
//
// The *_gather_encode entry points additionally fuse the scheduler's
// per-stream gather: instead of Python copying every ready stream's
// new-segment audio into a staging matrix and then encoding the WHOLE
// matrix, the scheduler passes per-stream source pointers (numpy views,
// zero-copy) and each row is encoded straight from the stream's ring
// buffer into its staging-row slot.  Only ready rows are touched.
//
// Build: make -C native/audio   ->  libasrcodec.so (ctypes)

#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <functional>
#include <mutex>
#include <thread>
#include <vector>

#if defined(__AVX512F__) && defined(__AVX512BW__)
#include <immintrin.h>
#define ASR_CODEC_AVX512 1
#endif

namespace {

constexpr double kMu = 255.0;

struct MulawTable {
  // 3 bytes of tail padding so the AVX-512 path's dword gathers at
  // index 65535 stay inside the object.
  uint8_t lut[65536 + 4];
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
    lut[65536] = lut[65537] = lut[65538] = lut[65539] = 0;
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

inline int16_t pcm16_one(float x) {
  float scaled = x * 32767.0f;
  if (scaled > 32767.0f) scaled = 32767.0f;
  if (scaled < -32768.0f) scaled = -32768.0f;
  return (int16_t)scaled;
}

void mulaw_row(const float* x, uint8_t* out, int64_t n) {
  int64_t i = 0;
#ifdef ASR_CODEC_AVX512
  const __m512 kScale = _mm512_set1_ps(32767.0f);
  const __m512 kHi = _mm512_set1_ps(32767.0f);
  const __m512 kLo = _mm512_set1_ps(-32768.0f);
  const __m512i kMask16 = _mm512_set1_epi32(0xFFFF);
  const __m512i kMask8 = _mm512_set1_epi32(0xFF);
  for (; i + 16 <= n; i += 16) {
    __m512 v = _mm512_loadu_ps(x + i);
    v = _mm512_mul_ps(v, kScale);
    v = _mm512_min_ps(v, kHi);
    v = _mm512_max_ps(v, kLo);
    // truncation toward zero == the scalar (int16) cast
    __m512i q = _mm512_cvttps_epi32(v);
    __m512i idx = _mm512_and_si512(q, kMask16);   // (uint16_t) cast
    __m512i d = _mm512_i32gather_epi32(idx, (const int*)kTable.lut, 1);
    d = _mm512_and_si512(d, kMask8);
    _mm_storeu_si128((__m128i*)(out + i), _mm512_cvtepi32_epi8(d));
  }
#endif
  for (; i < n; ++i) out[i] = encode_one(x[i]);
}

void pcm16_row(const float* x, int16_t* out, int64_t n) {
  int64_t i = 0;
#ifdef ASR_CODEC_AVX512
  const __m512 kScale = _mm512_set1_ps(32767.0f);
  const __m512 kHi = _mm512_set1_ps(32767.0f);
  const __m512 kLo = _mm512_set1_ps(-32768.0f);
  for (; i + 16 <= n; i += 16) {
    __m512 v = _mm512_loadu_ps(x + i);
    v = _mm512_mul_ps(v, kScale);
    v = _mm512_min_ps(v, kHi);
    v = _mm512_max_ps(v, kLo);
    __m512i q = _mm512_cvttps_epi32(v);
    _mm256_storeu_si256((__m256i*)(out + i), _mm512_cvtepi32_epi16(q));
  }
#endif
  for (; i < n; ++i) out[i] = pcm16_one(x[i]);
}

// Row-parallel fan-out for the gather-encode calls: the encode is the
// scheduler's hot host stage (gather_upload, ~37% of the PCIe tick at
// 256 rows measured in r4), rows are independent, and serving hosts
// have cores to spare (the reference allots 12 CPUs per worker,
// docker-compose.yml:23-32).  Serial when the machine (or
// ASR_CODEC_THREADS) says 1 — thread spawn would only add overhead.
static int encode_threads(int64_t rows) {
  static int configured = [] {
    const char* e = std::getenv("ASR_CODEC_THREADS");
    if (e && *e) {
      int v = std::atoi(e);
      return v > 0 ? v : 1;
    }
    unsigned hc = std::thread::hardware_concurrency();
    int v = hc ? (int)hc : 1;
    return v > 8 ? 8 : v;   // 8 threads saturate DRAM write bandwidth
  }();
  int t = configured;
  if ((int64_t)t > rows / 16) t = (int)(rows / 16);  // >=16 rows/thread
  return t < 1 ? 1 : t;
}

// Persistent worker pool: the gather-encode runs on the scheduler's
// per-tick hot path, so per-call std::thread spawn+join (tens of µs per
// worker) would eat the very budget the threading buys back.  Workers
// park on a condition variable between ticks; the calling thread takes
// the first range itself.
class RowPool {
 public:
  explicit RowPool(int workers) : stop_(false), epoch_(0), pending_(0) {
    for (int i = 0; i < workers; ++i)
      threads_.emplace_back([this] { Loop(); });
  }

  // Run fn over [0, rows) split into `parts` contiguous ranges
  // (parts <= workers + 1); blocks until all ranges complete.
  void Run(const std::function<void(int64_t, int64_t)>& fn, int64_t rows,
           int parts) {
    int64_t chunk = (rows + parts - 1) / parts;
    {
      std::unique_lock<std::mutex> lk(m_);
      fn_ = &fn;
      rows_ = rows;
      chunk_ = chunk;
      next_ = 1;                 // range 0 is the caller's
      pending_ = 0;
      for (int p = 1; p < parts; ++p)
        if (p * chunk < rows) ++pending_;
      ++epoch_;
    }
    cv_.notify_all();
    fn(0, chunk < rows ? chunk : rows);
    std::unique_lock<std::mutex> lk(m_);
    done_cv_.wait(lk, [this] { return pending_ == 0; });
  }

 private:
  void Loop() {
    uint64_t seen = 0;
    for (;;) {
      std::unique_lock<std::mutex> lk(m_);
      cv_.wait(lk, [&] { return stop_ || epoch_ != seen; });
      if (stop_) return;
      seen = epoch_;
      for (;;) {
        int64_t lo = next_ * chunk_;
        if (lo >= rows_) break;
        ++next_;
        int64_t hi = lo + chunk_;
        if (hi > rows_) hi = rows_;
        const auto* fn = fn_;
        lk.unlock();
        (*fn)(lo, hi);
        lk.lock();
        if (--pending_ == 0) done_cv_.notify_all();
      }
    }
  }

  std::mutex m_;
  std::condition_variable cv_, done_cv_;
  std::vector<std::thread> threads_;
  const std::function<void(int64_t, int64_t)>* fn_ = nullptr;
  int64_t rows_ = 0, chunk_ = 0, next_ = 0;
  bool stop_;
  uint64_t epoch_;
  int pending_;
};

template <typename Fn>
static void parallel_rows(int64_t rows, Fn fn) {
  int nt = encode_threads(rows);
  if (nt <= 1) {
    fn(0, rows);
    return;
  }
  // process-lifetime pool (workers park between ticks; never destroyed —
  // leaked intentionally so no join-at-exit ordering issues with the
  // ctypes dlclose path)
  static RowPool* pool = new RowPool(encode_threads(1 << 30) - 1);
  std::function<void(int64_t, int64_t)> f = fn;
  pool->Run(f, rows, nt);
}


}  // namespace

extern "C" {

// float32 [-1,1] -> uint8 mu-law, n samples.
void asr_mulaw_encode(const float* x, uint8_t* out, int64_t n) {
  mulaw_row(x, out, n);
}

// float32 -> int16 PCM (the lossless upload path), n samples.
void asr_pcm16_encode(const float* x, int16_t* out, int64_t n) {
  pcm16_row(x, out, n);
}

// Fused gather + encode: row i reads `cols` float32 samples from
// srcs[i] (a stream's new-segment view) and writes the encoded bytes to
// out + slots[i]*out_stride (its slot's staging row).  Pointers arrive
// as uint64 because ctypes marshals numpy pointer arrays that way.
void asr_mulaw_gather_encode(const uint64_t* srcs, uint8_t* out,
                             const int32_t* slots, int64_t rows,
                             int64_t cols, int64_t out_stride) {
  parallel_rows(rows, [&](int64_t lo, int64_t hi) {
    for (int64_t r = lo; r < hi; ++r)
      mulaw_row((const float*)(uintptr_t)srcs[r],
                out + (int64_t)slots[r] * out_stride, cols);
  });
}

void asr_pcm16_gather_encode(const uint64_t* srcs, int16_t* out,
                             const int32_t* slots, int64_t rows,
                             int64_t cols, int64_t out_stride) {
  parallel_rows(rows, [&](int64_t lo, int64_t hi) {
    for (int64_t r = lo; r < hi; ++r)
      pcm16_row((const float*)(uintptr_t)srcs[r],
                out + (int64_t)slots[r] * out_stride, cols);
  });
}

}  // extern "C"
