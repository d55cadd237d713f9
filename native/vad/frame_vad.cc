// Frame-based voice activity detector (C++).
//
// Native host-side first-stage gate replacing the reference's webrtcvad C
// extension (reference: streaming_decoder/stream.py:54-55, 166-188 —
// 10/20/30 ms frames, aggressiveness 0-3, is_speech(frame, rate)).  Not a
// port of WebRTC's GMM tables: a subband energy detector with
// minimum-statistics noise tracking, SNR-weighted voting across six bands
// (80-4000 Hz), and hangover smoothing — same role, same API shape.
//
// Build: make -C native/vad -> libframevad.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int kNumBands = 6;
// Band edges in Hz (speech-relevant, mirrors the classic 80-4000 split).
constexpr double kBandEdges[kNumBands + 1] = {80,  250,  500, 1000,
                                              2000, 3000, 4000};

struct Vad {
  int aggressiveness = 2;
  // running noise floor per band (minimum statistics with slow rise)
  double noise[kNumBands];
  double floor_init_frames = 0;
  int hangover = 0;

  explicit Vad(int mode) : aggressiveness(mode) {
    for (int b = 0; b < kNumBands; ++b) noise[b] = 1e-8;
  }

  // Goertzel band energy: average power of a few probe frequencies per
  // band — cheap, no FFT dependency.
  static double BandEnergy(const int16_t* x, int n, double sr, double f_lo,
                           double f_hi) {
    double total = 0.0;
    const int probes = 3;
    for (int p = 0; p < probes; ++p) {
      double f = f_lo + (f_hi - f_lo) * (p + 0.5) / probes;
      double w = 2.0 * M_PI * f / sr;
      double coeff = 2.0 * std::cos(w);
      double s0 = 0, s1 = 0, s2 = 0;
      for (int i = 0; i < n; ++i) {
        s0 = x[i] / 32768.0 + coeff * s1 - s2;
        s2 = s1;
        s1 = s0;
      }
      total += (s1 * s1 + s2 * s2 - coeff * s1 * s2) / n;
    }
    return total / probes;
  }

  bool IsSpeech(const int16_t* frame, int n, int sample_rate) {
    double energies[kNumBands];
    for (int b = 0; b < kNumBands; ++b) {
      double hi = std::min(kBandEdges[b + 1], sample_rate / 2.0 - 1);
      energies[b] =
          BandEnergy(frame, n, sample_rate, kBandEdges[b], hi) + 1e-12;
    }

    // update noise floors: fast decay toward minima, slow rise
    bool initializing = floor_init_frames < 10;
    floor_init_frames += 1;
    double snr_sum = 0.0;
    int votes = 0;
    for (int b = 0; b < kNumBands; ++b) {
      if (initializing || energies[b] < noise[b]) {
        noise[b] = 0.8 * noise[b] + 0.2 * energies[b];
      } else {
        noise[b] *= 1.01;  // slow upward adaptation
      }
      double snr = 10.0 * std::log10(energies[b] / noise[b]);
      snr_sum += snr;
      if (snr > 6.0) ++votes;
    }

    // aggressiveness: 0 = permissive .. 3 = strict
    static const double kSnrThresh[4] = {3.0, 5.0, 7.0, 10.0};
    static const int kVoteThresh[4] = {1, 1, 2, 3};
    double mean_snr = snr_sum / kNumBands;
    bool speech = (votes >= kVoteThresh[aggressiveness]) &&
                  (mean_snr > kSnrThresh[aggressiveness]);

    // absolute floor: digital silence is never speech
    double total = 0;
    for (int i = 0; i < n; ++i)
      total += (frame[i] / 32768.0) * (frame[i] / 32768.0);
    if (10.0 * std::log10(total / n + 1e-12) < -60.0) speech = false;

    if (speech) {
      hangover = 4;  // keep "speech" for a few frames after activity
      return true;
    }
    if (hangover > 0) {
      --hangover;
      return true;
    }
    return false;
  }
};

}  // namespace

extern "C" {

void* frame_vad_create(int aggressiveness) {
  if (aggressiveness < 0 || aggressiveness > 3) return nullptr;
  return new Vad(aggressiveness);
}

// frame: int16 PCM; n must correspond to 10/20/30 ms at sample_rate
int frame_vad_is_speech(void* handle, const int16_t* frame, int n,
                        int sample_rate) {
  if (!handle) return -1;
  if (sample_rate != 8000 && sample_rate != 16000 && sample_rate != 32000 &&
      sample_rate != 48000)
    return -1;
  int ms = n * 1000 / sample_rate;
  if (ms != 10 && ms != 20 && ms != 30) return -1;
  return static_cast<Vad*>(handle)->IsSpeech(frame, n, sample_rate) ? 1 : 0;
}

void frame_vad_destroy(void* handle) { delete static_cast<Vad*>(handle); }

}  // extern "C"
