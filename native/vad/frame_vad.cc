// Frame-based voice activity detector (C++): GMM noise/speech classifier.
//
// Native host-side first-stage gate with the reference's webrtcvad API
// shape (reference: streaming_decoder/stream.py:54-55, 166-188 — 10/20/30
// ms frames, aggressiveness 0-3, is_speech(frame, rate)).  This is a
// floating-point re-derivation of the WebRTC VAD *algorithm* — the same
// pipeline the reference's `webrtcvad` C extension runs:
//
//   1. decimate to 8 kHz;
//   2. split-band filterbank (first-order allpass QMF tree) into six
//      sub-bands 80-250/250-500/500-1000/1000-2000/2000-3000/3000-4000 Hz
//      with an 80 Hz biquad high-pass on the lowest band;
//   3. log-energy feature per band;
//   4. per-band two-component Gaussian mixtures for the noise and speech
//      hypotheses (initialized from the published WebRTC prior tables),
//      per-band log-likelihood ratios tested against per-mode local
//      thresholds and a spectrum-weighted global threshold;
//   5. online adaptation: noise means follow a minimum-statistics tracker
//      (16-value / ~100-frame window), speech means/stds adapt only on
//      speech decisions, hypothesis means are kept separated per band;
//   6. hangover smoothing with mode-dependent overhang.
//
// It is not bit-exact with webrtcvad (that is Q-format fixed-point; this
// is float, and the decision thresholds are recalibrated for the float
// LLR scale).  Decisions on a deterministic labeled corpus are pinned as
// a golden fixture by tools/vad_parity.py (tests/test_vad_parity.py),
// which also measures frame-by-frame agreement against the real
// webrtcvad wheel wherever one is importable.
//
// Build: make -C native/vad -> libframevad.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int kNumChannels = 6;
constexpr int kNumGaussians = 2;
constexpr int kTableSize = kNumChannels * kNumGaussians;

// GMM priors (WebRTC vad_core table values, Q7 -> float via /128).
// Layout: [gaussian * kNumChannels + channel].
constexpr double kQ7 = 128.0;
constexpr double kNoiseMeans[kTableSize] = {
    6738 / kQ7, 4892 / kQ7, 7065 / kQ7, 6715 / kQ7, 6771 / kQ7, 3369 / kQ7,
    7646 / kQ7, 3863 / kQ7, 7820 / kQ7, 7266 / kQ7, 5020 / kQ7, 4362 / kQ7};
constexpr double kSpeechMeans[kTableSize] = {
    8306 / kQ7, 10085 / kQ7, 10078 / kQ7, 11823 / kQ7, 11843 / kQ7,
    6309 / kQ7, 9473 / kQ7,  9571 / kQ7,  10879 / kQ7, 7581 / kQ7,
    8180 / kQ7, 7483 / kQ7};
constexpr double kNoiseStds[kTableSize] = {
    378 / kQ7, 1064 / kQ7, 493 / kQ7, 582 / kQ7, 688 / kQ7, 593 / kQ7,
    474 / kQ7, 697 / kQ7,  475 / kQ7, 688 / kQ7, 421 / kQ7, 455 / kQ7};
constexpr double kSpeechStds[kTableSize] = {
    555 / kQ7, 505 / kQ7,  567 / kQ7, 524 / kQ7, 585 / kQ7,  1231 / kQ7,
    509 / kQ7, 828 / kQ7,  492 / kQ7, 1540 / kQ7, 1079 / kQ7, 850 / kQ7};
constexpr double kNoiseWeights[kTableSize] = {
    34 / kQ7, 62 / kQ7, 72 / kQ7, 66 / kQ7, 53 / kQ7, 25 / kQ7,
    94 / kQ7, 66 / kQ7, 56 / kQ7, 62 / kQ7, 75 / kQ7, 103 / kQ7};
constexpr double kSpeechWeights[kTableSize] = {
    48 / kQ7, 82 / kQ7, 45 / kQ7, 87 / kQ7, 50 / kQ7, 47 / kQ7,
    80 / kQ7, 46 / kQ7, 83 / kQ7, 41 / kQ7, 78 / kQ7, 81 / kQ7};

// Spectrum weights for the global LLR sum (higher bands weigh more).
constexpr double kSpectrumWeight[kNumChannels] = {6, 8, 10, 12, 14, 16};
// Per-band log-energy offsets (Q4 -> /16): align band features with the
// prior tables' domain.
constexpr double kOffset[kNumChannels] = {368 / 16.0, 368 / 16.0, 272 / 16.0,
                                          176 / 16.0, 176 / 16.0, 176 / 16.0};
// Adaptation rates.
constexpr double kNoiseUpdate = 655.0 / 32768.0;    // always
constexpr double kSpeechUpdate = 6554.0 / 32768.0;  // on speech frames
constexpr double kBackEta = 154.0 / 256.0;          // pull toward minimum
// Hypothesis-separation floor per band (Q7 -> float).
constexpr double kMinDiff[kNumChannels] = {544 / kQ7, 544 / kQ7, 576 / kQ7,
                                           576 / kQ7, 576 / kQ7, 576 / kQ7};
constexpr double kMaxSpeechMean = 11392 / kQ7;
constexpr double kMaxNoiseMean[kNumChannels] = {
    9216 / kQ7, 9088 / kQ7, 8960 / kQ7, 8832 / kQ7, 8704 / kQ7, 8576 / kQ7};
constexpr double kMinStd = 384 / kQ7;
constexpr double kMaxStd = 16.0;

// Decision thresholds per aggressiveness mode, calibrated for the float
// log2-LLR scale (ratios follow the WebRTC mode tables: quality /
// low-bitrate / aggressive / very-aggressive).
constexpr double kLocalThr[4] = {1.5, 2.3, 5.1, 5.9};
constexpr double kGlobalThr[4] = {3.6, 6.3, 17.8, 68.0};
constexpr int kOverHangMax1[4] = {3, 3, 2, 2};  // short speech burst
constexpr int kOverHangMax2[4] = {5, 5, 3, 3};  // sustained speech
constexpr int kMaxSpeechFrames = 6;
// Digital-silence gate: frames at or below -60 dBFS mean-square never
// count as speech (the WebRTC kMinEnergy gate, restated in float dBFS).
constexpr double kMinMeanSquareDb = -60.0;

// Minimum-statistics window (per channel): the 16 smallest features seen
// in the last ~100 frames; the tracked minimum is the median of the 5
// smallest.
constexpr int kMinBuf = 16;
constexpr int kMaxAge = 100;

// First-order allpass: y[n] = c*(x[n] - y[n-1]) + x[n-1] ... implemented
// in the polyphase QMF form used for half-band split/decimate.
struct Allpass {
  double c, state = 0;
  explicit Allpass(double coeff) : c(coeff) {}
  // y[n] = c*x[n] + x[n-1] - c*y[n-1], with the single delay element
  // holding (x[n-1] - c*y[n-1]).
  double step(double x) {
    double y = c * x + state;
    state = x - c * y;
    return y;
  }
  void reset() { state = 0; }
};

// Half-band QMF split with decimation by 2: even samples through A0,
// odd through A1; lp = (a0 + a1)/2, hp = (a0 - a1)/2.
struct SplitFilter {
  Allpass a0{0.6399}, a1{0.1700};
  void split(const std::vector<double>& in, std::vector<double>* lp,
             std::vector<double>* hp) {
    size_t half = in.size() / 2;
    lp->resize(half);
    hp->resize(half);
    for (size_t i = 0; i < half; ++i) {
      double e = a0.step(in[2 * i]);      // even-phase branch
      double o = a1.step(in[2 * i + 1]);  // odd-phase (delayed) branch
      (*lp)[i] = 0.5 * (e + o);
      (*hp)[i] = 0.5 * (e - o);
    }
  }
};

// 80 Hz high-pass biquad (WebRTC hp filter coefficients, Q13 -> float).
struct HighPass {
  double z1 = 0, z2 = 0;
  double process_energy(const std::vector<double>& in) {
    const double b0 = 6631 / 8192.0, b1 = -13262 / 8192.0, b2 = 6631 / 8192.0;
    const double a1 = -11698 / 8192.0, a2 = 3555 / 8192.0;
    double energy = 0;
    for (double x : in) {
      double y = b0 * x + z1;
      z1 = b1 * x - a1 * y + z2;
      z2 = b2 * x - a2 * y;
      energy += y * y;
    }
    return energy;
  }
};

double gaussian_pdf(double x, double mean, double std) {
  double d = (x - mean) / std;
  return std::exp(-0.5 * d * d) / (std * 2.5066282746310002);
}

struct MinTracker {
  double values[kMinBuf];
  int ages[kMinBuf];
  int count = 0;

  void insert(double v) {
    for (int i = 0; i < count; ++i) ages[i]++;
    // drop expired entries
    int w = 0;
    for (int i = 0; i < count; ++i) {
      if (ages[i] <= kMaxAge) {
        values[w] = values[i];
        ages[w] = ages[i];
        ++w;
      }
    }
    count = w;
    if (count < kMinBuf) {
      values[count] = v;
      ages[count] = 0;
      ++count;
    } else {
      // replace the largest value if the new one is smaller
      int imax = 0;
      for (int i = 1; i < count; ++i)
        if (values[i] > values[imax]) imax = i;
      if (v < values[imax]) {
        values[imax] = v;
        ages[imax] = 0;
      }
    }
  }

  double minimum() const {
    if (count == 0) return 0;
    double sorted[kMinBuf];
    std::copy(values, values + count, sorted);
    std::sort(sorted, sorted + count);
    int n = std::min(count, 5);
    return sorted[n / 2];  // median of the <=5 smallest
  }
};

struct Vad {
  int mode;
  double noise_mean[kTableSize], noise_std[kTableSize];
  double speech_mean[kTableSize], speech_std[kTableSize];
  MinTracker minima[kNumChannels];
  int over_hang = 0;
  int num_of_speech = 0;
  int frame_count = 0;

  // filter states persist across frames (streaming filterbank)
  SplitFilter split_1, split_21, split_22, split_31, split_32;
  HighPass hp80;
  // 16 kHz -> 8 kHz decimator state (allpass pair)
  Allpass ds0{0.6399}, ds1{0.1700};

  explicit Vad(int m) : mode(m) {
    std::copy(kNoiseMeans, kNoiseMeans + kTableSize, noise_mean);
    std::copy(kNoiseStds, kNoiseStds + kTableSize, noise_std);
    std::copy(kSpeechMeans, kSpeechMeans + kTableSize, speech_mean);
    std::copy(kSpeechStds, kSpeechStds + kTableSize, speech_std);
  }

  // Decimate int16 input at sample_rate down to 8 kHz doubles.
  std::vector<double> to_8k(const int16_t* x, int n, int sample_rate) {
    std::vector<double> out;
    if (sample_rate == 8000) {
      out.assign(x, x + n);
      return out;
    }
    int factor = sample_rate / 16000;  // 1 for 16k, 2 for 32k, 3 for 48k
    // boxcar pre-decimate 32k/48k to 16k (documented approximation)
    std::vector<double> x16;
    if (factor <= 1) {
      x16.assign(x, x + n);
    } else {
      x16.reserve(n / factor);
      for (int i = 0; i + factor <= n; i += factor) {
        double s = 0;
        for (int k = 0; k < factor; ++k) s += x[i + k];
        x16.push_back(s / factor);
      }
    }
    // 16k -> 8k via the allpass half-band pair (alias-suppressed)
    out.reserve(x16.size() / 2);
    for (size_t i = 0; i + 1 < x16.size(); i += 2) {
      double e = ds0.step(x16[i]);
      double o = ds1.step(x16[i + 1]);
      out.push_back(0.5 * (e + o));
    }
    return out;
  }

  // Six band log-energies via the split tree; returns total energy too.
  void features(const std::vector<double>& x8, double feat[kNumChannels],
                double* total_energy) {
    std::vector<double> lp1, hp1;           // 0-2k / 2-4k
    split_1.split(x8, &lp1, &hp1);
    std::vector<double> b23, b34;           // 2-3k / 3-4k
    split_21.split(hp1, &b23, &b34);
    std::vector<double> lp2, b12;           // 0-1k / 1-2k
    split_22.split(lp1, &lp2, &b12);
    std::vector<double> lp3, b051;          // 0-500 / 500-1000
    split_31.split(lp2, &lp3, &b051);
    std::vector<double> lp4, b2505;         // 0-250 / 250-500
    split_32.split(lp3, &lp4, &b2505);

    auto energy = [](const std::vector<double>& v) {
      double e = 0;
      for (double s : v) e += s * s;
      return e;
    };
    double e[kNumChannels];
    e[0] = hp80.process_energy(lp4);  // 80-250 (80 Hz HP on 0-250)
    e[1] = energy(b2505);
    e[2] = energy(b051);
    e[3] = energy(b12);
    e[4] = energy(b23);
    e[5] = energy(b34);
    *total_energy = 0;
    for (int ch = 0; ch < kNumChannels; ++ch) {
      *total_energy += e[ch];
      // 0.5 dB log-energy units + per-band offset (the prior tables'
      // feature domain)
      feat[ch] = 5.0 * std::log10(e[ch] + 1e-10) + kOffset[ch];
      feat[ch] = std::max(0.0, std::min(127.0, feat[ch]));
    }
  }

  bool classify(const double feat[kNumChannels], double mean_square_db) {
    ++frame_count;
    bool vadflag = false;
    double sum_llr = 0;
    double h0_post[kTableSize], h1_post[kTableSize];

    if (mean_square_db > kMinMeanSquareDb) {
      for (int ch = 0; ch < kNumChannels; ++ch) {
        double x = feat[ch];
        double h0 = 0, h1 = 0, p0[kNumGaussians], p1[kNumGaussians];
        for (int g = 0; g < kNumGaussians; ++g) {
          int k = g * kNumChannels + ch;
          p0[g] = kNoiseWeights[k] *
                  gaussian_pdf(x, noise_mean[k], noise_std[k]);
          p1[g] = kSpeechWeights[k] *
                  gaussian_pdf(x, speech_mean[k], speech_std[k]);
          h0 += p0[g];
          h1 += p1[g];
        }
        // A feature far below BOTH hypotheses carries no speech evidence
        // (in the fixed-point original both probabilities saturate at the
        // same floor); without this guard the wider speech variances win
        // on underflow alone.
        double llr = (h0 < 1e-18 && h1 < 1e-18)
                         ? 0.0
                         : std::log2(h1 + 1e-30) - std::log2(h0 + 1e-30);
        sum_llr += kSpectrumWeight[ch] * llr;
        if (llr > kLocalThr[mode]) vadflag = true;
        for (int g = 0; g < kNumGaussians; ++g) {
          int k = g * kNumChannels + ch;
          h0_post[k] = h0 > 1e-30 ? p0[g] / h0 : 0.5;
          h1_post[k] = h1 > 1e-30 ? p1[g] / h1 : 0.5;
        }
      }
      if (sum_llr > kGlobalThr[mode]) vadflag = true;

      adapt(feat, vadflag, h0_post, h1_post);
    }

    // hangover smoothing (WebRTC overhang logic)
    if (vadflag) {
      ++num_of_speech;
      over_hang = (num_of_speech > kMaxSpeechFrames) ? kOverHangMax2[mode]
                                                     : kOverHangMax1[mode];
      return true;
    }
    num_of_speech = 0;
    if (over_hang > 0) {
      --over_hang;
      return true;
    }
    return false;
  }

  void adapt(const double feat[kNumChannels], bool vadflag,
             const double h0_post[kTableSize],
             const double h1_post[kTableSize]) {
    for (int ch = 0; ch < kNumChannels; ++ch) {
      minima[ch].insert(feat[ch]);
      double fmin = minima[ch].minimum();

      for (int g = 0; g < kNumGaussians; ++g) {
        int k = g * kNumChannels + ch;
        double x = feat[ch];
        // noise model: always track (posterior-weighted)
        double dn = x - noise_mean[k];
        noise_mean[k] += kNoiseUpdate * h0_post[k] * dn;
        noise_mean[k] = std::min(noise_mean[k], kMaxNoiseMean[ch]);
        if (vadflag) {
          // speech model: only on speech frames
          double dsm = x - speech_mean[k];
          speech_mean[k] += kSpeechUpdate * h1_post[k] * dsm;
          speech_mean[k] = std::min(speech_mean[k], kMaxSpeechMean);
          double dev = std::abs(dsm) - speech_std[k];
          speech_std[k] += kSpeechUpdate * 0.5 * h1_post[k] * dev;
          speech_std[k] =
              std::max(kMinStd, std::min(kMaxStd, speech_std[k]));
        } else {
          double dev = std::abs(dn) - noise_std[k];
          noise_std[k] += kNoiseUpdate * h0_post[k] * dev;
          noise_std[k] = std::max(kMinStd, std::min(kMaxStd, noise_std[k]));
        }
      }

      // pull the noise hypothesis toward the tracked minimum; faster
      // during the warm-start window (the fixed-point original scales
      // its smoothing by the frame counter in the same spirit)
      double wnoise = weighted_mean(noise_mean, ch, kNoiseWeights);
      if (wnoise > fmin) {
        double rate = frame_count < 50 ? 4.0 : 1.0;
        double excess = rate * kBackEta * (wnoise - fmin) / 16.0;
        for (int g = 0; g < kNumGaussians; ++g)
          noise_mean[g * kNumChannels + ch] -= excess;
      }

      // keep the hypotheses separated
      double ws = weighted_mean(speech_mean, ch, kSpeechWeights);
      double wn = weighted_mean(noise_mean, ch, kNoiseWeights);
      double shortfall = kMinDiff[ch] - (ws - wn);
      if (shortfall > 0) {
        for (int g = 0; g < kNumGaussians; ++g) {
          speech_mean[g * kNumChannels + ch] += 0.5 * shortfall;
          noise_mean[g * kNumChannels + ch] -= 0.5 * shortfall;
        }
      }
    }
  }

  static double weighted_mean(const double* means, int ch,
                              const double* weights) {
    double num = 0, den = 0;
    for (int g = 0; g < kNumGaussians; ++g) {
      int k = g * kNumChannels + ch;
      num += weights[k] * means[k];
      den += weights[k];
    }
    return num / den;
  }

  bool IsSpeech(const int16_t* frame, int n, int sample_rate) {
    std::vector<double> x8 = to_8k(frame, n, sample_rate);
    double feat[kNumChannels], total = 0;
    features(x8, feat, &total);
    double ms = 0;
    for (int i = 0; i < n; ++i) {
      double v = frame[i] / 32768.0;
      ms += v * v;
    }
    double ms_db = 10.0 * std::log10(ms / n + 1e-12);
    return classify(feat, ms_db);
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
