// Lexicon-constrained CTC beam search with ARPA n-gram rescoring (C++).
//
// Native production implementation of the host-side final-segment
// rescorer.  Mirrors the reference's flashlight-text ctc_decoder + KenLM
// stack (reference: lightspeech/models/recognition.py:220-300) and is
// semantics-equivalent to the Python decoder in
// asr_streaming_tpu/decode/beam.py (its test oracle): lexicon trie over
// subword tokens, beam_size / beam_size_token / beam_threshold pruning,
// word-boundary LM scoring with backoff, word alignments with
// (timestep + offset) * frame_seconds timestamps.
//
// C ABI for ctypes; results marshalled as JSON.
//
// Build: make -C native/beamsearch  ->  libasrbeam.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <memory>
#include <sstream>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

constexpr double kLog10 = 2.302585092994046;

// ------------------------------------------------------------ LM interface
//
// Two implementations share the Katz-backoff scorer: text ARPA (ArpaLM)
// and KenLM's PROBING binary (KenLMProbing) — the reference's production
// LM asset format (`lm: 3gram.bin`, reference config asr-online.yaml:22,
// loaded through flashlight+kenlm at recognition.py:236-245).

class LmBase {
 public:
  int order = 1;
  virtual ~LmBase() = default;

  // logP_e(words[from..]) with standard Katz backoff
  virtual float BackoffScore(const std::vector<std::string>& words,
                             size_t from) const = 0;

  float Score(std::vector<std::string>* state, const std::string& word)
      const {
    state->push_back(word);
    size_t from = state->size() > (size_t)order
                      ? state->size() - order : 0;
    float logp = BackoffScore(*state, from);
    if (state->size() > (size_t)(order - 1))
      state->erase(state->begin(), state->end() - (order - 1));
    return logp;
  }

  float Finish(const std::vector<std::string>& state) const {
    std::vector<std::string> words = state;
    words.push_back("</s>");
    size_t from = words.size() > (size_t)order ? words.size() - order : 0;
    return BackoffScore(words, from);
  }

  static std::string Join(const std::vector<std::string>& w, size_t a,
                          size_t b) {
    std::string out;
    for (size_t i = a; i < b; ++i) {
      if (i > a) out += '\x1f';
      out += w[i];
    }
    return out;
  }
};

// ----------------------------------------------------------------- ARPA LM

class ArpaLM : public LmBase {
 public:
  // ngram (words joined by '\x1f') -> {logprob_e, backoff_e}
  std::unordered_map<std::string, std::pair<float, float>> ngrams;

  static std::unique_ptr<ArpaLM> Load(const std::string& path) {
    std::ifstream f(path);
    if (!f.good()) return nullptr;
    auto lm = std::make_unique<ArpaLM>();
    std::string line;
    int current_n = 0;
    while (std::getline(f, line)) {
      while (!line.empty() && (line.back() == '\r' || line.back() == '\n'))
        line.pop_back();
      if (line.size() > 2 && line[0] == '\\' &&
          line.find("-grams:") != std::string::npos) {
        current_n = std::stoi(line.substr(1));
        lm->order = std::max(lm->order, current_n);
        continue;
      }
      if (line.empty() || line[0] == '\\' || line.rfind("ngram ", 0) == 0)
        continue;
      if (current_n == 0) continue;
      // logprob \t words [\t backoff]
      size_t tab1 = line.find('\t');
      if (tab1 == std::string::npos) continue;
      size_t tab2 = line.find('\t', tab1 + 1);
      float logp = std::strtof(line.substr(0, tab1).c_str(), nullptr)
                   * kLog10;
      std::string words = (tab2 == std::string::npos)
                              ? line.substr(tab1 + 1)
                              : line.substr(tab1 + 1, tab2 - tab1 - 1);
      float backoff = 0.f;
      if (tab2 != std::string::npos)
        backoff = std::strtof(line.substr(tab2 + 1).c_str(), nullptr)
                  * kLog10;
      for (auto& c : words)
        if (c == ' ') c = '\x1f';
      lm->ngrams.emplace(std::move(words),
                         std::make_pair(logp, backoff));
    }
    return lm;
  }

  // state: up to (order-1) words joined by '\x1f'
  float BackoffScore(const std::vector<std::string>& words, size_t from)
      const override {
    size_t n = words.size() - from;
    if (n == 0) return -23.f;
    if (n > 1) {
      auto key = Join(words, from, words.size());
      auto it = ngrams.find(key);
      if (it != ngrams.end()) return it->second.first;
      float backoff = 0.f;
      auto ctx = ngrams.find(Join(words, from, words.size() - 1));
      if (ctx != ngrams.end()) backoff = ctx->second.second;
      return backoff + BackoffScore(words, from + 1);
    }
    auto it = ngrams.find(words.back());
    if (it != ngrams.end()) return it->second.first;
    auto unk = ngrams.find("<unk>");
    return unk != ngrams.end() ? unk->second.first : -23.f;
  }

};

// --------------------------------------------------- KenLM PROBING binary
//
// On-disk layout (format version 5; documented in full, with the Python
// writer/oracle twin, in asr_streaming_tpu/decode/kenlm_binary.py):
//   [Sanity 88B: magic(56) zero/one/-0.5 f32, 1/max u32, 1 u64]
//   [FixedWidthParameters 20B: order u8, multiplier f32, model_type i32,
//    has_vocabulary u8, search_version u32] [order x u64 counts] pad8
//   [vocab: {version u32, bound u32} + probing table of {hash u64,id u32}]
//   [unigram: (counts[0]+1) x {prob f32, backoff f32}]
//   [middle n=2..order-1: probing tables of {key u64, prob, backoff}]
//   [longest: probing table of packed {key u64, prob f32}]
//   [NUL-separated vocab strings]
// Probabilities are ARPA log10 floats; converted to log_e at lookup so
// scores match ArpaLM bit-for-bit on the same source ARPA.

class KenLMProbing : public LmBase {
 public:
  static constexpr const char kMagic[] =
      "mmap lm http://kheafield.com/code format version 5\n";

  static std::unique_ptr<KenLMProbing> Load(const std::string& path,
                                            std::string* error) {
    std::ifstream f(path, std::ios::binary);
    if (!f.good()) { *error = "cannot open " + path; return nullptr; }
    auto lm = std::make_unique<KenLMProbing>();
    lm->data_.assign(std::istreambuf_iterator<char>(f),
                     std::istreambuf_iterator<char>());
    const size_t kMagicLen = sizeof(kMagic);  // incl. trailing '\0' = 53
    const size_t kSanity = 88;
    if (lm->data_.size() < kSanity + 20 ||
        std::memcmp(lm->data_.data(), kMagic, kMagicLen) != 0) {
      *error = "not a KenLM binary (magic mismatch)";
      return nullptr;
    }
    float sanity_f[3];
    std::memcpy(sanity_f, lm->data_.data() + Align8(kMagicLen), 12);
    if (sanity_f[0] != 0.f || sanity_f[1] != 1.f || sanity_f[2] != -0.5f) {
      *error = "KenLM sanity block mismatch (incompatible platform)";
      return nullptr;
    }
    const char* p = lm->data_.data() + kSanity;
    unsigned char order_u8;
    std::memcpy(&order_u8, p, 1);
    float multiplier;
    std::memcpy(&multiplier, p + 4, 4);
    int32_t model_type;
    std::memcpy(&model_type, p + 8, 4);
    unsigned char has_vocab;
    std::memcpy(&has_vocab, p + 12, 1);
    if (model_type != 0 && model_type != 1) {
      *error = "KenLM model type " + std::to_string(model_type) +
               " unsupported natively (PROBING=0 and REST_PROBING=1 "
               "here; TRIE=2 / QUANT_TRIE=3 auto-convert through the "
               "Python binding, decode/kenlm_trie.py ensure_native_lm; "
               "Bhiksha ARRAY binaries must be rebuilt as probing or "
               "converted from text ARPA with tools/build_lm.py)";
      return nullptr;
    }
    // REST_PROBING widens unigram/middle entries by one f32 rest cost
    // (lm/weights.hh RestWeights); prob/backoff stay in the leading
    // bytes and full-context scoring never reads rest.
    lm->uni_stride_ = model_type == 1 ? 12 : 8;
    lm->mid_size_ = model_type == 1 ? 20 : 16;
    if (!has_vocab) {
      *error = "KenLM binary was built without vocabulary strings "
               "(build_binary default includes them); word-level "
               "scoring needs them";
      return nullptr;
    }
    lm->order = order_u8;
    std::vector<uint64_t> counts(order_u8);
    std::memcpy(counts.data(), p + 20, 8 * order_u8);
    size_t off = Align8(kSanity + 20 + 8 * order_u8);

    // vocab table
    uint32_t bound;
    std::memcpy(&bound, lm->data_.data() + off + 4, 4);
    lm->bound_ = bound;
    off += 8;
    uint64_t vb = Buckets(counts[0], multiplier);
    size_t vocab_table_off = off;
    off += vb * 12;

    // unigram
    lm->unigram_off_ = off;
    off += (counts[0] + 1) * lm->uni_stride_;

    // middles + longest
    for (int n = 2; n < lm->order; ++n) {
      uint64_t nb = Buckets(counts[n - 1], multiplier);
      lm->middles_.push_back({off, nb});
      off += nb * lm->mid_size_;
    }
    if (lm->order > 1) {
      uint64_t nb = Buckets(counts[lm->order - 1], multiplier);
      lm->longest_ = {off, nb};
      off += nb * 12;
    }
    if (off > lm->data_.size()) {
      *error = "KenLM binary truncated (expected " + std::to_string(off) +
               " bytes of tables, file has " +
               std::to_string(lm->data_.size()) + ")";
      return nullptr;
    }

    // vocab strings -> word ids (tolerate layouts with or without a
    // leading "<unk>")
    const char* s = lm->data_.data() + off;
    const char* end = lm->data_.data() + lm->data_.size();
    std::vector<std::string> words;
    while (s < end) {
      size_t len = strnlen(s, end - s);
      if (len > 0) words.emplace_back(s, len);
      s += len + 1;
    }
    uint32_t wid = (!words.empty() && words[0] == "<unk>") ? 0 : 1;
    for (const auto& w : words) lm->word_ids_.emplace(w, wid++);
    (void)vocab_table_off;  // string map supersedes the hash table here
    return lm;
  }

  float BackoffScore(const std::vector<std::string>& words, size_t from)
      const override {
    std::vector<uint32_t> ids;
    ids.reserve(words.size() - from);
    for (size_t i = from; i < words.size(); ++i) {
      auto it = word_ids_.find(words[i]);
      ids.push_back(it == word_ids_.end() ? 0u : it->second);
    }
    if (ids.size() > (size_t)order)
      ids.erase(ids.begin(), ids.end() - order);
    return BackoffIds(ids.data(), ids.size());
  }

 private:
  static size_t Align8(size_t n) { return (n + 7) & ~(size_t)7; }
  static uint64_t Buckets(uint64_t entries, float multiplier) {
    uint64_t m = (uint64_t)(multiplier * (float)entries);
    return entries + 1 > m ? entries + 1 : m;
  }

  struct Table { size_t off; uint64_t buckets; };

  // detail::CombineWordHash chain, newest word first
  static uint64_t ChainedKey(const uint32_t* ids, size_t n) {
    uint64_t h = ids[n - 1];
    for (size_t k = n - 1; k-- > 0;)
      h = (h * 8978948897894561157ULL) ^
          ((1ULL + ids[k]) * 17894857484156487943ULL);
    return h;
  }

  // linear-probing find; returns byte offset of entry or SIZE_MAX
  size_t Find(const Table& t, size_t entry_size, uint64_t key) const {
    uint64_t slot = key % t.buckets;
    for (uint64_t i = 0; i < t.buckets; ++i) {
      size_t off = t.off + (size_t)slot * entry_size;
      uint64_t got;
      std::memcpy(&got, data_.data() + off, 8);
      if (got == key) return off;
      if (got == 0) return SIZE_MAX;
      if (++slot == t.buckets) slot = 0;
    }
    return SIZE_MAX;
  }

  bool Lookup(const uint32_t* ids, size_t n, float* prob,
              float* backoff) const {
    if (n == 1) {
      if (ids[0] >= bound_) return false;
      float pb[2];
      std::memcpy(pb, data_.data() + unigram_off_ +
                          (size_t)ids[0] * uni_stride_, 8);
      *prob = pb[0];
      *backoff = pb[1];
      return true;
    }
    uint64_t key = ChainedKey(ids, n);
    if ((int)n == order) {
      size_t off = Find(longest_, 12, key);
      if (off == SIZE_MAX) return false;
      std::memcpy(prob, data_.data() + off + 8, 4);
      *backoff = 0.f;
      return true;
    }
    size_t off = Find(middles_[n - 2], mid_size_, key);
    if (off == SIZE_MAX) return false;
    float pb[2];
    std::memcpy(pb, data_.data() + off + 8, 8);
    *prob = pb[0];
    *backoff = pb[1];
    return true;
  }

  float BackoffIds(const uint32_t* ids, size_t n) const {
    float prob, backoff;
    if (n > 1) {
      if (Lookup(ids, n, &prob, &backoff)) return prob * (float)kLog10;
      float bo = 0.f;
      if (Lookup(ids, n - 1, &prob, &backoff)) bo = backoff;
      return bo * (float)kLog10 + BackoffIds(ids + 1, n - 1);
    }
    uint32_t wid = ids[0] < bound_ ? ids[0] : 0u;
    float pb[2];
    std::memcpy(pb, data_.data() + unigram_off_ +
                        (size_t)wid * uni_stride_, 8);
    return pb[0] * (float)kLog10;
  }

  std::vector<char> data_;
  std::unordered_map<std::string, uint32_t> word_ids_;
  size_t unigram_off_ = 0;
  size_t uni_stride_ = 8;
  size_t mid_size_ = 16;
  uint32_t bound_ = 0;
  std::vector<Table> middles_;
  Table longest_{0, 1};
};

// Polymorphic load: KenLM binary when the magic matches, else text ARPA
// (the reference accepts either through kenlm, recognition.py:236-245).
std::unique_ptr<LmBase> LoadLM(const std::string& path) {
  {
    std::ifstream f(path, std::ios::binary);
    if (!f.good()) return nullptr;
    char head[8] = {0};
    f.read(head, 7);
    if (std::memcmp(head, "mmap lm", 7) == 0) {
      std::string error;
      auto lm = KenLMProbing::Load(path, &error);
      if (!lm) std::fprintf(stderr, "asrbeam: %s\n", error.c_str());
      return lm;
    }
  }
  return ArpaLM::Load(path);
}

// ------------------------------------------------------------ lexicon trie

struct TrieNode {
  std::unordered_map<int, int> children;  // token -> node index
  std::vector<int> words;                 // completed word ids
};

struct Lexicon {
  std::vector<TrieNode> nodes;            // node 0 = root
  std::vector<std::string> word_list;

  static std::unique_ptr<Lexicon> Load(
      const std::string& path,
      const std::unordered_map<std::string, int>& token_index) {
    std::ifstream f(path);
    if (!f.good()) return nullptr;
    auto lex = std::make_unique<Lexicon>();
    lex->nodes.emplace_back();
    std::string line;
    while (std::getline(f, line)) {
      while (!line.empty() && (line.back() == '\r' || line.back() == '\n'))
        line.pop_back();
      if (line.empty()) continue;
      size_t tab = line.find('\t');
      if (tab == std::string::npos) continue;
      std::string word = line.substr(0, tab);
      std::istringstream toks(line.substr(tab + 1));
      std::string tok;
      int node = 0;
      bool ok = true;
      while (toks >> tok) {
        auto it = token_index.find(tok);
        if (it == token_index.end()) { ok = false; break; }
        auto child = lex->nodes[node].children.find(it->second);
        if (child == lex->nodes[node].children.end()) {
          lex->nodes.emplace_back();
          int idx = (int)lex->nodes.size() - 1;
          lex->nodes[node].children.emplace(it->second, idx);
          node = idx;
        } else {
          node = child->second;
        }
      }
      if (ok) {
        lex->word_list.push_back(word);
        lex->nodes[node].words.push_back((int)lex->word_list.size() - 1);
      }
    }
    return lex;
  }
};

// ----------------------------------------------------------------- decoder

struct Emit {          // backpointer arena node
  int parent;          // -1 = none
  int token;           // -1 = word commit
  int timestep;
  int word_id;         // valid when token == -1
};

struct Hyp {
  int node;                            // trie node
  std::vector<std::string> lm_state;   // last order-1 words
  int last_token;
  double score;
  int emits;                           // arena index, -1 = none
};

struct HypKeyHash {
  size_t operator()(const std::tuple<int, std::string, int>& k) const {
    return std::hash<int>()(std::get<0>(k)) * 1000003 ^
           std::hash<std::string>()(std::get<1>(k)) * 10007 ^
           std::hash<int>()(std::get<2>(k));
  }
};

class Decoder {
 public:
  std::unique_ptr<Lexicon> lexicon;
  std::unique_ptr<LmBase> lm;
  std::vector<std::string> vocab;
  float lm_weight, beam_threshold, word_score, frame_seconds;
  int beam_size, beam_size_token, blank, silence;

  std::string Decode(const float* emission, int T, int V, int offset) {
    std::vector<Emit> arena;
    using Key = std::tuple<int, std::string, int>;
    std::unordered_map<Key, Hyp, HypKeyHash> hyps;
    hyps.emplace(Key{0, "", blank},
                 Hyp{0, {"<s>"}, blank, 0.f, -1});

    std::vector<int> top_tokens(V);
    for (int t = 0; t < T; ++t) {
      const float* frame = emission + (size_t)t * V;
      int k = std::min(beam_size_token, V);
      for (int i = 0; i < V; ++i) top_tokens[i] = i;
      std::partial_sort(top_tokens.begin(), top_tokens.begin() + k,
                        top_tokens.end(), [&](int a, int b) {
                          return frame[a] > frame[b];
                        });

      std::unordered_map<Key, Hyp, HypKeyHash> next;
      auto push = [&](Key key, Hyp&& h) {
        auto it = next.find(key);
        if (it == next.end() || h.score > it->second.score)
          next[std::move(key)] = std::move(h);
      };

      for (auto& kv : hyps) {
        const Hyp& h = kv.second;
        const std::string lm_key =
            LmBase::Join(h.lm_state, 0, h.lm_state.size());
        // blank
        push(Key{h.node, lm_key, blank},
             Hyp{h.node, h.lm_state, blank, h.score + frame[blank],
                 h.emits});
        // repeat
        if (h.last_token != blank) {
          push(Key{h.node, lm_key, h.last_token},
               Hyp{h.node, h.lm_state, h.last_token,
                   h.score + frame[h.last_token], h.emits});
        }
        // advance
        for (int i = 0; i < k; ++i) {
          int tok = top_tokens[i];
          if (tok == blank || tok == h.last_token) continue;
          auto child_it = lexicon->nodes[h.node].children.find(tok);
          if (child_it == lexicon->nodes[h.node].children.end()) continue;
          int child = child_it->second;
          float s = frame[tok];
          arena.push_back({h.emits, tok, t, -1});
          int emit_idx = (int)arena.size() - 1;
          const TrieNode& cn = lexicon->nodes[child];
          if (!cn.words.empty()) {
            for (int wid : cn.words) {
              std::vector<std::string> lm_next = h.lm_state;
              float lm_s = lm ? lm->Score(&lm_next,
                                          lexicon->word_list[wid]) : 0.f;
              arena.push_back({emit_idx, -1, t, wid});
              // NB: build the key before the push call — passing
              // Join(lm_next) and std::move(lm_next) as sibling arguments
              // has unspecified evaluation order.
              std::string next_key =
                  LmBase::Join(lm_next, 0, lm_next.size());
              push(Key{0, std::move(next_key), tok},
                   Hyp{0, std::move(lm_next), tok,
                       h.score + s + lm_weight * lm_s + word_score,
                       (int)arena.size() - 1});
            }
          }
          if (!cn.children.empty()) {
            push(Key{child, lm_key, tok},
                 Hyp{child, h.lm_state, tok, h.score + s, emit_idx});
          }
        }
      }
      if (next.empty()) break;
      // prune
      std::vector<Hyp*> ranked;
      ranked.reserve(next.size());
      for (auto& kv : next) ranked.push_back(&kv.second);
      std::sort(ranked.begin(), ranked.end(),
                [](Hyp* a, Hyp* b) { return a->score > b->score; });
      double cutoff = ranked[0]->score - beam_threshold;
      hyps.clear();
      int kept = 0;
      for (Hyp* h : ranked) {
        if (kept >= beam_size || h->score < cutoff) break;
        hyps.emplace(Key{h->node,
                         LmBase::Join(h->lm_state, 0, h->lm_state.size()),
                         h->last_token},
                     *h);
        ++kept;
      }
    }

    // finish
    const Hyp* best = nullptr;
    double best_score = -1e30;
    for (auto& kv : hyps) {
      const Hyp& h = kv.second;
      double score = h.score;
      if (lm) score += lm_weight * lm->Finish(h.lm_state);
      if (h.node != 0) score -= 1e4f;  // dangling partial word
      if (score > best_score) { best_score = score; best = &h; }
    }
    if (!best)
      return "{\"transcript\":\"\",\"score\":-1e30,\"alignment\":[]}";

    std::vector<int> tokens, timesteps;
    std::vector<int> word_ids;
    for (int e = best->emits; e >= 0; e = arena[e].parent) {
      if (arena[e].token >= 0) {
        tokens.push_back(arena[e].token);
        timesteps.push_back(arena[e].timestep);
      } else {
        word_ids.push_back(arena[e].word_id);
      }
    }
    std::reverse(tokens.begin(), tokens.end());
    std::reverse(timesteps.begin(), timesteps.end());
    std::reverse(word_ids.begin(), word_ids.end());
    std::string transcript;
    for (size_t i = 0; i < word_ids.size(); ++i) {
      if (i) transcript += ' ';
      transcript += lexicon->word_list[word_ids[i]];
    }

    // alignment grouping (reference recognition.py:267-300)
    double conf = tokens.empty()
                      ? 0.0
                      : std::exp((double)best_score / (tokens.size() + 1));
    conf = std::round(conf * 100.0) / 100.0;
    std::ostringstream out;
    out << "{\"transcript\":\"" << EscapeJson(transcript)
        << "\",\"score\":" << best_score << ",\"alignment\":[";
    bool first_item = true;
    double beg = 0, end = 0;
    std::string word;
    auto round2 = [](double x) { return std::round(x * 100.0) / 100.0; };
    for (size_t i = 0; i < tokens.size(); ++i) {
      bool is_sil = tokens[i] == silence;
      bool prev_sil = i != 0 && tokens[i - 1] == silence;
      if ((i == 0 && !is_sil) || prev_sil)
        beg = round2((timesteps[i] + offset) * frame_seconds);
      if (!is_sil) {
        word += vocab[tokens[i]];
      } else if (i != 0) {
        end = round2((timesteps[i] + offset) * frame_seconds);
        if (!word.empty()) {
          if (!first_item) out << ",";
          first_item = false;
          out << "{\"beg\":" << beg << ",\"end\":" << end << ",\"word\":\""
              << EscapeJson(word) << "\",\"confidence\":" << conf << "}";
        }
        word.clear();
      }
    }
    out << "]}";
    return out.str();
  }

  static std::string EscapeJson(const std::string& s) {
    std::string out;
    for (char c : s) {
      unsigned char u = (unsigned char)c;
      if (c == '"' || c == '\\') {
        out += '\\';
        out += c;
      } else if (u < 0x20) {
        // control characters must be \u-escaped, not dropped
        char buf[8];
        std::snprintf(buf, sizeof buf, "\\u%04x", u);
        out += buf;
      } else {
        out += c;  // includes UTF-8 continuation bytes (>127)
      }
    }
    return out;
  }
};

}  // namespace

extern "C" {

void* asr_decoder_create(const char* lexicon_path, const char* arpa_path,
                         const char** vocab, int vocab_size,
                         float lm_weight, int beam_size,
                         int beam_size_token, float beam_threshold,
                         float word_score, int blank, int silence,
                         float frame_seconds) {
  auto dec = std::make_unique<Decoder>();
  dec->vocab.assign(vocab, vocab + vocab_size);
  std::unordered_map<std::string, int> index;
  for (int i = 0; i < vocab_size; ++i) index[dec->vocab[i]] = i;
  dec->lexicon = Lexicon::Load(lexicon_path, index);
  if (!dec->lexicon) return nullptr;
  if (arpa_path && arpa_path[0]) {
    dec->lm = LoadLM(arpa_path);   // text ARPA or KenLM PROBING binary
    if (!dec->lm) return nullptr;
  }
  dec->lm_weight = lm_weight;
  dec->beam_size = beam_size;
  dec->beam_size_token = beam_size_token;
  dec->beam_threshold = beam_threshold;
  dec->word_score = word_score;
  dec->blank = blank;
  dec->silence = silence;
  dec->frame_seconds = frame_seconds;
  return dec.release();
}

int asr_decoder_decode(void* handle, const float* emission, int T, int V,
                       int offset, char* out, int out_cap) {
  auto* dec = static_cast<Decoder*>(handle);
  std::string json = dec->Decode(emission, T, V, offset);
  if ((int)json.size() + 1 > out_cap) return -(int)json.size() - 1;
  std::memcpy(out, json.c_str(), json.size() + 1);
  return (int)json.size();
}

void asr_decoder_destroy(void* handle) {
  delete static_cast<Decoder*>(handle);
}

}  // extern "C"
