"""KenLM binary LM format: writer/reader twins and beam-output parity.

The reference's production rescorer consumes a KenLM *binary* LM
(`lm: 3gram.bin`, reference config asr-online.yaml:22, loaded through
flashlight+kenlm at recognition.py:236-245).  These tests build a tiny
LM in BOTH text-ARPA and binary form and assert:

  * the Python binary reader scores every (state, word) query exactly
    like the text ArpaLM (including backoff chains and OOV),
  * the native C++ decoder produces IDENTICAL beam output (transcript,
    score, alignment) when handed the .bin vs the .arpa,
  * the Python LexiconBeamDecoder does the same,
  * non-probing model types and corrupted headers are rejected with
    actionable errors.

A real `build_binary` output can be validated end-to-end by pointing
ASR_KENLM_BIN (+ ASR_KENLM_ARPA for its text twin) at the assets.
"""

import itertools
import math
import os
import struct

import numpy as np
import pytest

from asr_streaming_tpu.decode.beam import ArpaLM, LexiconBeamDecoder
from asr_streaming_tpu.decode.kenlm_binary import (
    MAGIC, KenLMBinary, chained_key, load_lm, murmur64a, read_header,
    sniff, write_probing, _SANITY_SIZE, _PARAMS,
)

ARPA = """\\data\\
ngram 1=7
ngram 2=6
ngram 3=3

\\1-grams:
-1.0\t<unk>
-99\t<s>\t-0.40
-0.80\t</s>
-0.70\tab\t-0.30
-0.90\tba\t-0.20
-1.20\tabc\t-0.10
-0.85\ta\t-0.25

\\2-grams:
-0.30\t<s> ab\t-0.15
-0.40\tab ba\t-0.25
-0.60\tba </s>
-0.55\tab a\t-0.12
-0.95\ta ab\t-0.08
-1.10\tabc a\t-0.05

\\3-grams:
-0.20\t<s> ab ba
-0.50\tab ba </s>
-0.65\tab a ab

\\end\\
"""

VOCAB = ["-", "|", "a", "b", "c"]
LEXICON = {
    "ab": ["a", "b", "|"],
    "ba": ["b", "a", "|"],
    "abc": ["a", "b", "c", "|"],
    "a": ["a", "|"],
}


@pytest.fixture(scope="module")
def lm_pair(tmp_path_factory):
    d = tmp_path_factory.mktemp("kenlm")
    arpa = d / "lm.arpa"
    arpa.write_text(ARPA)
    bin_path = d / "lm.bin"
    write_probing(str(arpa), str(bin_path))
    return str(arpa), str(bin_path)


@pytest.fixture(scope="module")
def lexicon_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("lex") / "lexicon.txt"
    p.write_text("\n".join(f"{w}\t{' '.join(toks)}"
                           for w, toks in LEXICON.items()))
    return str(p)


# ------------------------------------------------------------------ format

def test_sniff(lm_pair):
    arpa, bin_path = lm_pair
    assert sniff(arpa) is None
    assert sniff(bin_path) == "PROBING"
    assert sniff("/nonexistent/xx.bin") is None


def test_header_fields(lm_pair):
    _, bin_path = lm_pair
    data = open(bin_path, "rb").read()
    h = read_header(data)
    assert h.order == 3
    assert h.counts == [7, 6, 3]
    assert h.model_type == 0
    assert h.has_vocabulary
    assert abs(h.probing_multiplier - 1.5) < 1e-6
    # header layout: magic at 0, sanity block end at 88, params at 88
    assert data[:len(MAGIC)] == MAGIC
    assert struct.unpack_from("<fff", data, 56) == (0.0, 1.0, -0.5)


def test_rejects_trie_and_bhiksha(lm_pair, tmp_path):
    _, bin_path = lm_pair
    data = bytearray(open(bin_path, "rb").read())
    for model_type, needle in ((2, "TRIE"),
                               (5, "QUANT_ARRAY_TRIE")):
        mutated = bytearray(data)
        struct.pack_into("<i", mutated, _SANITY_SIZE + 8, model_type)
        p = tmp_path / f"mt{model_type}.bin"
        p.write_bytes(bytes(mutated))
        with pytest.raises(ValueError, match=needle):
            KenLMBinary(str(p))


def test_rest_probing_scores_like_probing(lm_pair, tmp_path):
    """model_type 1 (REST_PROBING) loads and scores identically to the
    PROBING twin: rest costs widen the strides but never enter
    full-context scoring (VERDICT r4 #7)."""
    from asr_streaming_tpu.decode.kenlm_binary import (
        _parse_arpa, sniff, write_probing_from,
    )
    arpa_path, bin_path = lm_pair
    rest_path = tmp_path / "rest.bin"
    write_probing_from(_parse_arpa(arpa_path), str(rest_path),
                       model_type=1)
    assert sniff(str(rest_path)) == "REST_PROBING"
    plain = KenLMBinary(bin_path)
    rest = KenLMBinary(str(rest_path))
    words = [w for w in plain.words if w not in ("<unk>",)][:8]
    words += ["zzz-oov", "<s>"]
    for w in words:
        sp, stp = plain.score(plain.start_state(), w)
        sr, str_ = rest.score(rest.start_state(), w)
        assert sp == sr
        for w2 in words[:4]:
            a = plain.score(stp, w2)
            b = rest.score(str_, w2)
            assert a[0] == b[0]


def test_rejects_bad_magic_and_sanity(lm_pair, tmp_path):
    _, bin_path = lm_pair
    data = bytearray(open(bin_path, "rb").read())
    bad = bytearray(data)
    bad[0] = ord("x")
    p = tmp_path / "bad_magic.bin"
    p.write_bytes(bytes(bad))
    with pytest.raises(ValueError, match="magic"):
        KenLMBinary(str(p))
    bad = bytearray(data)
    struct.pack_into("<f", bad, 56, 0.25)     # corrupt the 0.0f probe
    p = tmp_path / "bad_sanity.bin"
    p.write_bytes(bytes(bad))
    with pytest.raises(ValueError, match="sanity"):
        KenLMBinary(str(p))


def test_murmur_and_chain_properties():
    # MurmurHash64A self-consistency on buffer boundaries (tail handling)
    seen = {murmur64a(bytes(range(n))) for n in range(1, 20)}
    assert len(seen) == 19
    assert murmur64a(b"hello") != murmur64a(b"hellp")
    assert murmur64a(b"") == murmur64a(b"")
    # chained keys: order-sensitive, prefix-extensible
    assert chained_key([1, 2, 3]) != chained_key([3, 2, 1])
    assert chained_key([7]) == 7


# ----------------------------------------------------------------- scoring

def test_binary_scores_match_text_exhaustive(lm_pair):
    arpa, bin_path = lm_pair
    t = ArpaLM.from_arpa(arpa)
    b = KenLMBinary(bin_path)
    assert b.order == t.order == 3
    words = ["<s>", "ab", "ba", "abc", "a", "OOVXX", "</s>"]
    for state_len in (0, 1, 2):
        for combo in itertools.product(words, repeat=state_len + 1):
            state, w = tuple(combo[:-1]), combo[-1]
            s_t, n_t = t.score(state, w)
            s_b, n_b = b.score(state, w)
            assert abs(s_t - s_b) < 1e-5, (state, w, s_t, s_b)
            assert n_t == n_b
            assert abs(t.finish(state + (w,)) - b.finish(state + (w,))) \
                < 1e-5


def test_word_id_hash_table(lm_pair):
    _, bin_path = lm_pair
    b = KenLMBinary(bin_path)
    ids = {w: b.word_id(w) for w in ["ab", "ba", "abc", "a", "<s>",
                                     "</s>"]}
    assert len(set(ids.values())) == 6        # distinct non-unk ids
    assert all(0 < i < b.bound for i in ids.values())
    assert b.word_id("never-seen-word") == 0  # OOV -> <unk>
    # strings section round-trips in id order
    for w, i in ids.items():
        assert b.words[i] == w


def test_load_lm_polymorphic(lm_pair):
    arpa, bin_path = lm_pair
    assert isinstance(load_lm(arpa), ArpaLM)
    assert isinstance(load_lm(bin_path), KenLMBinary)


def test_unk_defaults_when_absent(tmp_path):
    arpa = tmp_path / "nounk.arpa"
    arpa.write_text(
        "\\data\\\nngram 1=2\n\n\\1-grams:\n-0.5\t<s>\t-0.1\n-0.7\t</s>\n"
        "\n\\end\\\n")
    bin_path = tmp_path / "nounk.bin"
    write_probing(str(arpa), str(bin_path))
    b = KenLMBinary(str(bin_path))
    # KenLM convention: missing <unk> is stored as -100 log10
    assert abs(b._backoff_score(("zzz",)) - (-100.0 * math.log(10))) < 1e-3


# ------------------------------------------------------------- beam parity

def _noisy_emission(T, V=5, seed=3):
    rng = np.random.default_rng(seed)
    em = rng.standard_normal((T, V)).astype(np.float32)
    return np.log(np.exp(em) / np.exp(em).sum(-1, keepdims=True))


def test_python_beam_identical_text_vs_binary(lm_pair):
    arpa, bin_path = lm_pair
    dec_t = LexiconBeamDecoder(VOCAB, LEXICON, ArpaLM.from_arpa(arpa),
                               lm_weight=1.5)
    dec_b = LexiconBeamDecoder(VOCAB, LEXICON, KenLMBinary(bin_path),
                               lm_weight=1.5)
    for seed in range(4):
        em = _noisy_emission(24, seed=seed)
        r_t = dec_t.decode(em, offset=5)
        r_b = dec_b.decode(em, offset=5)
        assert r_t.transcript == r_b.transcript
        assert abs(r_t.score - r_b.score) < 1e-4
        assert r_t.alignment == r_b.alignment


def test_native_beam_identical_text_vs_binary(lm_pair, lexicon_file):
    from asr_streaming_tpu.decode.beam_native import (
        NativeBeamDecoder, native_available,
    )
    if not native_available():
        pytest.skip("libasrbeam.so unavailable")
    arpa, bin_path = lm_pair
    dec_t = NativeBeamDecoder(VOCAB, lexicon_file, arpa, lm_weight=1.5)
    dec_b = NativeBeamDecoder(VOCAB, lexicon_file, bin_path, lm_weight=1.5)
    for seed in range(4):
        em = _noisy_emission(24, seed=seed)
        r_t = dec_t.decode_full(em, offset=5)
        r_b = dec_b.decode_full(em, offset=5)
        assert r_t["transcript"] == r_b["transcript"]
        assert abs(r_t["score"] - r_b["score"]) < 1e-3
        assert r_t["alignment"] == r_b["alignment"]


def test_native_matches_python_with_binary_lm(lm_pair, lexicon_file):
    from asr_streaming_tpu.decode.beam_native import (
        NativeBeamDecoder, native_available,
    )
    if not native_available():
        pytest.skip("libasrbeam.so unavailable")
    _, bin_path = lm_pair
    native = NativeBeamDecoder(VOCAB, lexicon_file, bin_path,
                               lm_weight=1.5)
    py = LexiconBeamDecoder(VOCAB, LEXICON, KenLMBinary(bin_path),
                            lm_weight=1.5)
    for seed in range(3):
        em = _noisy_emission(20, seed=seed)
        r_n = native.decode_full(em)
        r_p = py.decode(em)
        assert r_n["transcript"] == r_p.transcript
        assert abs(r_n["score"] - r_p.score) < 1e-3


# --------------------------------------------------- real-asset validation

@pytest.mark.skipif("ASR_KENLM_BIN" not in os.environ,
                    reason="set ASR_KENLM_BIN to a real build_binary "
                           "probing output (and optionally "
                           "ASR_KENLM_ARPA to its source ARPA)")
def test_real_kenlm_binary_loads():
    b = KenLMBinary(os.environ["ASR_KENLM_BIN"])
    assert b.order >= 1 and b.bound > 2
    s, _ = b.score(b.start_state(), b.words[min(2, len(b.words) - 1)])
    assert np.isfinite(s)
    if "ASR_KENLM_ARPA" in os.environ:
        t = ArpaLM.from_arpa(os.environ["ASR_KENLM_ARPA"])
        for w in b.words[1:64]:
            s_t, _ = t.score(("<s>",), w)
            s_b, _ = b.score(("<s>",), w)
            assert abs(s_t - s_b) < 1e-4
