"""KenLM TRIE binary format: writer/reader twins, quantization, and
beam-output parity (companion to test_kenlm_binary.py's PROBING tests).

The reference's production LM asset (`lm: 3gram.bin`, reference config
asr-online.yaml:22) can be a `build_binary trie` output — several times
smaller than probing and the common deployment choice.  These tests build
a tiny LM as text ARPA, TRIE and QUANT_TRIE and assert:

  * the trie reader scores every (state, word) query exactly like the
    text ArpaLM (backoff chains, OOV, quantized: lossless because the toy
    LM has < 2**8 distinct values per table),
  * enumeration reproduces the ARPA n-gram table exactly,
  * trie -> probing conversion feeds the native C++ decoder with
    IDENTICAL beam output to the text ARPA,
  * load_lm routes every model type to the right loader and the Bhiksha
    ARRAY variants are rejected with actionable errors.

A real `build_binary trie` output validates end-to-end via ASR_KENLM_BIN
(+ ASR_KENLM_ARPA), shared with the probing real-asset gate.
"""

import itertools
import os
import struct

import numpy as np
import pytest

from asr_streaming_tpu.decode.beam import ArpaLM, LexiconBeamDecoder
from asr_streaming_tpu.decode.kenlm_binary import (
    KenLMBinary, _PARAMS, _SANITY_SIZE, load_lm, sniff,
)
from asr_streaming_tpu.decode.kenlm_trie import (
    KenLMTrie, ensure_native_lm, write_trie,
)

from test_kenlm_binary import ARPA, LEXICON, VOCAB, _noisy_emission

WORDS = ["<s>", "ab", "ba", "abc", "a", "OOVXX", "</s>"]


@pytest.fixture(scope="module")
def lm_trio(tmp_path_factory):
    d = tmp_path_factory.mktemp("kenlm_trie")
    arpa = d / "lm.arpa"
    arpa.write_text(ARPA)
    trie = d / "lm.trie"
    write_trie(str(arpa), str(trie))
    qtrie = d / "lm.qtrie"
    write_trie(str(arpa), str(qtrie), quantize=True)
    return str(arpa), str(trie), str(qtrie)


@pytest.fixture(scope="module")
def lexicon_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("lex") / "lexicon.txt"
    p.write_text("\n".join(f"{w}\t{' '.join(toks)}"
                           for w, toks in LEXICON.items()))
    return str(p)


# ------------------------------------------------------------------ format

def test_sniff_and_header(lm_trio):
    arpa, trie, qtrie = lm_trio
    assert sniff(arpa) is None
    assert sniff(trie) == "TRIE"
    assert sniff(qtrie) == "QUANT_TRIE"
    t = KenLMTrie(trie)
    assert t.order == 3 and t.header.counts == [7, 6, 3]
    assert not t.quantized and KenLMTrie(qtrie).quantized
    # sorted vocab: 6 hashes (7 unigrams minus implicit <unk>), bound 7
    assert t.bound == 7


def test_word_ids_sorted_vocab(lm_trio):
    _, trie, _ = lm_trio
    t = KenLMTrie(trie)
    ids = {w: t.word_id(w) for w in ["ab", "ba", "abc", "a", "<s>", "</s>"]}
    assert sorted(ids.values()) == [1, 2, 3, 4, 5, 6]
    assert t.word_id("never-seen") == 0
    # strings section matches id assignment
    for w, i in ids.items():
        assert t.words[i] == w


def test_load_lm_routes_by_model_type(lm_trio):
    arpa, trie, qtrie = lm_trio
    assert isinstance(load_lm(arpa), ArpaLM)
    assert isinstance(load_lm(trie), KenLMTrie)
    assert isinstance(load_lm(qtrie), KenLMTrie)


def test_cross_loader_rejections(lm_trio, tmp_path):
    _, trie, _ = lm_trio
    with pytest.raises(ValueError, match="PROBING"):
        KenLMBinary(trie)
    # probing binary refused by the trie loader
    from asr_streaming_tpu.decode.kenlm_binary import write_probing
    probing = tmp_path / "lm.bin"
    write_probing(lm_trio[0], str(probing))
    with pytest.raises(ValueError, match="TRIE-family"):
        KenLMTrie(str(probing))
    # Bhiksha ARRAY variants rejected everywhere with a pointer to the
    # rebuild path
    data = bytearray(open(trie, "rb").read())
    struct.pack_into("<i", data, _SANITY_SIZE + 8, 4)
    p = tmp_path / "array.bin"
    p.write_bytes(bytes(data))
    assert sniff(str(p)) == "ARRAY_TRIE"
    with pytest.raises(ValueError, match="Bhiksha"):
        load_lm(str(p))
    with pytest.raises(ValueError, match="Bhiksha"):
        KenLMTrie(str(p))


def test_missing_prefix_arpa_rejected(tmp_path):
    # (x y z) stored without (y z): build_binary would insert a blank —
    # the twin writer refuses instead of guessing blank semantics
    arpa = tmp_path / "gap.arpa"
    arpa.write_text(
        "\\data\\\nngram 1=4\nngram 2=1\nngram 3=1\n\n"
        "\\1-grams:\n-1.0\t<unk>\n-99\t<s>\t-0.4\n-0.5\tx\t-0.2\n"
        "-0.6\ty\t-0.1\n\n"
        "\\2-grams:\n-0.3\t<s> x\t-0.1\n\n"
        "\\3-grams:\n-0.2\t<s> y x\n\n\\end\\\n")
    with pytest.raises(ValueError, match="missing the prefix"):
        write_trie(str(arpa), str(tmp_path / "gap.trie"))


# ----------------------------------------------------------------- scoring

@pytest.mark.parametrize("which", ["trie", "qtrie"])
def test_trie_scores_match_text_exhaustive(lm_trio, which):
    arpa, trie, qtrie = lm_trio
    t = ArpaLM.from_arpa(arpa)
    b = KenLMTrie(trie if which == "trie" else qtrie)
    assert b.order == t.order == 3
    for state_len in (0, 1, 2):
        for combo in itertools.product(WORDS, repeat=state_len + 1):
            state, w = tuple(combo[:-1]), combo[-1]
            s_t, n_t = t.score(state, w)
            s_b, n_b = b.score(state, w)
            # quantized is lossless here: < 2**8 distinct values/table
            assert abs(s_t - s_b) < 1e-5, (which, state, w, s_t, s_b)
            assert n_t == n_b
            assert abs(t.finish(state + (w,)) - b.finish(state + (w,))) \
                < 1e-5


def test_trie_matches_probing_semantics_on_oov_context(lm_trio, tmp_path):
    # both binary formats share KenLM's id-0 OOV fold (an OOV context
    # word can match stored <unk> n-grams) — assert the two binary
    # readers agree even where the string-keyed ArpaLM may differ
    arpa, trie, _ = lm_trio
    from asr_streaming_tpu.decode.kenlm_binary import write_probing
    probing = tmp_path / "lm.bin"
    write_probing(arpa, str(probing))
    p = KenLMBinary(str(probing))
    t = KenLMTrie(trie)
    for state in itertools.product(["OOVXX", "ab", "<unk>"], repeat=2):
        for w in WORDS:
            s_p, _ = p.score(state, w)
            s_t, _ = t.score(state, w)
            assert abs(s_p - s_t) < 1e-5, (state, w)


# ------------------------------------------------------------- enumeration

def test_enumeration_roundtrips_arpa(lm_trio):
    arpa, trie, _ = lm_trio
    src = ArpaLM.from_arpa(arpa)
    got = {tuple(ws): (lp, bo)
           for _, ws, lp, bo in KenLMTrie(trie).iter_ngrams()}
    # every ARPA n-gram present with its exact (f32-rounded) values;
    # natural-log ArpaLM values compared in log10
    import math
    for ws, (lp_e, bo_e) in src.ngrams.items():
        assert ws in got, ws
        lp, bo = got[ws]
        assert abs(lp - lp_e / math.log(10)) < 1e-5
        assert abs(bo - bo_e / math.log(10)) < 1e-5
    assert len(got) == len(src.ngrams)


def test_trie_to_probing_conversion(lm_trio, tmp_path):
    arpa, trie, qtrie = lm_trio
    out = tmp_path / "converted.bin"
    KenLMTrie(trie).to_probing(str(out))
    assert sniff(str(out)) == "PROBING"
    conv = KenLMBinary(str(out))
    src = ArpaLM.from_arpa(arpa)
    for state_len in (0, 1, 2):
        for combo in itertools.product(WORDS, repeat=state_len + 1):
            state, w = tuple(combo[:-1]), combo[-1]
            assert abs(src.score(state, w)[0]
                       - conv.score(state, w)[0]) < 1e-5


def test_ensure_native_lm_caches(lm_trio):
    arpa, trie, qtrie = lm_trio
    assert ensure_native_lm(arpa) == arpa       # pass-through
    conv = ensure_native_lm(trie)
    assert conv == trie + ".as_probing.bin"
    assert sniff(conv) == "PROBING"
    mtime = os.path.getmtime(conv)
    assert ensure_native_lm(trie) == conv       # cache hit, no rewrite
    assert os.path.getmtime(conv) == mtime


# ------------------------------------------------------------- beam parity

@pytest.mark.parametrize("which", ["trie", "qtrie"])
def test_python_beam_identical_text_vs_trie(lm_trio, which):
    arpa, trie, qtrie = lm_trio
    dec_t = LexiconBeamDecoder(VOCAB, LEXICON, ArpaLM.from_arpa(arpa),
                               lm_weight=1.5)
    dec_b = LexiconBeamDecoder(
        VOCAB, LEXICON, load_lm(trie if which == "trie" else qtrie),
        lm_weight=1.5)
    for seed in range(4):
        em = _noisy_emission(24, seed=seed)
        r_t = dec_t.decode(em, offset=5)
        r_b = dec_b.decode(em, offset=5)
        assert r_t.transcript == r_b.transcript
        assert abs(r_t.score - r_b.score) < 1e-4
        assert r_t.alignment == r_b.alignment


def test_native_beam_loads_trie_via_conversion(lm_trio, lexicon_file):
    from asr_streaming_tpu.decode.beam_native import (
        NativeBeamDecoder, native_available,
    )
    if not native_available():
        pytest.skip("libasrbeam.so unavailable")
    arpa, trie, qtrie = lm_trio
    dec_t = NativeBeamDecoder(VOCAB, lexicon_file, arpa, lm_weight=1.5)
    for lm in (trie, qtrie):
        dec_b = NativeBeamDecoder(VOCAB, lexicon_file, lm, lm_weight=1.5)
        for seed in range(4):
            em = _noisy_emission(24, seed=seed)
            r_t = dec_t.decode_full(em, offset=5)
            r_b = dec_b.decode_full(em, offset=5)
            assert r_t["transcript"] == r_b["transcript"]
            assert abs(r_t["score"] - r_b["score"]) < 1e-3
            assert r_t["alignment"] == r_b["alignment"]


# --------------------------------------------------- real-asset validation

@pytest.mark.skipif(
    sniff(os.environ.get("ASR_KENLM_BIN", "/nonexistent"))
    not in ("TRIE", "QUANT_TRIE"),
    reason="set ASR_KENLM_BIN to a real `build_binary trie` output "
           "(and optionally ASR_KENLM_ARPA to its source ARPA)")
def test_real_kenlm_trie_loads():
    b = KenLMTrie(os.environ["ASR_KENLM_BIN"])
    assert b.order >= 2 and b.bound > 2
    s, _ = b.score(b.start_state(), b.words[min(2, len(b.words) - 1)])
    assert np.isfinite(s)
    if "ASR_KENLM_ARPA" in os.environ:
        t = ArpaLM.from_arpa(os.environ["ASR_KENLM_ARPA"])
        for w in b.words[1:64]:
            s_t, _ = t.score(("<s>",), w)
            s_b, _ = b.score(("<s>",), w)
            assert abs(s_t - s_b) < 1e-4
