"""Production corpus wiring: real 804-token vocab + 17,950-entry lexicon.

The reference ships its Vietnamese corpus as package resources and loads
them with build_vocab/build_lexicon (reference: lightspeech/datas/text.py:
27-38).  These tests drive the tokenizer, lexicon trie, beam decoders, and
alignment over the REAL corpus files (resolved via
asr_streaming_tpu.text.corpus), not placeholders.

Note the real counts: the corpus files have NO trailing newline, so the
reference's ``read_text().split("\\n")`` — and our loader — yield 804
vocab entries (blank '-' at 0, silence '|' at 1; wc -l says 803), a
17,950-entry lexicon, and a 108-entry character vocab.
"""

import math

import numpy as np
import pytest

from asr_streaming_tpu.decode.alignment import force_align
from asr_streaming_tpu.decode.beam import (
    ArpaLM, LexiconBeamDecoder, build_trie,
)
from asr_streaming_tpu.decode.greedy import BLANK_ID, SILENCE_ID
from asr_streaming_tpu.text.corpus import (
    corpus_paths, find_corpus_dir, load_corpus,
)
from asr_streaming_tpu.text.tokenizer import tokenize

pytestmark = pytest.mark.skipif(find_corpus_dir() is None,
                                reason="no corpus dir available")


@pytest.fixture(scope="module")
def corpus():
    vocab, lexicon = load_corpus()
    assert vocab is not None and lexicon is not None
    return vocab, lexicon


def test_corpus_shapes(corpus):
    vocab, lexicon = corpus
    assert len(vocab) == 804
    assert vocab[BLANK_ID] == "-"
    assert vocab[SILENCE_ID] == "|"
    assert len(lexicon) == 17_950
    vset = set(vocab)
    for word, subwords in lexicon.items():
        assert subwords[-1] == "|", (word, subwords)
        for sw in subwords:
            assert sw in vset, (word, sw)


def test_character_corpus_variant():
    vocab, lexicon = load_corpus(character=True)
    assert vocab is not None and len(vocab) == 108
    assert vocab[0] == "-" and vocab[1] == "|"
    assert lexicon is not None and len(lexicon) >= 17_949


def test_tokenizer_roundtrip_real_lexicon(corpus):
    """tokenize(word) must reproduce the lexicon's subword sequence for
    in-lexicon words (reference datas/text.py builds the lexicon with the
    same tokenizer, so this is self-consistency over real data)."""
    vocab, lexicon = corpus
    words = sorted(lexicon)
    sample = words[:: max(1, len(words) // 300)]   # ~300 spread entries
    mismatches = []
    for w in sample:
        toks = tokenize(w, vocab, lexicon)
        want = [t for t in lexicon[w] if t != "|"]
        if toks != want:
            mismatches.append((w, toks, want))
    assert not mismatches, mismatches[:10]


def test_tokenizer_sentence_over_real_lexicon(corpus):
    vocab, lexicon = corpus
    words = [w for w in sorted(lexicon) if w.isalpha()][:6]
    sent = " ".join(words)
    toks = tokenize(sent, vocab, lexicon)
    want = []
    for i, w in enumerate(words):
        want.extend(t for t in lexicon[w] if t != "|")
        if i < len(words) - 1:
            want.append("|")
    assert toks == want


def test_trie_over_full_lexicon(corpus):
    vocab, lexicon = corpus
    tok2id = {t: i for i, t in enumerate(vocab)}
    trie = build_trie(lexicon, tok2id)
    # every lexicon word must be reachable and terminate exactly there
    for word in list(lexicon)[:: max(1, len(lexicon) // 500)]:
        node = trie
        for sw in lexicon[word]:
            node = node.children[tok2id[sw]]
        assert word in node.words


def _peaky_emission(token_ids, V, hot=-0.01, cold=-14.0):
    em = np.full((len(token_ids), V), cold, np.float32)
    for t, tok in enumerate(token_ids):
        em[t, tok] = hot
    return em


@pytest.fixture(scope="module")
def real_vocab_decoders(corpus, tmp_path_factory):
    """Python-oracle + native C++ decoders over the REAL vocab/lexicon and
    a small ARPA LM over real words."""
    vocab, lexicon = corpus
    words = [w for w in sorted(lexicon) if len(lexicon[w]) >= 3][:8]
    lm_dir = tmp_path_factory.mktemp("lm")
    arpa = lm_dir / "lm.arpa"
    n = len(words)
    lines = ["\\data\\", f"ngram 1={n + 2}", "", "\\1-grams:"]
    for i, w in enumerate(words):
        lines.append(f"{-0.3 - 0.05 * i:.2f}\t{w}\t-0.2")
    lines += ["-0.5\t</s>", "-99\t<s>\t-0.4", "", "\\end\\", ""]
    arpa.write_text("\n".join(lines))

    paths = corpus_paths()
    lm = ArpaLM.from_arpa(str(arpa))
    py = LexiconBeamDecoder(vocab, lexicon, lm, beam_size=50,
                            beam_size_token=5, beam_threshold=50.0,
                            lm_weight=1.0, word_score=0.5)
    from asr_streaming_tpu.decode.beam_native import (
        NativeBeamDecoder, native_available,
    )
    native = None
    if native_available():
        native = NativeBeamDecoder(vocab, paths["lexicon"], str(arpa),
                                   beam_size=50, beam_size_token=5,
                                   beam_threshold=50.0, lm_weight=1.0,
                                   word_score=0.5)
    return vocab, lexicon, words, py, native


def test_beam_decodes_real_words(real_vocab_decoders, corpus):
    vocab, lexicon, words, py, _ = real_vocab_decoders
    tok2id = {t: i for i, t in enumerate(vocab)}
    for w in words[:4]:
        ids = [tok2id[t] for t in lexicon[w]]
        em = _peaky_emission(ids, len(vocab))
        res = py.decode(em)
        assert [a["word"] for a in res.alignment] == \
            ["".join(lexicon[w][:-1])]


def test_beam_native_matches_oracle_on_real_vocab(real_vocab_decoders,
                                                  corpus):
    vocab, lexicon, words, py, native = real_vocab_decoders
    if native is None:
        pytest.skip("libasrbeam.so unavailable")
    tok2id = {t: i for i, t in enumerate(vocab)}
    rng = np.random.default_rng(0)
    for trial, w in enumerate(words):
        ids = [tok2id[t] for t in lexicon[w]]
        # interleave blanks + add noise so the beam actually works
        seq = []
        for i in ids:
            seq.extend([i, BLANK_ID])
        em = _peaky_emission(seq, len(vocab), hot=-0.05, cold=-9.0)
        em += rng.normal(0, 0.5, em.shape).astype(np.float32)
        em = em - np.log(np.exp(em).sum(-1, keepdims=True))
        got_py = py.decode(em, offset=3)
        got_cc = native.decode_full(em, offset=3)
        assert got_cc["alignment"] == got_py.alignment
        assert got_py.score == pytest.approx(got_cc["score"], rel=1e-3)


def test_alignment_with_real_silence_token(corpus):
    """Forced alignment over real vocab ids, incl. the real '|' separator
    (reference utils/alignment.py + recognition.py force_alignment)."""
    vocab, lexicon = corpus
    tok2id = {t: i for i, t in enumerate(vocab)}
    words = [w for w in sorted(lexicon) if len(lexicon[w]) >= 3][:2]
    ids, labels = [], []
    for w in words:
        ids.extend(tok2id[t] for t in lexicon[w])
        labels.extend(lexicon[w])
    # emission: each target token hot for 2 frames, blanks between
    frames = []
    for i in ids:
        frames.extend([i, i, BLANK_ID])
    em = _peaky_emission(frames, len(vocab), hot=-0.01, cold=-12.0)
    audio_seconds = len(frames) * 0.04
    token_segs, word_segs = force_align(em, ids, labels, audio_seconds)
    assert [s.label for s in token_segs] == labels
    assert [s.label for s in word_segs] == \
        ["".join(lexicon[w][:-1]) for w in words]
    starts = [s.start for s in token_segs]
    assert starts == sorted(starts)
    assert all(s.end >= s.start for s in word_segs)
    assert all(s.score > 1e-6 for s in token_segs)
