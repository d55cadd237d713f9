"""Lexicon+LM beam decoder on toy fixtures."""

import math

import numpy as np
import pytest

from asr_streaming_tpu.decode.beam import (
    ArpaLM, LexiconBeamDecoder, build_trie,
)

VOCAB = ["-", "|", "a", "b", "c"]
LEXICON = {
    "ab": ["a", "b", "|"],
    "ba": ["b", "a", "|"],
    "abc": ["a", "b", "c", "|"],
    "a": ["a", "|"],
}


def peaky_emission(path, V=5, hot=0.0, cold=-12.0):
    """path: list of token ids, one per frame."""
    T = len(path)
    em = np.full((T, V), cold, np.float32)
    for t, tok in enumerate(path):
        em[t, tok] = hot
    # renormalize-ish: keep as log-probs (approximately)
    return em


def test_trie_build():
    root = build_trie(LEXICON, VOCAB)
    a = root.children[2]
    assert a.children[1].words == ["a"]           # a | -> "a"
    assert a.children[3].children[1].words == ["ab"]
    assert a.children[3].children[4].children[1].words == ["abc"]


def test_simple_decode_with_timestamps():
    dec = LexiconBeamDecoder(VOCAB, LEXICON, lm=None, word_score=0.5)
    #        t:  0    1    2    3    4    5    6
    path = [0, 2, 2, 0, 3, 1, 0]  # - a a - b | -
    res = dec.decode(peaky_emission(path))
    assert res.transcript == "ab"
    # token emission timesteps: a@1, b@4, |@5
    assert res.tokens == [2, 3, 1]
    assert res.timesteps == [1, 4, 5]
    assert len(res.alignment) == 1
    wa = res.alignment[0]
    assert wa["word"] == "ab"
    assert wa["beg"] == round(1 * 0.04, 2)
    assert wa["end"] == round(5 * 0.04, 2)


def test_offset_shifts_timestamps():
    dec = LexiconBeamDecoder(VOCAB, LEXICON, lm=None)
    path = [2, 3, 1]
    res = dec.decode(peaky_emission(path), offset=100)
    assert res.alignment[0]["beg"] == round(100 * 0.04, 2)


def test_two_words():
    dec = LexiconBeamDecoder(VOCAB, LEXICON, lm=None)
    path = [2, 3, 1, 3, 2, 1]   # a b | b a |
    res = dec.decode(peaky_emission(path))
    assert res.transcript == "ab ba"
    assert [a["word"] for a in res.alignment] == ["ab", "ba"]


def test_lm_breaks_homophone_tie(tmp_path):
    """Two words share the token sequence; the LM must pick the likelier."""
    lexicon = {"ab": ["a", "b", "|"], "ab2": ["a", "b", "|"]}
    arpa = tmp_path / "lm.arpa"
    arpa.write_text(
        "\\data\\\nngram 1=4\n\n\\1-grams:\n"
        "-0.05\tab2\t0.0\n-2.0\tab\t0.0\n-0.5\t</s>\n-1.0\t<s>\t0.0\n"
        "\\end\\\n")
    lm = ArpaLM.from_arpa(str(arpa))
    dec = LexiconBeamDecoder(VOCAB, lexicon, lm=lm, lm_weight=2.0)
    res = dec.decode(peaky_emission([2, 3, 1]))
    assert res.transcript == "ab2"


def test_arpa_backoff_scoring(tmp_path):
    arpa = tmp_path / "lm.arpa"
    arpa.write_text(
        "\\data\\\nngram 1=3\nngram 2=1\n\n\\1-grams:\n"
        "-1.0\thello\t-0.5\n-1.3\tworld\t0.0\n-2.0\t</s>\n\n"
        "\\2-grams:\n-0.2\thello world\n\n\\end\\\n")
    lm = ArpaLM.from_arpa(str(arpa))
    assert lm.order == 2
    lp, state = lm.score(("hello",), "world")
    assert lp == pytest.approx(-0.2 * math.log(10))
    # backoff: P(hello | world) = backoff(world) + P(hello)
    lp2, _ = lm.score(("world",), "hello")
    assert lp2 == pytest.approx((-1.0 + 0.0) * math.log(10))
    # unseen word falls to <unk> floor
    lp3, _ = lm.score(("hello",), "zzz")
    assert lp3 < -20


def test_beam_prunes_but_recovers_best():
    """With a tight token beam the decoder must still find the clear path."""
    dec = LexiconBeamDecoder(VOCAB, LEXICON, lm=None, beam_size=4,
                             beam_size_token=2, beam_threshold=30.0)
    path = [2, 2, 3, 4, 1]  # a a b c | -> abc
    res = dec.decode(peaky_emission(path))
    assert res.transcript == "abc"
