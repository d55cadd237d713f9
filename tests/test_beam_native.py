"""Native C++ beam decoder: builds, loads, and matches the Python oracle."""

import math

import numpy as np
import pytest

from asr_streaming_tpu.decode.beam import ArpaLM, LexiconBeamDecoder
from asr_streaming_tpu.decode.beam_native import (
    NativeBeamDecoder, native_available,
)

VOCAB = ["-", "|", "a", "b", "c"]
LEXICON = {
    "ab": ["a", "b", "|"],
    "ba": ["b", "a", "|"],
    "abc": ["a", "b", "c", "|"],
    "a": ["a", "|"],
}

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="libasrbeam.so unavailable")


@pytest.fixture(scope="module")
def lexicon_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("lex") / "lexicon.txt"
    p.write_text("\n".join(f"{w}\t{' '.join(toks)}"
                           for w, toks in LEXICON.items()))
    return str(p)


@pytest.fixture(scope="module")
def arpa_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("lm") / "lm.arpa"
    p.write_text(
        "\\data\\\nngram 1=6\nngram 2=2\n\n\\1-grams:\n"
        "-0.3\tab\t-0.2\n-0.9\tba\t-0.1\n-1.2\tabc\t0.0\n-0.8\ta\t-0.3\n"
        "-0.5\t</s>\n-99\t<s>\t-0.4\n\n"
        "\\2-grams:\n-0.1\tab ba\n-0.2\t<s> ab\n\n\\end\\\n")
    return str(p)


def peaky(path, V=5, hot=0.0, cold=-12.0):
    em = np.full((len(path), V), cold, np.float32)
    for t, tok in enumerate(path):
        em[t, tok] = hot
    return em


def noisy_emission(T, V=5, seed=0):
    rng = np.random.default_rng(seed)
    em = rng.standard_normal((T, V)).astype(np.float32)
    return np.log(np.exp(em) / np.exp(em).sum(-1, keepdims=True))


def test_native_matches_python_simple(lexicon_file):
    native = NativeBeamDecoder(VOCAB, lexicon_file)
    py = LexiconBeamDecoder(VOCAB, LEXICON)
    em = peaky([0, 2, 2, 0, 3, 1, 0])
    got = native.decode(em)
    want = py.decode(em).alignment
    assert got == want
    assert got[0]["word"] == "ab"


def test_native_matches_python_with_lm(lexicon_file, arpa_file):
    """On noisy emissions near-tie paths may differ in frame placement
    (float vs double accumulation), so equivalence is: same transcript on
    clear inputs, and best-path scores within tolerance on noisy ones."""
    native = NativeBeamDecoder(VOCAB, lexicon_file, arpa_file, lm_weight=1.5)
    lm = ArpaLM.from_arpa(arpa_file)
    py = LexiconBeamDecoder(VOCAB, LEXICON, lm=lm, lm_weight=1.5)

    # clear input: exact alignment match
    em = peaky([2, 3, 1, 3, 2, 1])
    got = native.decode_full(em, offset=7)
    want = py.decode(em, offset=7)
    assert got["transcript"] == want.transcript == "ab ba"
    assert got["alignment"] == want.alignment
    assert got["score"] == pytest.approx(want.score, rel=1e-4)

    # noisy inputs: best scores agree within float tolerance
    for seed in range(5):
        em = noisy_emission(40, seed=seed)
        got = native.decode_full(em, offset=7)
        want = py.decode(em, offset=7)
        assert got["score"] == pytest.approx(want.score, rel=1e-3,
                                             abs=1e-2), f"seed {seed}"
        assert [a["word"] for a in got["alignment"]] or not want.alignment


def test_native_offset_and_two_words(lexicon_file):
    native = NativeBeamDecoder(VOCAB, lexicon_file)
    em = peaky([2, 3, 1, 3, 2, 1])
    got = native.decode(em, offset=50)
    assert [g["word"] for g in got] == ["ab", "ba"]
    assert got[0]["beg"] == pytest.approx((0 + 50) * 0.04, abs=1e-6)


def test_native_empty_and_garbage(lexicon_file):
    native = NativeBeamDecoder(VOCAB, lexicon_file)
    # all-blank emission -> no words
    em = peaky([0, 0, 0, 0])
    assert native.decode(em) == []
    # single-frame emission
    assert isinstance(native.decode(peaky([2])), list)
