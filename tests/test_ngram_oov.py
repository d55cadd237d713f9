"""N-gram LM library + OOV recognizer."""

import math

import pytest

from asr_streaming_tpu.text.ngram_lm import (
    KneserNeyInterpolated, MLE, NgramCounter, Vocabulary,
    WittenBellInterpolated, everygrams, ngrams, pad_sequence,
)
from asr_streaming_tpu.text.oov import OOVRecognizer, SpellIndex


def _fit(model, sents, order):
    model.fit(everygrams(pad_sequence(s, order), order) for s in sents)
    return model


SENTS = [["a", "b", "c"], ["a", "b", "d"], ["a", "b", "c"]]


def test_ngram_utils():
    assert list(ngrams(["x", "y", "z"], 2)) == [("x", "y"), ("y", "z")]
    assert ("x",) in set(everygrams(["x", "y"], 2))
    assert pad_sequence(["w"], 3)[:2] == ["<s>", "<s>"]


def test_mle_scores():
    lm = _fit(MLE(2), SENTS, 2)
    # P(c | b) = 2/3, P(d | b) = 1/3
    assert lm.score("c", ("b",)) == pytest.approx(2 / 3)
    assert lm.score("d", ("b",)) == pytest.approx(1 / 3)
    assert lm.score("a", ("b",)) == 0.0


def test_witten_bell_smooths():
    lm = _fit(WittenBellInterpolated(2), SENTS, 2)
    # unseen continuation gets backed-off mass, seen stays higher
    assert 0 < lm.score("a", ("b",)) < lm.score("c", ("b",))
    # probabilities over the support are <= 1
    assert lm.score("c", ("b",)) <= 1.0


def test_kneser_ney_discounts():
    lm = _fit(KneserNeyInterpolated(2, discount=0.5), SENTS, 2)
    assert lm.score("c", ("b",)) > lm.score("d", ("b",))
    assert lm.score("a", ("b",)) > 0  # continuation mass


def test_perplexity_orders_models():
    lm = _fit(WittenBellInterpolated(2), SENTS, 2)
    test_grams = list(everygrams(pad_sequence(["a", "b", "c"], 2), 2))
    bigrams = [g for g in test_grams if len(g) == 2]
    ppl = lm.perplexity(bigrams)
    assert 1.0 <= ppl < 50


def test_spell_index():
    idx = SpellIndex(max_edit_distance=2)
    idx.add("blockchain", 5)
    idx.add("blocking", 1)
    assert idx.lookup("blockchai") == "blockchain"
    assert idx.lookup("blockcain") == "blockchain"
    assert idx.lookup("zzzzzz") is None


def test_oov_recognizer_end_to_end():
    oov = OOVRecognizer([
        "chatgpt | chát gi pi ti, chat gpt",
        "bitcoin | bít coin",
    ])
    # spelling correction of a decoded OOV span
    assert oov.correct_spelling("mua <<bitcoi>> ngay") == "mua bitcoin ngay"
    # sound-like capture
    assert oov.capture_soundlike("dùng chát gi pi ti đi") == "dùng chatgpt đi"
    # combined
    assert oov("hỏi <<chatgp>> về bít coin") == "hỏi chatgpt về bitcoin"
    # char LM gives the enrolled continuation higher probability
    p_enrolled = oov.char_score("i", ("<<", "b", "i", "t", "c", "o"))
    p_random = oov.char_score("z", ("<<", "b", "i", "t", "c", "o"))
    assert p_enrolled > p_random


def test_spm_piece_extraction(tmp_path):
    """SentencePiece .model piece table via raw protobuf (EN detokenizer
    vocab; reference recognition.py:119)."""
    from asr_streaming_tpu.text.spm import (
        encode_test_model, load_spm_pieces,
    )
    from asr_streaming_tpu.models.rnnt import detokenize_pieces

    pieces = ["<unk>", "<s>", "</s>", "▁the", "▁cat", "s",
              "▁sát"]
    p = tmp_path / "spm.model"
    p.write_bytes(encode_test_model(pieces))
    got = load_spm_pieces(str(p))
    assert got == pieces
    assert detokenize_pieces([3, 4, 5], got, lstrip=True) == "the cats"
