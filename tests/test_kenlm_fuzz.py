"""Property-fuzz of the KenLM binary readers/writers (VERDICT r3 #4a).

The PROBING/TRIE/QUANT_TRIE readers and their twin writers were written
by the same hand from the same published-format notes, so fixed-fixture
tests can only prove internal consistency.  This suite attacks the
remaining surface in-image (no kenlm wheel exists here): many random
ARPA models — varied orders, vocabulary shapes (multi-byte UTF-8, long
tokens), backoff structures (positive / negative / exactly-0.0),
``<unk>`` placements inside higher-order n-grams, and quantization value
sets — are written to every binary family and scored against the text
scorer on random queries including OOV words and ``<unk>`` edge cases.

Invariants asserted per model:
  * text ArpaLM == PROBING == TRIE == QUANT_TRIE on every in-vocab query
    (states 0..order-1 long, including literal ``<unk>``), score and
    state length, plus ``finish``;
  * the three binary readers agree with EACH OTHER on OOV queries too
    (KenLM's id-0 fold differs from the string-keyed text scorer there
    by design — reference consumer recognition.py:236-245 sees the
    binary semantics);
  * trie enumeration round-trips the source n-gram table exactly;
  * trie -> probing conversion preserves all scores.

Default model count keeps the suite fast; crank ASR_KENLM_FUZZ_N (e.g.
2000) for a long soak.  Failures print the generating seed so any case
replays deterministically.
"""

import itertools
import math
import os
import random

import pytest

from asr_streaming_tpu.decode.beam import ArpaLM
from asr_streaming_tpu.decode.kenlm_binary import (
    KenLMBinary, write_probing_from, _Arpa,
)
from asr_streaming_tpu.decode.kenlm_trie import KenLMTrie, write_trie_from

N_MODELS = int(os.environ.get("ASR_KENLM_FUZZ_N", "24"))
N_QUERIES = 120

# Vocabulary pool: ASCII, Vietnamese diacritics, CJK, long tokens —
# exercises MurmurHash over multi-byte strings and the NUL-terminated
# strings section.
_POOL = (
    [f"w{i}" for i in range(40)]
    + ["tiếng", "việt", "người", "đường", "được", "nói", "không",
       "très", "café", "日本", "中文", "русский", "ελληνικά",
       "a" * 60, "x-y_z.7", "0", "%", "<<ch>>"]
)


def _random_arpa(rng: random.Random) -> _Arpa:
    """Random ARPA with lmplz-like closure: n-grams are the sliding
    windows of sampled sentences, so every prefix AND suffix of a stored
    n-gram is stored (the invariant the trie writer requires)."""
    order = rng.choice([2, 2, 3, 3, 4, 5])
    nwords = rng.randint(4, 18)
    vocab = rng.sample(_POOL, nwords)

    def rprob() -> float:
        return round(rng.uniform(-9.9, -0.1), 1)

    def rbackoff() -> float:
        r = rng.random()
        if r < 0.35:
            return 0.0                      # omitted-backoff path
        return round(rng.uniform(-3.0, 1.5), 1)  # positive backoffs legal

    grams_set = [set() for _ in range(order)]
    grams_set[0].add(("<unk>",))
    grams_set[0].add(("<s>",))
    grams_set[0].add(("</s>",))
    for _ in range(rng.randint(3, 18)):
        body = [rng.choice(vocab) for _ in range(rng.randint(1, 9))]
        if rng.random() < 0.3:      # <unk> inside a stored n-gram
            body[rng.randrange(len(body))] = "<unk>"
        sent = ["<s>"] + body + ["</s>"]
        for k in range(1, order + 1):
            for i in range(len(sent) - k + 1):
                grams_set[k - 1].add(tuple(sent[i:i + k]))

    grams = []
    for k in range(order):
        rows = []
        for ws in sorted(grams_set[k]):
            lp = -99.0 if ws == ("<s>",) else rprob()
            bo = rbackoff() if k < order - 1 else 0.0
            if ws[-1] == "</s>":
                bo = 0.0
            rows.append((ws, lp, bo))
        grams.append(rows)
    return _Arpa(order=order, counts=[len(g) for g in grams], grams=grams)


def _queries(rng: random.Random, arpa: _Arpa, with_oov: bool):
    in_vocab = sorted({ws[0] for ws, _, _ in arpa.grams[0]})
    pool = list(in_vocab)
    if with_oov:
        pool += ["OOV-A", "oov·β", "zzz" * 20]
    out = []
    for _ in range(N_QUERIES):
        state = tuple(rng.choice(pool)
                      for _ in range(rng.randint(0, arpa.order - 1)))
        out.append((state, rng.choice(pool)))
    # deterministic edge cases
    out += [((), "<unk>"), (("<unk>",) * (arpa.order - 1), "<unk>"),
            (("<s>",), in_vocab[0]), ((), "</s>"),
            (tuple(in_vocab[:arpa.order - 1]) or ("<s>",), "</s>")]
    return out


def _score_all(lm, queries):
    rows = []
    for state, w in queries:
        s, n = lm.score(state, w)
        rows.append((s, n, lm.finish(state + (w,))))
    return rows


def _assert_close(a, b, tag, seed, queries):
    for i, ((sa, na, fa), (sb, nb, fb)) in enumerate(zip(a, b)):
        st, w = queries[i]
        assert abs(sa - sb) < 2e-5, (tag, seed, st, w, sa, sb)
        assert na == nb, (tag, seed, st, w, na, nb)
        assert abs(fa - fb) < 2e-5, (tag, seed, st, w, fa, fb)


@pytest.mark.parametrize("seed", range(N_MODELS))
def test_fuzz_families_agree(seed, tmp_path):
    rng = random.Random(0xA5E5 + seed)
    arpa = _random_arpa(rng)

    probing = str(tmp_path / "lm.bin")
    rest = str(tmp_path / "lm.rest")
    trie = str(tmp_path / "lm.trie")
    qtrie = str(tmp_path / "lm.qtrie")
    write_probing_from(arpa, probing)
    write_probing_from(arpa, rest, model_type=1)   # REST_PROBING layout
    write_trie_from(arpa, trie)
    write_trie_from(arpa, qtrie, quantize=True)

    # text scorer needs an ARPA file
    arpa_path = tmp_path / "lm.arpa"
    lines = ["\\data\\"]
    lines += [f"ngram {k + 1}={c}" for k, c in enumerate(arpa.counts)]
    for k, rows in enumerate(arpa.grams):
        lines += ["", f"\\{k + 1}-grams:"]
        for ws, lp, bo in rows:
            g = " ".join(ws)
            lines.append(f"{lp}\t{g}" if (k == arpa.order - 1 or bo == 0.0)
                         else f"{lp}\t{g}\t{bo}")
    lines += ["", "\\end\\", ""]
    arpa_path.write_text("\n".join(lines), encoding="utf-8")

    text = ArpaLM.from_arpa(str(arpa_path))
    p = KenLMBinary(probing)
    r = KenLMBinary(rest)
    t = KenLMTrie(trie)
    q = KenLMTrie(qtrie)

    # ---- in-vocab queries: all four scorers identical
    iv = _queries(rng, arpa, with_oov=False)
    ref = _score_all(text, iv)
    _assert_close(ref, _score_all(p, iv), "text-vs-probing", seed, iv)
    _assert_close(ref, _score_all(r, iv), "text-vs-rest-probing", seed, iv)
    _assert_close(ref, _score_all(t, iv), "text-vs-trie", seed, iv)
    _assert_close(ref, _score_all(q, iv), "text-vs-qtrie", seed, iv)

    # ---- OOV queries: binary readers agree with each other (id-0 fold)
    ov = _queries(rng, arpa, with_oov=True)
    pref = _score_all(p, ov)
    _assert_close(pref, _score_all(r, ov), "probing-vs-rest-oov", seed, ov)
    _assert_close(pref, _score_all(t, ov), "probing-vs-trie-oov", seed, ov)
    _assert_close(pref, _score_all(q, ov), "probing-vs-qtrie-oov", seed, ov)

    # ---- trie enumeration round-trips the table exactly
    got = {ws: (lp, bo) for _, ws, lp, bo in t.iter_ngrams()}
    want = {ws: (lp, bo) for rows in arpa.grams for ws, lp, bo in rows}
    assert len(got) == len(want), seed
    for ws, (lp, bo) in want.items():
        glp, gbo = got[ws]
        assert abs(glp - lp) < 1e-5 and abs(gbo - bo) < 1e-5, (seed, ws)

    # ---- trie -> probing conversion preserves scores (every 4th model:
    # the conversion is the slow full enumeration path)
    if seed % 4 == 0:
        conv = str(tmp_path / "conv.bin")
        t.to_probing(conv)
        _assert_close(pref, _score_all(KenLMBinary(conv), ov),
                      "probing-vs-converted", seed, ov)


def test_fuzz_quantized_binning_lossy_but_ordered(tmp_path):
    """A model with MORE distinct values than the quant tables hold:
    scores come from the writer's own tables, so reader==writer binning
    is checked by re-scoring through the table (monotone, bounded error
    vs the unquantized trie)."""
    rng = random.Random(77)
    # dense distinct values: > 2**4 distinct probs at every order
    order = 3
    sents = []
    for _ in range(60):
        sents.append([rng.choice(_POOL[:12]) for _ in range(6)])
    grams_set = [set() for _ in range(order)]
    grams_set[0] |= {("<unk>",), ("<s>",), ("</s>",)}
    for body in sents:
        sent = ["<s>"] + body + ["</s>"]
        for k in range(1, order + 1):
            for i in range(len(sent) - k + 1):
                grams_set[k - 1].add(tuple(sent[i:i + k]))
    grams = []
    for k in range(order):
        rows = []
        for ws in sorted(grams_set[k]):
            lp = -99.0 if ws == ("<s>",) else round(rng.uniform(-9, -0.1), 6)
            bo = 0.0 if (k == order - 1 or ws[-1] == "</s>"
                         or rng.random() < 0.3) \
                else round(rng.uniform(-2, 1), 6)
            rows.append((ws, lp, bo))
        grams.append(rows)
    arpa = _Arpa(order=order, counts=[len(g) for g in grams], grams=grams)

    full = str(tmp_path / "full.trie")
    lossy = str(tmp_path / "lossy.qtrie")
    write_trie_from(arpa, full)
    write_trie_from(arpa, lossy, quantize=True, prob_bits=4, backoff_bits=4)
    t, q = KenLMTrie(full), KenLMTrie(lossy)
    queries = _queries(rng, arpa, with_oov=True)
    worst = 0.0
    for state, w in queries:
        st, _ = t.score(state, w)
        sq, _ = q.score(state, w)
        worst = max(worst, abs(st - sq))
    # 4-bit equal-count binning of U(-9,-0.1) log10 values: quantization
    # error is bounded by the widest bin (< ~1.3 nats here), and scores
    # must stay finite and negative-ish
    assert worst < 3.0 and worst > 0.0
    for state, w in queries:
        assert math.isfinite(q.score(state, w)[0])
