"""Greedy decoder: incremental host decode == reference full-recompute."""

import numpy as np
import jax
import jax.numpy as jnp

from asr_streaming_tpu.decode.greedy import (
    StreamingGreedyDecoder, greedy_search_full, join_tokens,
)
from asr_streaming_tpu.models.asr import (
    ASRConfig, init_asr_params, init_asr_state, asr_stream_step,
    asr_offline_logprobs, frame_waveform,
)

VOCAB = ["-", "|"] + [chr(ord("a") + i) for i in range(19)]


def _reference_greedy(emission: np.ndarray):
    """Direct transliteration of the reference greedy_search semantics
    (recognition.py:33-57) in NumPy, recomputed over the full emission."""
    indices = emission.argmax(axis=1)
    last_blank = 0.04 * len(emission)
    tok = np.nonzero(indices > 1)[0]
    if len(tok):
        last_blank = (len(indices) - 1 - tok[-1]) * 0.04
    # unique_consecutive
    keep = np.ones(len(indices), bool)
    keep[1:] = indices[1:] != indices[:-1]
    collapsed = indices[keep]
    collapsed = collapsed[collapsed != 0]
    text = join_tokens([VOCAB[i] for i in collapsed])
    return text, last_blank


def test_incremental_matches_full_recompute():
    rng = np.random.default_rng(0)
    T, V = 160, len(VOCAB)
    # peaky emissions so argmax paths have repeats and blanks
    emission = rng.standard_normal((T, V)).astype(np.float32)
    emission[:, 0] += 1.0          # blank-heavy
    emission[40:60, 5] += 3.0      # a token run
    emission[90:95, 1] += 3.0      # silence run

    dec = StreamingGreedyDecoder(VOCAB)
    for start in range(0, T, 16):
        chunk = emission[start:start + 16]
        text_inc, blank_inc = dec.update(chunk.argmax(axis=1))
        text_full, blank_full = _reference_greedy(emission[:start + 16])
        assert text_inc == text_full
        assert abs(blank_inc - blank_full) < 1e-9


def test_greedy_full_wrapper():
    rng = np.random.default_rng(1)
    emission = rng.standard_normal((64, len(VOCAB))).astype(np.float32)
    assert greedy_search_full(emission, VOCAB) == _reference_greedy(emission)


def test_asr_step_and_offline_agree():
    cfg = ASRConfig.tiny()
    params = init_asr_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(2)
    wave = rng.standard_normal(16000 * 2).astype(np.float32) * 0.1

    chunks = frame_waveform(wave, cfg.audio)
    assert chunks.shape[1] == cfg.audio.chunk_length

    # streaming loop
    state = init_asr_state(cfg, 1)
    step = jax.jit(lambda w, s: asr_stream_step(params, cfg, w, s))
    outs = []
    for ch in chunks:
        out = step(jnp.asarray(ch)[None], state)
        state = out.state
        outs.append(np.asarray(out.log_probs[0]))
        # on-device argmax matches host argmax of the log-probs
        np.testing.assert_array_equal(
            np.asarray(out.argmax[0]), outs[-1].argmax(-1))
    streaming = np.concatenate(outs, axis=0)

    # offline scan of the same chunks
    offline = np.asarray(asr_offline_logprobs(
        params, cfg, jnp.asarray(chunks)[:, None, :])[0])
    np.testing.assert_allclose(offline, streaming, rtol=2e-5, atol=2e-5)
    # emission cadence: 16 frames per 0.64 s chunk
    assert streaming.shape[0] == len(chunks) * 16


def test_incremental_text_cache_matches_join_real_vocab():
    """The O(new-tokens) text cache == full join_tokens re-join over long
    random sequences on the PRODUCTION vocab (local-cleanup-safe path)."""
    from asr_streaming_tpu.text.corpus import load_corpus
    vocab, _ = load_corpus()
    if vocab is None:
        vocab = VOCAB
    rng = np.random.default_rng(7)
    dec = StreamingGreedyDecoder(vocab)
    assert dec._local_safe
    for _ in range(40):
        chunk = rng.integers(0, len(vocab), size=16)
        # bias toward blanks/silence like real emissions
        chunk[rng.random(16) < 0.6] = 0
        chunk[rng.random(16) < 0.2] = 1
        text, _ = dec.update(chunk)
        assert text == join_tokens([vocab[i] for i in dec.collapsed])


def test_incremental_text_cache_unsafe_vocab_falls_back():
    """Pieces with residual '<'/'>' can form '<<' across boundaries; the
    decoder must detect that and fall back to the exact full re-join."""
    vocab = ["-", "|", "a<", "<b", "c"]
    dec = StreamingGreedyDecoder(vocab)
    assert not dec._local_safe
    text, _ = dec.update(np.array([2, 3, 4]))
    # "a<" + "<b" + "c" -> "a<<bc" -> remove "<<" -> "abc"
    assert text == "abc"
    assert text == join_tokens([vocab[i] for i in dec.collapsed])


def test_incremental_text_cache_silence_edges():
    """Leading/trailing/multiple silences collapse exactly like the
    reference's strip + whitespace regex."""
    vocab = ["-", "|", "xy", "z|w"]
    dec = StreamingGreedyDecoder(vocab)
    seqs = [[1, 1, 2], [1, 1], [3], [1, 2, 1]]
    for s in seqs:
        dec.update(np.array(s))
        assert dec.text == join_tokens([vocab[i] for i in dec.collapsed])
    dec2 = StreamingGreedyDecoder(vocab)
    dec2.update(np.array([1, 1, 1]))
    assert dec2.text == ""
