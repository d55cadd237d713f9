"""EN (Emformer-RNNT) learned-weights golden loop: train -> checkpoint ->
serve exact transcripts through the full continuous-batching scheduler.

Counterpart of tests/test_overfit_e2e.py for the English path: overfits a
tiny RNNT (transcriber + layer-normed-LSTM predictor + joiner,
train/rnnt.py) on synthetic tone audio, round-trips the weights through
the npz checkpoint machinery, and serves them through the EN scheduler
branch — batched device greedy decode, delta-accumulating transcripts
(stream.apply_decode_en), decode-driven endpointing, final emission
(reference pipeline: streaming_decoder/streaming_server.py:441-465).

Task design notes:
  - each letter is a pure tone mapped to a word piece "▁x", so the space
    comes from the piece itself (no separator class to learn);
  - training uses ``streaming_features`` + the chunk-scanned transcriber
    (train/rnnt.py), i.e. the SERVING featurizer and encoder step —
    train == serve by construction, so EVERY trained sentence must
    round-trip the scheduler exactly (asserted below; the int16 upload
    quantization is the only train/serve delta and does not move the
    trained margins);
  - this loop is what exposed the cross-chunk greedy predictor-carry bug
    (conditioning on [..., last, last] after a chunk boundary — see
    tests/test_rnnt.py::test_greedy_cross_chunk_matches_oracle): every
    candidate truncated to its first word while per-frame probes showed
    the second token clearly, under BOTH featurizers.  Random-weight
    tests cannot see that failure mode.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from asr_streaming_tpu.models.asr import ASRConfig
from asr_streaming_tpu.models.rnnt import RNNTConfig, init_rnnt_params
from asr_streaming_tpu.models.serving import ServingConfig, init_serving_params
from asr_streaming_tpu.ops.frontend import MelConfig, make_mel_params
from asr_streaming_tpu.streaming.endpoint import EndpointRule
from asr_streaming_tpu.streaming.scheduler import Scheduler
from asr_streaming_tpu.train.rnnt import (
    RNNTBatch, make_rnnt_train_step, streaming_features,
)
from asr_streaming_tpu.utils.audio import EN_AUDIO
from asr_streaming_tpu.utils.checkpoint import load_params, save_params

SR = 16000
TONE_HZ = {"a": 350.0, "b": 700.0, "c": 1400.0, "d": 2100.0}
LETTERS = ["a", "b", "c", "d"]
# word pieces: "▁x" opens a new word, id == LETTERS index; final id = blank
PIECES = ["▁a", "▁b", "▁c", "▁d", "<b>"]
TONE_SEC, GAP_SEC = 0.24, 0.08
UTT_SECONDS = 1.92          # 12 EN chunks of 0.16 s
TRAIN_SENTENCES = ["a", "b", "c", "d",
                   "a b", "c d", "d a", "b c", "a c d", "b d"]
GOLDEN_CANDIDATES = ["a b", "c d", "d a", "b c"]


def _tone(ch: str) -> np.ndarray:
    t = np.arange(int(SR * TONE_SEC)) / SR
    wave = 0.3 * np.sin(2 * np.pi * TONE_HZ[ch] * t)
    ramp = np.minimum(1.0, np.arange(len(t)) / (0.010 * SR))
    return (wave * ramp * ramp[::-1]).astype(np.float32)


def _sentence_audio(s: str, total: float = UTT_SECONDS,
                    lead: float = 0.0) -> np.ndarray:
    parts = [np.zeros(int(SR * lead), np.float32)]
    for ch in s.replace(" ", ""):
        parts.extend([_tone(ch), np.zeros(int(SR * GAP_SEC), np.float32)])
    audio = np.concatenate(parts)
    assert len(audio) <= int(SR * total), (s, len(audio))
    return np.pad(audio, (0, int(SR * total) - len(audio)))


def _labels(s: str) -> list:
    return [LETTERS.index(w) for w in s.split(" ")]


CFG = RNNTConfig.tiny(vocab_size=len(PIECES))


def _serving_config() -> ServingConfig:
    asr = dataclasses.replace(ASRConfig.tiny(), audio=EN_AUDIO)
    # gates off: inter-tone gaps are digital silence; endpointing is
    # decode-driven (empty deltas grow trailing_blank_duration)
    return ServingConfig(asr=asr, model_kind="rnnt", rnnt=CFG,
                         use_silero=False, use_energy_gate=False,
                         energy_threshold_db=-200.0)


def _serve_events(rnnt_params: dict, sentence: str, vad_params=None,
                  **sched_kw):
    """Run one stream through a fresh EN scheduler; return its events.
    vad_params: trained Silero-shaped weights — serve with the real
    two-stage gate (use_silero=True), i.e. silence chunks are SKIPPED
    like production (reference streaming_server.py:400-411)."""
    scfg = _serving_config()
    if vad_params is not None:
        scfg = dataclasses.replace(scfg, use_silero=True)
    sparams = init_serving_params(jax.random.PRNGKey(1), scfg)
    for k, v in rnnt_params.items():
        sparams[k] = v
    if vad_params is not None:
        sparams["vad"] = vad_params
    # 0.8 s of trailing blanks ends the segment: above the intra-sentence
    # gaps, well below the ~1.5 s of silence after the sentence
    rules = {"trained": EndpointRule(True, 0.8, 0.0, float("inf"))}
    sched = Scheduler(sparams, scfg, PIECES, max_slots=2,
                      language="en", rules=rules, **sched_kw)
    st = sched.admit("t0")
    st.accept_waveform(_sentence_audio(sentence, total=3.84))
    st.add_tail_padding()
    return sched.drain()


def _finals(events):
    return [e.text.strip() for e in events if e.is_final]


def _serve_two_segments(rnnt_params: dict, sentence: str):
    """Two utterances in one stream (the two-segment test's scenario);
    returns the nonempty final transcripts."""
    scfg = _serving_config()
    sparams = init_serving_params(jax.random.PRNGKey(1), scfg)
    for k, v in rnnt_params.items():
        sparams[k] = v
    rules = {"trained": EndpointRule(True, 0.8, 0.0, float("inf"))}
    sched = Scheduler(sparams, scfg, PIECES, max_slots=2,
                      language="en", rules=rules)
    one = _sentence_audio(sentence, total=3.84)
    st = sched.admit("t0")
    st.accept_waveform(np.concatenate([one, one]))
    st.add_tail_padding()
    return [e.text.strip() for e in sched.drain()
            if e.is_final and e.text.strip()]


@pytest.fixture(scope="module")
def trained_vad_en():
    """Train the Silero-shaped VAD on THIS corpus's serving slices
    (energy self-labels) until chunk-level decisions are exact — the
    same acceptance-driven recipe as the vi loop's trained_vad
    (tests/test_overfit_e2e.py)."""
    import jax.numpy as jnp
    from asr_streaming_tpu.models.vad import silero_chunk_probs
    from asr_streaming_tpu.train.vad import (
        VadTrainConfig, train_vad, window_labels,
    )

    seg = EN_AUDIO.segment_length
    buf = EN_AUDIO.buffer_length
    T = buf + seg

    waves = []
    for s in TRAIN_SENTENCES:
        for off in (0.0, 0.48):
            audio = _sentence_audio(s, total=3.84, lead=off)
            padded = np.concatenate([np.zeros(buf, np.float32), audio])
            waves.extend(padded[k * seg:k * seg + T]
                         for k in range(len(audio) // seg))
    waves.append(np.zeros(T, np.float32))
    waves = np.stack(waves)
    labels = window_labels(waves, VadTrainConfig().silero)
    assert labels.any() and not labels.all()
    vcfg = VadTrainConfig(base_lr=3e-3)

    from tests.fixture_assets import load_asset
    asset = load_asset("overfit_rnnt_vad")
    if asset is not None:
        vparams, _meta = asset
        vparams = jax.tree.map(jnp.asarray, vparams)
        probs = np.asarray(silero_chunk_probs(vparams, vcfg.silero,
                                              jnp.asarray(waves)))
        if ((probs > 0.5).any(axis=1)
                == labels.astype(bool).any(axis=1)).all():
            return vparams

    for seed in (0, 1, 2):
        params, loss = train_vad(waves, labels, vcfg, steps=250,
                                 seed=seed)
        probs = np.asarray(silero_chunk_probs(params, vcfg.silero,
                                              jnp.asarray(waves)))
        if ((probs > 0.5).any(axis=1)
                == labels.astype(bool).any(axis=1)).all():
            return params
    raise AssertionError(f"EN VAD failed to learn (bce={loss})")


@pytest.fixture(scope="module")
def trained(trained_vad_en):
    """Overfit the tiny RNNT on SERVING-featurized audio; returns
    (params, loss, served, beam_golden) where served maps every candidate
    sentence to its final transcripts from the real scheduler and
    beam_golden is a candidate that ALSO round-trips the carried-
    hypothesis beam-partials mode exactly.

    Fast path: the committed asset (tools/make_test_fixtures.py) is
    loaded and the FULL acceptance suite re-runs on this host — served
    map over every candidate, the beam-partials round trip, and the
    two-segment reset — before the weights are trusted; any failure
    falls back to training."""
    from tests.fixture_assets import load_asset
    asset = load_asset("overfit_rnnt",
                       like=init_rnnt_params(jax.random.PRNGKey(0), CFG))
    if asset is not None:
        params, meta = asset
        served = {s: _finals(_serve_events(params, s))
                  for s in GOLDEN_CANDIDATES}
        exact = [s for s in GOLDEN_CANDIDATES if served[s] == [s]]
        beam_golden = meta.get("beam_golden")
        first = next((s for s in GOLDEN_CANDIDATES if served[s] == [s]),
                     None)
        ok = (exact and beam_golden in exact
              and _finals(_serve_events(params, beam_golden,
                                        en_beam_partials=True,
                                        en_beam_width=4,
                                        vad_params=trained_vad_en))
              == [beam_golden]
              and first is not None
              and _serve_two_segments(params, first) == [first, first])
        if ok:
            return params, float(meta["loss"]), served, beam_golden
        import logging
        logging.getLogger(__name__).warning(
            "overfit_rnnt asset failed re-verification — retraining")
    mel = dataclasses.replace(MelConfig.for_english(), n_mels=CFG.n_mels)
    mel_params = make_mel_params(mel)
    want = (CFG.emformer.segment_length
            + CFG.emformer.right_context_length) * 4
    # lead 0.48 s: after a mid-stream endpoint the slot resets and the
    # next utterance starts with a few chunks of silence already
    # processed — a silence-lead variant teaches that alignment (the
    # Emformer's silence state saturates within a couple of chunks, so
    # one lead generalizes to any post-reset gap; exercised by
    # test_two_segments_reset_and_serve)
    pairs = [(s, off) for s in TRAIN_SENTENCES for off in (0.0, 0.48)]
    waves = np.stack([_sentence_audio(s, lead=off) for s, off in pairs])
    feats = streaming_features(mel_params, mel, jnp.asarray(waves),
                               EN_AUDIO.segment_length,
                               EN_AUDIO.buffer_length, want)
    lab_lists = [_labels(s) for s, _ in pairs]
    umax = max(len(l) for l in lab_lists)
    targets = np.zeros((len(lab_lists), umax), np.int32)
    for i, l in enumerate(lab_lists):
        targets[i, :len(l)] = l
    batch = RNNTBatch(
        feats=feats,
        feat_lens=jnp.full((len(waves),), feats.shape[1], jnp.int32),
        targets=jnp.asarray(targets),
        target_lens=jnp.asarray([len(l) for l in lab_lists], jnp.int32))

    optimizer = optax.adam(3e-3)
    train_step = jax.jit(make_rnnt_train_step(CFG, optimizer))
    # seed sweep: seed 1 reaches 3e-4 by ~1500 steps and every candidate
    # serves exactly; later seeds are fallback against jax numerics drift
    for seed in (1, 0, 2):
        params = init_rnnt_params(jax.random.PRNGKey(seed), CFG)
        opt_state = optimizer.init(params)
        loss = None
        for step in range(2500):
            params, opt_state, loss = train_step(params, opt_state, batch)
            if step >= 100 and float(loss) < 3e-4:
                break
        served = {s: _finals(_serve_events(params, s))
                  for s in GOLDEN_CANDIDATES}
        exact = [s for s in GOLDEN_CANDIDATES if served[s] == [s]]
        # Beam-partials acceptance: the carried-hypothesis beam is this
        # fixture's weakest consumer — a marginally underfit joiner can
        # keep a non-blank path inside the beam on post-final silence
        # chunks (the gates are deliberately off here, so silence IS
        # decoded) and hallucinate extra finals where the greedy path is
        # exact.  Per the fixture rule (train until the assertion is
        # VERIFIABLY earned, not until a loss bar), accept only weights
        # where some candidate round-trips BOTH serving modes.
        beam_golden = next(
            (s for s in exact
             if _finals(_serve_events(params, s, en_beam_partials=True,
                                      en_beam_width=4,
                                      vad_params=trained_vad_en)) == [s]),
            None)
        # Two-segment acceptance: the consumer tests anchor on the FIRST
        # exact candidate, and a marginally-fit model can serve one
        # segment exactly yet drop the post-reset second one (a full-
        # suite run caught exactly this on weights whose single-segment
        # acceptance passed — ambient cross-module perturbation moved
        # the toy training trajectory).  Train-until-earned covers every
        # consumer or the seed is rejected.
        first = next((s for s in GOLDEN_CANDIDATES if served[s] == [s]),
                     None)
        two_ok = (first is not None
                  and _serve_two_segments(params, first) == [first, first])
        if exact and beam_golden is not None and two_ok:
            return params, float(loss), served, beam_golden
    raise AssertionError(f"no candidate served exactly in every mode: "
                         f"{served}")


def test_rnnt_overfit_converges(trained):
    _, loss, _, _ = trained
    assert loss < 0.01, f"tiny RNNT failed to overfit (loss={loss})"


def test_all_trained_sentences_serve_exactly(trained):
    """train == serve by construction (serving featurizer + serving
    encoder step + fixed greedy carry): every candidate must round-trip
    the real scheduler with its exact transcript as the one final."""
    _, _, served, _ = trained
    assert served == {s: [s] for s in GOLDEN_CANDIDATES}, served


def test_checkpoint_then_serve_exact_transcript(trained, tmp_path):
    """npz round trip, then the EN scheduler serves the trained weights:
    the endpoint rule fires a final with the exact transcript and the
    delta-accumulated partials build toward it monotonically."""
    params, _, served, _ = trained
    golden = next(s for s in GOLDEN_CANDIDATES if served[s] == [s])
    path = str(tmp_path / "rnnt_overfit.npz")
    save_params(path, params)
    loaded = load_params(path, like=params)

    events = _serve_events(loaded, golden)
    finals = _finals(events)
    partials = [e.text for e in events if not e.is_final]
    assert finals == [golden], (golden, finals, partials)
    # EN transcripts accumulate deltas (+= semantics,
    # stream.apply_decode_en): each nonempty partial extends the previous
    nonempty = [p.strip() for p in partials if p.strip()]
    assert nonempty, "no partials before the final"
    for prev, nxt in zip(nonempty, nonempty[1:]):
        assert nxt.startswith(prev), (prev, nxt)
    assert golden.startswith(nonempty[-1]) or nonempty[-1] == golden, \
        (golden, nonempty)


def test_beam_partials_mode_serves_golden(trained, trained_vad_en):
    """Opt-in carried-hypothesis beam partials (the reference's per-chunk
    RNNTBeamSearch.infer pattern) must agree with the greedy path on an
    overfit model: same exact final transcript for the golden sentence.
    This is the only beam-partials test that runs with LEARNED weights —
    the mode's other tests drive hypothesis plumbing with random params.
    Serves with the TRAINED VAD gating silence, like production
    (reference's beam only ever sees gated speech,
    streaming_server.py:400-411 before :445): ungated, a marginally-fit
    joiner can keep a non-blank path alive on the post-final silence
    chunks and hallucinate a duplicate final — observed flaking under
    cross-module perturbation; silence never reaches the beam in any
    real deployment, so the gated serve is both faithful and stable.
    The fixture's acceptance runs this exact gated call."""
    params, _, _, beam_golden = trained
    events = _serve_events(params, beam_golden,
                           en_beam_partials=True, en_beam_width=4,
                           vad_params=trained_vad_en)
    assert _finals(events) == [beam_golden], \
        (beam_golden, _finals(events),
         [e.text for e in events if not e.is_final])


def test_final_segment_rnnt_rescore_roundtrip(trained):
    """The EN server rescored finals with make_rnnt_rescorer: host beam
    over the segment's DEVICE-buffered transcriber encodings (packed-f16
    ring buffer -> _fetch_emission).  With learned weights the fetched
    encodings must beam-decode back to the golden transcript — the
    packing, the snapshot length accounting and the host beam all carry
    served data (reference final quality path, streaming_server.py:445)."""
    from asr_streaming_tpu.models.rnnt import make_rnnt_rescorer
    params, _, served, _ = trained
    golden = next(s for s in GOLDEN_CANDIDATES if served[s] == [s])
    events = _serve_events(params, golden)
    finals = [e for e in events if e.is_final and e.text.strip()]
    assert finals and finals[0].segment is not None
    seg = finals[0].segment
    assert seg.length > 0
    text = make_rnnt_rescorer(params, CFG, PIECES)(seg).strip()
    assert text == golden, (golden, text)


def test_two_segments_reset_and_serve(trained):
    """Continuous dictation on the EN path: two utterances in one
    stream.  The first final resets the slot (fresh Emformer state AND a
    fresh predictor at the blank-BOS convention — the reference leaves
    its hypothesis accumulating across segments, streaming_server.py:549
    commented out; we reset).  The second utterance must produce its own
    exact final, which with learned weights would catch a stale
    predictor carry or missed encoder reset."""
    params, _, served, _ = trained
    golden = next(s for s in GOLDEN_CANDIDATES if served[s] == [s])
    scfg = _serving_config()
    sparams = init_serving_params(jax.random.PRNGKey(1), scfg)
    for k, v in params.items():
        sparams[k] = v
    rules = {"trained": EndpointRule(True, 0.8, 0.0, float("inf"))}
    sched = Scheduler(sparams, scfg, PIECES, max_slots=2,
                      language="en", rules=rules)
    one = _sentence_audio(golden, total=3.84)
    st = sched.admit("t0")
    st.accept_waveform(np.concatenate([one, one]))
    st.add_tail_padding()
    events = sched.drain()
    finals = [e.text.strip() for e in events
              if e.is_final and e.text.strip()]
    assert finals == [golden, golden], \
        (finals, [(e.kind, e.text) for e in events])


def test_trained_tokens_beat_random(trained):
    """Sanity: random weights emit garbage or nothing on the same audio —
    the exact-transcript assertion above is earned by training, not by
    the test harness being permissive."""
    _, _, served, _ = trained
    golden = next(s for s in GOLDEN_CANDIDATES if served[s] == [s])
    rand = init_rnnt_params(jax.random.PRNGKey(99), CFG)
    finals = _finals(_serve_events(rand, golden))
    assert finals != [golden]
