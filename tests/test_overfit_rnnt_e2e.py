"""EN (Emformer-RNNT) learned-weights golden loop: train -> checkpoint ->
serve an exact transcript through the full continuous-batching scheduler.

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
  - utterances are trained at lead offsets {0, 0.04 s} — the EN serving
    path carries buffer_length=640 samples of wave context, shifting the
    chunk alignment vs the offline forward;
  - the EN frontend computes mel PER CHUNK with center=True padding
    (parity with torchaudio's streaming pipeline — see
    tests/test_en_frontend_chunks.py: interior frames match offline,
    chunk-edge frames differ).  The toy model is trained on offline
    features, so those edge frames make SOME two-word sentences lose
    their second word under streaming even at train loss 1e-4 — a toy-
    brittleness artifact, not a serving bug.  The fixture therefore
    trains until at least one candidate sentence round-trips the REAL
    scheduler exactly and anchors every assertion on that sentence,
    exactly like the CTC module's verified-candidate design.
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
from asr_streaming_tpu.ops.frontend import MelConfig, log_mel, make_mel_params
from asr_streaming_tpu.streaming.endpoint import EndpointRule
from asr_streaming_tpu.streaming.scheduler import Scheduler
from asr_streaming_tpu.train.rnnt import RNNTBatch, make_rnnt_train_step
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


def _serve_events(rnnt_params: dict, sentence: str, **sched_kw):
    """Run one stream through a fresh EN scheduler; return its events."""
    scfg = _serving_config()
    sparams = init_serving_params(jax.random.PRNGKey(1), scfg)
    for k, v in rnnt_params.items():
        sparams[k] = v
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


@pytest.fixture(scope="module")
def trained():
    """Overfit the tiny RNNT; returns (params, loss, golden sentence)
    where the golden sentence served EXACTLY through the real scheduler
    during fixture acceptance."""
    mel = dataclasses.replace(MelConfig.for_english(), n_mels=CFG.n_mels)
    mel_params = make_mel_params(mel)
    lead = EN_AUDIO.buffer_length / SR
    pairs = [(s, off) for s in TRAIN_SENTENCES for off in (0.0, lead)]
    waves = np.stack([_sentence_audio(s, lead=off) for s, off in pairs])
    feats = np.asarray(log_mel(mel_params, mel, jnp.asarray(waves)))
    lab_lists = [_labels(s) for s, _ in pairs]
    umax = max(len(l) for l in lab_lists)
    targets = np.zeros((len(lab_lists), umax), np.int32)
    for i, l in enumerate(lab_lists):
        targets[i, :len(l)] = l
    batch = RNNTBatch(
        feats=jnp.asarray(feats, jnp.float32),
        feat_lens=jnp.full((len(waves),), feats.shape[1], jnp.int32),
        targets=jnp.asarray(targets),
        target_lens=jnp.asarray([len(l) for l in lab_lists], jnp.int32))

    optimizer = optax.adam(3e-3)
    train_step = jax.jit(make_rnnt_train_step(CFG, optimizer))
    # Convergence sweep: seed 1 reaches loss 3e-4 by ~1500 steps and
    # serves "a b" exactly; seed 0/2 behave similarly but slower.
    best = (None, float("inf"), None)
    for seed in (1, 0, 2):
        params = init_rnnt_params(jax.random.PRNGKey(seed), CFG)
        opt_state = optimizer.init(params)
        loss = None
        for step in range(2500):
            params, opt_state, loss = train_step(params, opt_state, batch)
            # serve-probe periodically: acceptance is the REAL scheduler
            # round-tripping a candidate, not a loss bar
            if step >= 1000 and (step + 1) % 500 == 0:
                for cand in GOLDEN_CANDIDATES:
                    if _finals(_serve_events(params, cand)) == [cand]:
                        return params, float(loss), cand
        for cand in GOLDEN_CANDIDATES:
            if _finals(_serve_events(params, cand)) == [cand]:
                return params, float(loss), cand
        if float(loss) < best[1]:
            best = (params, float(loss), None)
    raise AssertionError(
        f"no candidate served exactly (best loss={best[1]})")


def test_rnnt_overfit_converges(trained):
    _, loss, _ = trained
    assert loss < 0.01, f"tiny RNNT failed to overfit (loss={loss})"


def test_checkpoint_then_serve_exact_transcript(trained, tmp_path):
    """npz round trip, then the EN scheduler serves the trained weights:
    the endpoint rule fires a final with the exact transcript and the
    delta-accumulated partials build toward it monotonically."""
    params, _, golden = trained
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


def test_beam_partials_mode_serves_golden(trained):
    """Opt-in carried-hypothesis beam partials (the reference's per-chunk
    RNNTBeamSearch.infer pattern) must agree with the greedy path on an
    overfit model: same exact final transcript for the golden sentence.
    This is the only beam-partials test that runs with LEARNED weights —
    the mode's other tests drive hypothesis plumbing with random params."""
    params, _, golden = trained
    events = _serve_events(params, golden,
                           en_beam_partials=True, en_beam_width=4)
    assert _finals(events) == [golden], \
        (golden, _finals(events),
         [e.text for e in events if not e.is_final])


def test_trained_tokens_beat_random(trained):
    """Sanity: random weights emit garbage or nothing on the same audio —
    the exact-transcript assertion above is earned by training, not by
    the test harness being permissive."""
    _, _, golden = trained
    rand = init_rnnt_params(jax.random.PRNGKey(99), CFG)
    finals = _finals(_serve_events(rand, golden))
    assert finals != [golden]
