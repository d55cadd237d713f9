"""EN reduced geometry (segment 8 / context 4 / bias 0 / framerate 1).

The reference ships a second EN audio geometry — 0.08 s decode segments
("Reduced from 16", asr-online-en.yaml:68-74).  These tests pin:

  * the derived chunk arithmetic, including the bias=0 offset guard
    (skip_silence's divide-by-zero fix, streaming/stream.py) and the
    framerate=1 initial offset;
  * the transcriber-segment derivation (models/rnnt.py
    rnnt_config_for_audio) and that configs/server-en-reduced.yaml loads
    into exactly this geometry;
  * random-weight scheduler behavior (decode + finals + batch
    invariance) at the reduced tick rate;
  * a LEARNED-weights golden loop: a tiny RNNT trained on
    serving-featurized 0.08 s chunks serves the exact transcript through
    the real scheduler — train == serve by construction at the reduced
    geometry too.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from asr_streaming_tpu.models.asr import ASRConfig
from asr_streaming_tpu.models.rnnt import (
    RNNTConfig, init_rnnt_params, rnnt_config_for_audio,
    transcriber_segment_frames,
)
from asr_streaming_tpu.models.serving import (
    ServingConfig, init_serving_params,
)
from asr_streaming_tpu.ops.frontend import MelConfig, make_mel_params
from asr_streaming_tpu.streaming.endpoint import EndpointRule
from asr_streaming_tpu.streaming.scheduler import Scheduler
from asr_streaming_tpu.streaming.stream import Stream
from asr_streaming_tpu.train.rnnt import (
    RNNTBatch, make_rnnt_train_step, streaming_features,
)
from asr_streaming_tpu.utils.audio import (
    AudioConfig, EN_AUDIO, EN_AUDIO_REDUCED,
)

SR = 16000


# ----------------------------------------------------------- arithmetic

def test_reduced_geometry_arithmetic():
    a = EN_AUDIO_REDUCED
    assert (a.segment_size, a.context_size, a.bias, a.framerate) == \
        (8, 4, 0, 1)
    assert a.segment_length == 1280           # 0.08 s of new audio
    assert a.buffer_length == 640             # 4 context frames, no bias
    assert a.chunk_length == 1920
    assert abs(a.segment_seconds - 0.08) < 1e-9
    assert a.emission_frames_per_chunk == 8   # framerate 1
    # framerate=1 initial offset: -(context//framerate + 1) = -5
    assert a.initial_offset == -5


def test_transcriber_segment_derivation():
    assert transcriber_segment_frames(EN_AUDIO) == 4
    assert transcriber_segment_frames(EN_AUDIO_REDUCED) == 2
    base = RNNTConfig.tiny()
    red = rnnt_config_for_audio(base, EN_AUDIO_REDUCED)
    assert red.emformer.segment_length == 2
    assert rnnt_config_for_audio(base, EN_AUDIO) is base  # seg 4 already


def test_bias_zero_skip_silence_no_offset_div():
    """bias=0 once divided by zero in the skip path — pin the guard:
    offsets only advance on the vi geometry (bias>0); EN skip_silence
    still accounts trailing silence."""
    for audio in (EN_AUDIO, EN_AUDIO_REDUCED):
        s = Stream(audio, ["<b>", "a"], language="en", stream_id="x")
        s.emission_length = 8        # pretend tokens were decoded
        off = s.offset
        s.skip_silence()             # must not raise, must not move offset
        assert s.offset == off
        assert s.trailing_blank_duration >= audio.segment_seconds


def test_config_file_loads_reduced_geometry():
    from asr_streaming_tpu.server.config import ServerSettings

    settings = ServerSettings.load("configs/server-en-reduced.yaml",
                                   env={})
    a = settings.audio
    assert (a.segment_size, a.context_size, a.bias, a.framerate) == \
        (8, 4, 0, 1)
    assert settings.language == "en"
    assert transcriber_segment_frames(a) == 2


# ------------------------------------------------- random-weight serving

REDUCED_CFG = rnnt_config_for_audio(RNNTConfig.tiny(), EN_AUDIO_REDUCED)
PIECES = ["▁t{}".format(i) for i in range(REDUCED_CFG.vocab_size - 1)] \
    + ["<b>"]
FLUSH_RULES = {"flush": EndpointRule(True, 0.0, 0.9, float("inf"))}


def make_reduced_scheduler(max_slots=3, seed=0):
    asr = dataclasses.replace(ASRConfig.tiny(), audio=EN_AUDIO_REDUCED)
    cfg = ServingConfig(asr=asr, model_kind="rnnt", rnnt=REDUCED_CFG,
                        use_silero=False)
    params = init_serving_params(jax.random.PRNGKey(seed), cfg)
    return Scheduler(params, cfg, PIECES, max_slots=max_slots,
                     language="en", rules=FLUSH_RULES)


def speechy(seconds, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(int(SR * seconds)) * 0.3).astype(
        np.float32)


def test_reduced_stream_decodes_and_finalizes():
    sched = make_reduced_scheduler()
    s = sched.admit("en0")
    s.accept_waveform(speechy(1.5))
    events = sched.drain()
    finals = [e for e in events if e.is_final]
    assert len(finals) >= 1
    assert s.chunk_processed_total >= 17      # 1.5 s / 0.08 s chunks


def test_reduced_batch_invariance():
    audio = [speechy(0.8, seed=i) for i in range(2)]
    solo = []
    for i in range(2):
        sched = make_reduced_scheduler(seed=3)
        st = sched.admit(f"s{i}")
        st.accept_waveform(audio[i])
        solo.append([(e.kind, e.text) for e in sched.drain()])
    sched = make_reduced_scheduler(seed=3)
    sts = [sched.admit(f"b{i}") for i in range(2)]
    for st, a in zip(sts, audio):
        st.accept_waveform(a)
    batched = [[], []]
    for e in sched.drain():
        batched[int(e.stream_id[1])].append((e.kind, e.text))
    assert batched == solo


# ------------------------------------------------------ golden loop @ 8

TONE_HZ = {"a": 350.0, "b": 900.0, " ": 2000.0}
VOCAB_G = ["▁a", "▁b", "<b>"]
SENTENCES = ["a", "b", "ab", "ba"]
GOLDEN_CANDIDATES = ["ab", "ba"]
UTT_SECONDS = 1.28


def _tone(ch: str) -> np.ndarray:
    t = np.arange(int(SR * 0.16)) / SR
    wave = 0.3 * np.sin(2 * np.pi * TONE_HZ[ch] * t)
    ramp = np.minimum(1.0, np.arange(len(t)) / (0.010 * SR))
    return (wave * ramp * ramp[::-1]).astype(np.float32)


def _sentence_audio(s: str, total: float = UTT_SECONDS,
                    lead: float = 0.0) -> np.ndarray:
    parts = [np.zeros(int(SR * lead), np.float32)]
    for ch in s:
        parts.extend([_tone(ch), np.zeros(int(SR * 0.08), np.float32)])
    audio = np.concatenate(parts)
    assert len(audio) <= int(SR * total)
    return np.pad(audio, (0, int(SR * total) - len(audio)))


def _labels(s: str) -> list:
    return [{"a": 0, "b": 1}[ch] for ch in s if ch != " "]


GCFG = dataclasses.replace(
    rnnt_config_for_audio(RNNTConfig.tiny(vocab_size=3), EN_AUDIO_REDUCED))


def _serve(params: dict, sentence: str):
    asr = dataclasses.replace(ASRConfig.tiny(), audio=EN_AUDIO_REDUCED)
    cfg = ServingConfig(asr=asr, model_kind="rnnt", rnnt=GCFG,
                        use_silero=False, use_energy_gate=False)
    sparams = init_serving_params(jax.random.PRNGKey(1), cfg)
    # rnnt param trees live FLAT at the serving top level
    # (init_serving_params `**init_rnnt_params(...)`)
    for k, v in params.items():
        sparams[k] = v
    rules = {"trained": EndpointRule(True, 0.4, 0.0, float("inf"))}
    sched = Scheduler(sparams, cfg, VOCAB_G, max_slots=2,
                      language="en", rules=rules)
    s = sched.admit("g0")
    s.accept_waveform(_sentence_audio(sentence, total=2.24))
    s.add_tail_padding()
    events = sched.drain()
    return [e.text.strip().replace("▁", "").replace(" ", "")
            for e in events if e.kind == "final" and e.text.strip()]


def _staged(audio: np.ndarray) -> np.ndarray:
    """The scheduler's int16 staging round trip (scheduler.py pcm16
    encode -> serving.py /32768 decode).  At this geometry the tiny
    model MUST train on it: 12-frame chunks of pure tones leave many
    mel bands near zero, where the quantization noise floor moves
    log-mel values by whole nats — enough to derail a 16-dim overfit
    model that never saw it (float-trained weights emitted garbage
    through the int16 serving path; probe in session notes)."""
    i16 = np.clip(audio * 32767.0, -32768, 32767).astype(np.int16)
    return i16.astype(np.float32) / 32768.0


@pytest.fixture(scope="module")
def trained_reduced():
    mel = dataclasses.replace(MelConfig.for_english(), n_mels=GCFG.n_mels)
    mel_params = make_mel_params(mel)
    want = (GCFG.emformer.segment_length
            + GCFG.emformer.right_context_length) * 4
    pairs = [(s, off) for s in SENTENCES for off in (0.0, 0.24)]
    waves = np.stack([_staged(_sentence_audio(s, lead=off))
                      for s, off in pairs])
    feats = streaming_features(mel_params, mel, jnp.asarray(waves),
                               EN_AUDIO_REDUCED.segment_length,
                               EN_AUDIO_REDUCED.buffer_length, want)
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
    train_step = jax.jit(make_rnnt_train_step(GCFG, optimizer))
    for seed in (1, 0, 2):
        params = init_rnnt_params(jax.random.PRNGKey(seed), GCFG)
        opt_state = optimizer.init(params)
        loss = None
        for step in range(2000):
            params, opt_state, loss = train_step(params, opt_state, batch)
            if step >= 100 and float(loss) < 5e-4:
                break
        golden = next((s for s in GOLDEN_CANDIDATES
                       if _serve(params, s) == [s]), None)
        if golden is not None:
            return params, float(loss), golden
    raise AssertionError(f"no candidate served exactly (loss={loss})")


def test_reduced_golden_loop(trained_reduced):
    """Exact transcript through the real scheduler at 0.08 s chunks."""
    params, loss, golden = trained_reduced
    assert loss < 5e-3
    assert _serve(params, golden) == [golden]
