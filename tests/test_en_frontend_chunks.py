"""EN streaming frontend: chunk-window assembly + per-chunk mel fidelity.

The reference's EN path computes MelSpectrogram(center=True) PER CHUNK on
each (context+segment) window (reference recognition.py:122-133 — the
feature extractor runs inside ``EmformerRNNT.stream`` on ``speeches[0][0]``,
a 3200-sample window; torchaudio's own Emformer-RNNT streaming pipeline
does the same via its _ContextCacher).  Per-chunk reflect padding is
therefore the PARITY behavior, not a bug to fix: the checkpoint is served
this way upstream.  These tests pin:

  * the serving path's device window assembly (carried context + new
    segment) reproduces the reference's ring-buffer windows sample-exactly,
  * each chunk's mel features equal an independent torch.stft oracle of
    the reference pipeline (center pad, 21 frames, 20 kept),
  * interior frames (window centers >= n_fft/2 from the window edges)
    equal the pad-once-per-utterance offline features — the train/serve
    skew is confined to the chunk-edge frames by construction.
"""

import math

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from asr_streaming_tpu.models.serving import ServingConfig, _assemble_wave
from asr_streaming_tpu.models.asr import ASRConfig
from asr_streaming_tpu.ops.frontend import (
    MelConfig, log_mel, make_mel_params, mel_filterbank,
)
from asr_streaming_tpu.utils.audio import EN_AUDIO

HOP, NFFT = 160, 400
SEG = EN_AUDIO.segment_length            # 2560 samples (0.16 s)
CTX = EN_AUDIO.buffer_length             # 640 samples (4 frames)
WIN = CTX + SEG                          # 3200-sample chunk window


def _torch_reference_chunk_features(window: np.ndarray) -> np.ndarray:
    """The reference's per-chunk pipeline via torch.stft:
    MelSpectrogram(center=True) -> piecewise-linear-log(x * gain),
    trimmed to 20 frames (time_reduction keeps T//4*4)."""
    spec = torch.stft(
        torch.from_numpy(window).double(), n_fft=NFFT, hop_length=HOP,
        win_length=NFFT, window=torch.hann_window(NFFT, dtype=torch.float64),
        center=True, pad_mode="reflect", return_complex=True,
        onesided=True)
    power = spec.abs().numpy() ** 2                       # [F, frames]
    mel = power.T @ mel_filterbank(MelConfig.for_english())  # [frames, 80]
    gain = math.pow(10, 0.05 * (2 * 20 * math.log10(32767)))
    x = mel * gain
    out = np.where(x > math.e, np.log(np.maximum(x, 1e-20)), x / math.e)
    return out[:20].astype(np.float32)


@pytest.fixture(scope="module")
def stream_audio():
    rng = np.random.default_rng(7)
    return (rng.standard_normal(SEG * 4) * 0.2).astype(np.float32).clip(-1, 1)


def test_window_assembly_matches_ring_buffer(stream_audio):
    """_assemble_wave's carried context reproduces the reference's
    chunk windows: window c = audio[c*SEG - CTX : (c+1)*SEG], zero-padded
    history at stream start (reference stream.py ring buffer)."""
    cfg = ServingConfig(asr=ASRConfig.tiny())
    cfg = ServingConfig(
        asr=ASRConfig(audio=EN_AUDIO, encoder=cfg.asr.encoder))
    ctx = jnp.zeros((1, CTX), jnp.float32)
    for c in range(4):
        seg = stream_audio[c * SEG:(c + 1) * SEG]
        seg_i16 = jnp.asarray((seg * 32767.0).astype(np.int16))[None]
        wave, ctx = _assemble_wave(
            cfg, seg_i16, ctx, jnp.ones((1,), bool),
            jnp.asarray([c == 0]))
        start = c * SEG - CTX
        want = np.concatenate([
            np.zeros(max(0, -start), np.float32),
            stream_audio[max(0, start):(c + 1) * SEG]])
        got = np.asarray(wave[0])
        np.testing.assert_allclose(got, (want * 32767).astype(np.int16)
                                   / 32768.0, atol=1e-6)


def test_per_chunk_mel_matches_reference_oracle(stream_audio):
    cfg = MelConfig.for_english()
    params = make_mel_params(cfg)
    for c in range(1, 4):     # skip the zero-history first chunk
        window = stream_audio[c * SEG - CTX:(c + 1) * SEG]
        got = np.asarray(log_mel(params, cfg,
                                 jnp.asarray(window)[None])[0][:20])
        want = _torch_reference_chunk_features(np.asarray(window,
                                                          np.float64))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_interior_frames_equal_offline(stream_audio):
    """Frames whose analysis window lies inside the chunk (no reflect
    padding involved) are identical to the pad-once offline features —
    the per-chunk skew is confined to edge frames."""
    cfg = MelConfig.for_english()
    params = make_mel_params(cfg)
    offline = np.asarray(log_mel(params, cfg,
                                 jnp.asarray(stream_audio)[None])[0])
    pad = NFFT // 2
    c = 2
    start = c * SEG - CTX
    window = stream_audio[start:(c + 1) * SEG]
    chunk_feats = np.asarray(log_mel(params, cfg,
                                     jnp.asarray(window)[None])[0][:20])
    n_interior = 0
    for f in range(20):
        center = f * HOP           # local frame center (center=True)
        if center - pad >= 0 and center + pad < len(window):
            g = (start + center) // HOP       # global frame index
            np.testing.assert_allclose(chunk_feats[f], offline[g],
                                       rtol=1e-4, atol=1e-4)
            n_interior += 1
    assert n_interior >= 16        # only ~2 frames per edge are skewed
