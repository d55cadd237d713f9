"""Text-to-speech model (training-lineage TTS path).

Re-design of the reference's ``LightningTTS`` (reference:
streaming_decoder_v1/lightspeech/models/synthesis.py:21-198): tokenized
text -> LinguisticEncoder (phoneme/word Squeezeformer + duration predictor
+ length regulator + word->phoneme attention) -> WaveformDecoder
(Squeezeformer stack -> mag/phase -> iSTFT vocoder).  Trained with the
multi-resolution STFT + LS-GAN losses (train/losses.py) against the
discriminator zoo (models/discriminators.py).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from asr_streaming_tpu.models.offline import (
    LinguisticConfig, SqueezeformerConfig, init_linguistic_encoder_params,
    init_waveform_decoder_params, linguistic_encoder, waveform_decoder,
)
from asr_streaming_tpu.utils.checkpoint import load_params


@dataclasses.dataclass(frozen=True)
class TTSConfig:
    linguistic: LinguisticConfig = dataclasses.field(
        default_factory=LinguisticConfig)
    decoder: SqueezeformerConfig = dataclasses.field(
        default_factory=lambda: SqueezeformerConfig(
            d_model=256, num_layers=4, attn_num_heads=4,
            attn_max_pos_encoding=2048, conv_kernel_size=15))
    n_fft: int = 800
    win_length: int = 400
    hop_length: int = 160
    max_frames: int = 2048       # static bound for the length regulator

    @classmethod
    def tiny(cls) -> "TTSConfig":
        return cls(
            linguistic=LinguisticConfig(
                vocab_size=32, d_model=32, num_layers=1, attn_num_heads=4,
                attn_max_pos_encoding=128, conv_kernel_size=7),
            decoder=SqueezeformerConfig(
                d_model=32, num_layers=1, attn_num_heads=4,
                attn_max_pos_encoding=256, conv_kernel_size=7),
            n_fft=128, win_length=128, hop_length=32, max_frames=256)


def load_tar_checkpoint(filepath: str):
    """Load the reference's TTS tar checkpoint format (reference:
    streaming_decoder_v1/lightspeech/models/synthesis.py:21-37): a tarball
    holding ``config.yaml`` + ``encoder.pt`` + ``decoder.pt``.

    Returns (config_dict, encoder_state_dict, decoder_state_dict) with
    tensors as numpy arrays; callers map them onto init_tts_params-shaped
    trees (torch Linear weights need the usual [out,in]->[in,out]
    transpose).
    """
    import os
    import tarfile
    import tempfile

    import torch
    import yaml

    with tempfile.TemporaryDirectory() as tmpdir:
        with tarfile.open(filepath, "r") as tar:
            tar.extractall(path=tmpdir, filter="data")
        with open(os.path.join(tmpdir, "config.yaml")) as f:
            config = yaml.safe_load(f)

        def load_sd(name):
            blob = torch.load(os.path.join(tmpdir, name),
                              map_location="cpu", weights_only=False)
            sd = blob.get("state_dict", blob) if isinstance(blob, dict) \
                else blob
            return {k: np.asarray(v.detach().cpu().numpy()
                                  if hasattr(v, "detach") else v)
                    for k, v in sd.items()}

        return config, load_sd("encoder.pt"), load_sd("decoder.pt")


def init_tts_params(key: jax.Array, cfg: TTSConfig) -> dict:
    k1, k2 = jax.random.split(key)
    assert cfg.linguistic.d_model == cfg.decoder.d_model, \
        "linguistic/decoder dims must match"
    return {
        "linguistic": init_linguistic_encoder_params(k1, cfg.linguistic),
        "decoder": init_waveform_decoder_params(k2, cfg.decoder, cfg.n_fft),
    }


def synthesize(params: dict, cfg: TTSConfig, token_idxs: jax.Array,
               token_lens: jax.Array, word_idxs: jax.Array,
               word_durs: Optional[jax.Array] = None,
               training: bool = False
               ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Text -> waveform.

    Args:
      token_idxs: [B, Tp] phoneme/subword ids; word_idxs: [B, Tp] word
        indices per token (-1 padding); word_durs: optional ground-truth
        frame durations [B, Tw] (teacher forcing; else predicted).
    Returns:
      (audio [B, 1, T_samples], audio_lens [B], predicted_word_durs)
    """
    enc, enc_lens, durs_pred = linguistic_encoder(
        params["linguistic"], cfg.linguistic, token_idxs, token_lens,
        word_idxs, word_durs=word_durs, max_out=cfg.max_frames,
        training=training)
    audio, audio_lens = waveform_decoder(
        params["decoder"], cfg.decoder, enc,
        jnp.clip(enc_lens, 1, cfg.max_frames), cfg.n_fft, cfg.win_length,
        cfg.hop_length, training=training)
    return audio, audio_lens, durs_pred


class TTSModel:
    """Checkpoint-backed synthesis wrapper (reference LightningTTS)."""

    def __init__(self, cfg: TTSConfig, checkpoint: Optional[str] = None,
                 seed: int = 0):
        self.cfg = cfg
        self.params = init_tts_params(jax.random.PRNGKey(seed), cfg)
        if checkpoint:
            self.params = load_params(checkpoint, like=self.params)
        self._synth = jax.jit(
            lambda t, tl, w: synthesize(self.params, cfg, t, tl, w))

    def __call__(self, token_idxs: np.ndarray, word_idxs: np.ndarray
                 ) -> np.ndarray:
        tokens = jnp.asarray(token_idxs)[None]
        lens = jnp.asarray([token_idxs.shape[0]])
        words = jnp.asarray(word_idxs)[None]
        audio, audio_lens, _ = self._synth(tokens, lens, words)
        return np.asarray(audio[0, 0, :int(audio_lens[0])])
