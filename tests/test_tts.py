"""TTS synthesis path (linguistic encoder -> waveform decoder)."""

import numpy as np
import jax
import jax.numpy as jnp

from asr_streaming_tpu.models.tts import (
    TTSConfig, TTSModel, init_tts_params, synthesize,
)


def test_synthesize_shapes():
    cfg = TTSConfig.tiny()
    params = init_tts_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B, Tp = 2, 12
    tokens = jnp.asarray(rng.integers(1, 32, (B, Tp)), dtype=jnp.int32)
    lens = jnp.asarray([12, 8])
    words = jnp.asarray(np.repeat(np.arange(4), 3)[None].repeat(B, 0))
    durs = jnp.full((B, 4), 8, jnp.int32)    # 4 words x 8 frames

    audio, audio_lens, durs_pred = synthesize(params, cfg, tokens, lens,
                                              words, word_durs=durs)
    assert audio.shape[0] == B and audio.shape[1] == 1
    assert np.isfinite(np.asarray(audio)).all()
    # durations padded to the static word bound (Tp); first 4 are real
    assert durs_pred.shape == (B, Tp)
    assert int(audio_lens[0]) > 0


def test_tts_model_wrapper():
    model = TTSModel(TTSConfig.tiny(), seed=1)
    tokens = np.asarray([1, 2, 3, 4, 5, 6], np.int32)
    words = np.asarray([0, 0, 1, 1, 2, 2], np.int32)
    audio = model(tokens, words)
    assert audio.ndim == 1 and len(audio) > 0
    assert np.isfinite(audio).all()
