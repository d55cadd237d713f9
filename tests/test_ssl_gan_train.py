"""BEST-RQ SSL pretraining (train/ssl.py) and TTS GAN training
(train/gan.py): steps run, losses are finite and improve, drivers work
end-to-end on synthetic manifests."""

import json
import wave as wave_mod

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from asr_streaming_tpu.train.ssl import (
    SSLConfig, init_ssl_params, make_ssl_train_step, span_mask, ssl_loss_fn,
)
from asr_streaming_tpu.train.gan import (
    GANTrainConfig, init_discriminators, init_tts_params,
    make_gan_train_steps,
)
from asr_streaming_tpu.train.data import (
    SpeechSynthesisDataset, TTSBatch, collate_tts, tts_batches,
)


# ------------------------------------------------------------------- SSL

def test_span_mask_shape_and_span():
    key = jax.random.PRNGKey(0)
    m = span_mask(key, (4, 100), prob=0.05, span=8,
                  lens=jnp.asarray([100, 50, 100, 10]))
    m = np.asarray(m)
    assert m.shape == (4, 100)
    assert not m[1, 50:].any() and not m[3, 10:].any()   # padding unmasked
    # spans: any masked run reachable from a start within `span` frames
    assert m.any()   # prob 0.05 x 400 positions: virtually certain


def test_ssl_loss_only_masked_positions():
    """Zero-prob masking -> empty pos_mask -> loss over zero positions
    (returns 0 by the clip guard), nonzero prob -> positive loss."""
    cfg = SSLConfig.tiny()
    key = jax.random.PRNGKey(0)
    trainable, frozen = init_ssl_params(key, cfg)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((2, 64, cfg.encoder.input_dim)),
                        jnp.float32)
    lens = jnp.asarray([64, 48], jnp.int32)

    loss = ssl_loss_fn(trainable, frozen, cfg, feats, lens,
                       jax.random.PRNGKey(1))
    assert np.isfinite(float(loss)) and float(loss) > 0

    nomask = dataclasses_replace(cfg, mask_prob=0.0)
    loss0 = ssl_loss_fn(trainable, frozen, nomask, feats, lens,
                        jax.random.PRNGKey(1))
    assert float(loss0) == 0.0


def dataclasses_replace(cfg, **kw):
    import dataclasses
    return dataclasses.replace(cfg, **kw)


def test_ssl_train_step_improves():
    cfg = dataclasses_replace(SSLConfig.tiny(), mask_prob=0.1)
    trainable, frozen = init_ssl_params(jax.random.PRNGKey(0), cfg)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(trainable)
    step = jax.jit(make_ssl_train_step(cfg, optimizer))

    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.standard_normal((2, 64, cfg.encoder.input_dim)),
                        jnp.float32)
    lens = jnp.asarray([64, 64], jnp.int32)
    losses = []
    for i in range(8):
        trainable, opt_state, loss = step(trainable, frozen, opt_state,
                                          feats, lens,
                                          jax.random.PRNGKey(42))  # same mask
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    # frozen quantizer stayed frozen
    assert isinstance(frozen, dict) and set(frozen) == {"projection",
                                                        "codebook"}


def test_ssl_driver_tiny(tmp_path):
    wavs = []
    rng = np.random.default_rng(0)
    for i in range(3):
        p = tmp_path / f"a{i}.wav"
        with wave_mod.open(str(p), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes((rng.standard_normal(16000) * 3000
                           ).astype(np.int16).tobytes())
        wavs.append(str(p))
    manifest = tmp_path / "ssl.jsonl"
    manifest.write_text("\n".join(
        json.dumps({"audio_filepath": p, "duration": 1.0}) for p in wavs))

    from asr_streaming_tpu.train import ssl as ssl_mod
    ssl_mod.main(["--manifest", str(manifest), "--steps", "2",
                  "--batch-size", "2", "--seconds", "1.0", "--tiny",
                  "--save", str(tmp_path / "ssl.npz")])
    assert (tmp_path / "ssl.npz").exists()


# ------------------------------------------------------------------- GAN

def _tts_batch(cfg: GANTrainConfig, B=2, Tp=12, seed=0) -> TTSBatch:
    rng = np.random.default_rng(seed)
    V = cfg.tts.linguistic.vocab_size
    tokens = rng.integers(1, V, (B, Tp)).astype(np.int32)
    # 4 words of 3 tokens each
    word_idxs = np.repeat(np.arange(Tp // 3), 3)[None].repeat(B, 0) \
        .astype(np.int32)
    word_durs = np.zeros((B, Tp), np.int32)
    word_durs[:, :Tp // 3] = rng.integers(8, 16, (B, Tp // 3))
    frames = word_durs.sum(1)
    audio = np.zeros((B, cfg.tts.max_frames * cfg.tts.hop_length),
                     np.float32)
    audio_lens = (frames * cfg.tts.hop_length).astype(np.int32)
    for b in range(B):
        audio[b, :audio_lens[b]] = \
            rng.standard_normal(audio_lens[b]).astype(np.float32) * 0.1
    return TTSBatch(tokens, np.full(B, Tp, np.int32), word_idxs,
                    word_durs, audio, audio_lens)


def test_gan_steps_run_and_update():
    cfg = GANTrainConfig.tiny()
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    gen = init_tts_params(k1, cfg.tts)
    disc, static = init_discriminators(k2)
    gen_opt = optax.adam(2e-4)
    disc_opt = optax.adam(2e-4)
    gen_state, disc_state = gen_opt.init(gen), disc_opt.init(disc)
    gen_step, disc_step = make_gan_train_steps(cfg, gen_opt, disc_opt,
                                               static)
    gen_step, disc_step = jax.jit(gen_step), jax.jit(disc_step)

    batch = _tts_batch(cfg)
    g0 = jax.tree.reduce(lambda a, x: a + float(jnp.sum(jnp.abs(x))),
                         gen, 0.0)
    for _ in range(2):
        gen, gen_state, metrics, fake, real = gen_step(gen, disc,
                                                       gen_state, batch)
        disc, disc_state, d_loss = disc_step(disc, disc_state, fake, real)
    for k in ("g_loss", "stft", "adv", "dur"):
        assert np.isfinite(float(metrics[k])), k
    assert np.isfinite(float(d_loss))
    g1 = jax.tree.reduce(lambda a, x: a + float(jnp.sum(jnp.abs(x))),
                         gen, 0.0)
    assert g0 != g1          # generator actually updated
    assert fake.shape == real.shape


def test_gan_driver_tiny(tmp_path):
    cfg = GANTrainConfig.tiny()
    rng = np.random.default_rng(0)
    entries = []
    for i in range(2):
        p = tmp_path / f"t{i}.wav"
        n = cfg.tts.max_frames * cfg.tts.hop_length // 2
        with wave_mod.open(str(p), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes((rng.standard_normal(n) * 3000
                           ).astype(np.int16).tobytes())
        entries.append({
            "audio_filepath": str(p),
            "tokens": rng.integers(
                1, cfg.tts.linguistic.vocab_size, 9).tolist(),
            "word_idxs": [0, 0, 0, 1, 1, 1, 2, 2, 2],
            "word_durations": rng.integers(8, 16, 3).tolist()})
    manifest = tmp_path / "tts.jsonl"
    manifest.write_text("\n".join(json.dumps(e) for e in entries))

    from asr_streaming_tpu.train import gan as gan_mod
    gan_mod.main(["--manifest", str(manifest), "--steps", "2",
                  "--batch-size", "2", "--tiny",
                  "--save", str(tmp_path / "tts.npz")])
    assert (tmp_path / "tts.npz").exists()


def test_tts_collate_shapes():
    cfg = GANTrainConfig.tiny()
    import json as _j
    # direct collate
    from asr_streaming_tpu.train.data import TTSExample
    ex = TTSExample(tokens=np.arange(1, 7, dtype=np.int32),
                    word_idxs=np.asarray([0, 0, 1, 1, 2, 2], np.int32),
                    word_durs=np.asarray([4, 5, 6], np.int32),
                    audio=np.zeros(1000, np.float32))
    b = collate_tts([ex, ex], token_bucket=16,
                    hop_length=cfg.tts.hop_length,
                    max_frames=cfg.tts.max_frames)
    assert b.tokens.shape == (2, 16)
    # pads must be NEGATIVE word ids (word_level_pooling's pad marker) —
    # 0-padding pooled every pad token into word 0
    assert (b.word_idxs[:, 6:] == -1).all()
    assert (b.word_idxs[:, :6] >= 0).all()
    assert b.audio.shape == (2, cfg.tts.max_frames * cfg.tts.hop_length)
    assert b.token_lens.tolist() == [6, 6]


# --------------------------------------------------------------- speaker

def test_speaker_train_step_improves():
    from asr_streaming_tpu.train.speaker import (
        SpeakerTrainConfig, init_speaker_params, make_speaker_train_step,
    )
    cfg = SpeakerTrainConfig.tiny(num_speakers=3)
    params = init_speaker_params(jax.random.PRNGKey(0), cfg)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    step = jax.jit(make_speaker_train_step(cfg, optimizer))
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((6, 50, cfg.ecapa.n_mels)),
                        jnp.float32)
    lens = jnp.full((6,), 50, jnp.int32)
    labels = jnp.asarray([0, 1, 2, 0, 1, 2], jnp.int32)
    losses = []
    for _ in range(6):
        params, opt_state, loss = step(params, opt_state, feats, lens,
                                       labels)
        losses.append(float(loss))
    assert all(np.isfinite(losses)) and losses[-1] < losses[0]


def test_speaker_driver_tiny(tmp_path):
    rng = np.random.default_rng(0)
    entries = []
    for i in range(4):
        p = tmp_path / f"s{i}.wav"
        with wave_mod.open(str(p), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes((rng.standard_normal(8000) * 3000
                           ).astype(np.int16).tobytes())
        entries.append({"audio_filepath": str(p), "label": f"spk{i % 2}"})
    manifest = tmp_path / "spk.jsonl"
    manifest.write_text("\n".join(json.dumps(e) for e in entries))

    from asr_streaming_tpu.train import speaker as spk_mod
    spk_mod.main(["--manifest", str(manifest), "--steps", "2",
                  "--batch-size", "2", "--seconds", "0.5", "--tiny",
                  "--save", str(tmp_path / "ecapa.npz")])
    # saved params load into the verifier's expected layout
    from asr_streaming_tpu.models.ecapa import (
        EcapaConfig, init_ecapa_params,
    )
    from asr_streaming_tpu.utils.checkpoint import load_params
    like = init_ecapa_params(jax.random.PRNGKey(0), EcapaConfig.tiny())
    loaded = load_params(str(tmp_path / "ecapa.npz"), like=like)
    assert jax.tree.structure(loaded) == jax.tree.structure(like)
