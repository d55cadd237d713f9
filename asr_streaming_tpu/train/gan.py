"""TTS adversarial (vocoder) training: generator/discriminator steps + driver.

Assembles the reference's unassembled GAN training lineage — LS-GAN
losses + multi-resolution STFT loss (streaming_decoder_v1/lightspeech/
modules/criterion.py:119-253, ours train/losses.py), the MPD/MRSD
discriminators (v1 modules/discriminator.py:14-437, ours
models/discriminators.py), and the text->waveform TTS model (v1
models/synthesis.py, ours models/tts.py) — into working alternating
train steps with teacher-forced durations:

  gen:  MR-STFT(fake, real) * w_stft + LSGAN-gen(D(fake)) * w_adv
        + duration-prediction loss * w_dur
  disc: LSGAN-adv(D(fake.stop_grad), D(real))

Run: ``python -m asr_streaming_tpu.train.gan --manifest tts.jsonl``
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from asr_streaming_tpu.models.discriminators import (
    init_multi_period_discriminator, init_multi_resolution_discriminator,
    multi_period_discriminator, multi_resolution_discriminator,
)
from asr_streaming_tpu.models.tts import TTSConfig, init_tts_params, synthesize
from asr_streaming_tpu.train.losses import (
    least_squares_adversarial_loss, least_squares_generative_loss,
    multi_resolution_stft_loss, temporal_prediction_loss,
)


@dataclasses.dataclass(frozen=True)
class GANTrainConfig:
    tts: TTSConfig = dataclasses.field(default_factory=TTSConfig)
    stft_weight: float = 2.5
    adv_weight: float = 1.0
    dur_weight: float = 1.0
    # smaller resolutions for short training clips
    stft_resolutions: tuple = ((1024, 600, 120), (2048, 1200, 240),
                               (512, 240, 50))

    @classmethod
    def tiny(cls) -> "GANTrainConfig":
        return cls(tts=TTSConfig.tiny(),
                   stft_resolutions=((256, 128, 32), (128, 64, 16)))


def init_discriminators(key: jax.Array) -> tuple[dict, dict]:
    """Returns (trainable_params, static_meta): the periods/resolutions
    lists are static structure (shape-determining python ints), kept out
    of the differentiated pytree."""
    k1, k2 = jax.random.split(key)
    mpd = init_multi_period_discriminator(k1)
    mrd = init_multi_resolution_discriminator(k2)
    static = {"periods": mpd.pop("periods"),
              "resolutions": mrd.pop("resolutions")}
    return {"mpd": mpd, "mrd": mrd}, static


def _disc_outs(disc: dict, static: dict, wave: jax.Array):
    mpd_o, _ = multi_period_discriminator(
        {**disc["mpd"], "periods": static["periods"]}, wave)
    mrd_o, _ = multi_resolution_discriminator(
        {**disc["mrd"], "resolutions": static["resolutions"]}, wave)
    return mpd_o + mrd_o


def _generate(gen: dict, cfg: GANTrainConfig, batch) -> tuple:
    """Teacher-forced synthesis; returns (fake [B,T], durs_pred)."""
    audio, _audio_lens, durs_pred = synthesize(
        gen, cfg.tts, batch.tokens, batch.token_lens, batch.word_idxs,
        word_durs=batch.word_durs, training=True)
    return audio[:, 0, :], durs_pred


def gen_loss_fn(gen: dict, disc: dict, static: dict, cfg: GANTrainConfig,
                batch):
    fake, durs_pred = _generate(gen, cfg, batch)
    T = min(fake.shape[1], batch.audio.shape[1])
    real = batch.audio[:, :T]
    fake = fake[:, :T]
    lens = jnp.minimum(batch.audio_lens, T)
    stft = multi_resolution_stft_loss(fake, real, lens,
                                      resolutions=cfg.stft_resolutions)
    adv = least_squares_generative_loss(_disc_outs(disc, static, fake))
    Tw = batch.word_durs.shape[1]
    dur = temporal_prediction_loss(durs_pred[:, :Tw],
                                   batch.word_durs.astype(jnp.float32))
    loss = (cfg.stft_weight * stft + cfg.adv_weight * adv
            + cfg.dur_weight * dur)
    return loss, {"stft": stft, "adv": adv, "dur": dur, "fake": fake,
                  "real": real}


def disc_loss_fn(disc: dict, static: dict, fake: jax.Array,
                 real: jax.Array):
    return least_squares_adversarial_loss(
        _disc_outs(disc, static, fake), _disc_outs(disc, static, real))


def make_gan_train_steps(cfg: GANTrainConfig, gen_opt, disc_opt,
                         static: dict):
    """Returns (gen_step, disc_step), each jit-able.

    gen_step(gen, disc, gen_opt_state, batch)
        -> (gen, gen_opt_state, metrics, fake, real)
    disc_step(disc, disc_opt_state, fake, real)
        -> (disc, disc_opt_state, d_loss)
    """
    import optax

    def gen_step(gen, disc, opt_state, batch):
        (loss, aux), grads = jax.value_and_grad(
            gen_loss_fn, has_aux=True)(gen, disc, static, cfg, batch)
        updates, opt_state = gen_opt.update(grads, opt_state, gen)
        gen = optax.apply_updates(gen, updates)
        metrics = {"g_loss": loss, "stft": aux["stft"], "adv": aux["adv"],
                   "dur": aux["dur"]}
        return gen, opt_state, metrics, \
            jax.lax.stop_gradient(aux["fake"]), aux["real"]

    def disc_step(disc, opt_state, fake, real):
        d_loss, grads = jax.value_and_grad(disc_loss_fn)(disc, static,
                                                         fake, real)
        updates, opt_state = disc_opt.update(grads, opt_state, disc)
        return optax.apply_updates(disc, updates), opt_state, d_loss

    return gen_step, disc_step


# ----------------------------------------------------------------- driver

def main(argv=None):
    import argparse
    import logging
    import time

    import optax

    from asr_streaming_tpu.train.data import (
        SpeechSynthesisDataset, tts_batches,
    )
    from asr_streaming_tpu.utils.checkpoint import save_params

    parser = argparse.ArgumentParser()
    parser.add_argument("--manifest", required=True)
    parser.add_argument("--steps", type=int, default=1000)
    parser.add_argument("--batch-size", type=int, default=4)
    parser.add_argument("--gen-lr", type=float, default=2e-4)
    parser.add_argument("--disc-lr", type=float, default=2e-4)
    parser.add_argument("--save", default="tts.npz")
    parser.add_argument("--save-every", type=int, default=500)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--tiny", action="store_true")
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO, format="%(message)s")
    log = logging.getLogger("gan")

    cfg = GANTrainConfig.tiny() if args.tiny else GANTrainConfig()
    k1, k2 = jax.random.split(jax.random.PRNGKey(args.seed))
    gen = init_tts_params(k1, cfg.tts)
    disc, disc_static = init_discriminators(k2)
    gen_opt = optax.adamw(args.gen_lr, b1=0.8, b2=0.99)
    disc_opt = optax.adamw(args.disc_lr, b1=0.8, b2=0.99)
    gen_state = gen_opt.init(gen)
    disc_state = disc_opt.init(disc)
    gen_step, disc_step = make_gan_train_steps(cfg, gen_opt, disc_opt,
                                               disc_static)
    gen_step, disc_step = jax.jit(gen_step), jax.jit(disc_step)

    ds = SpeechSynthesisDataset(args.manifest)
    it = 0
    t0 = time.perf_counter()
    while it < args.steps:
        for batch in tts_batches(ds, args.batch_size,
                                 hop_length=cfg.tts.hop_length,
                                 max_frames=cfg.tts.max_frames,
                                 shuffle_seed=args.seed + it):
            gen, gen_state, metrics, fake, real = gen_step(
                gen, disc, gen_state, batch)
            disc, disc_state, d_loss = disc_step(disc, disc_state, fake,
                                                 real)
            if it % 50 == 0:
                log.info("step %d g=%.4f (stft %.3f adv %.3f dur %.3f) "
                         "d=%.4f (%.2f s/step)", it,
                         float(metrics["g_loss"]), float(metrics["stft"]),
                         float(metrics["adv"]), float(metrics["dur"]),
                         float(d_loss),
                         (time.perf_counter() - t0) / (it + 1))
            if args.save and (it + 1) % args.save_every == 0:
                save_params(args.save, gen)
            it += 1
            if it >= args.steps:
                break
    if args.save:
        save_params(args.save, gen)
        log.info("saved %s", args.save)


if __name__ == "__main__":
    main()
