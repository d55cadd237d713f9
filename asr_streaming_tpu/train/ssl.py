"""BEST-RQ self-supervised pretraining: masking, train step, driver.

The reference ships the pieces of this recipe unassembled — the random-
projection quantization loss (streaming_decoder_v1/lightspeech/modules/
criterion.py:47-96, ours train/losses.py::random_quantization_loss), the
unlabeled-audio dataset (v1 datas/dataset.py SpeechRepresentationDataset,
ours train/data.py), and the offline Squeezeformer encoder (v1 modules/
encoder.py:18-70, ours models/offline.py) — with no runner.  This module
wires them into the BEST-RQ procedure: mask contiguous feature spans
with noise, encode, and classify each masked frame's random-projection
codebook index with the AM-softmax head.  Projection and codebook stay
frozen (random) per BEST-RQ; the encoder and head train.

Run: ``python -m asr_streaming_tpu.train.ssl --manifest unlabeled.jsonl``
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from asr_streaming_tpu.models.offline import (
    SqueezeformerConfig, acoustic_encoder, init_acoustic_encoder_params,
)
from asr_streaming_tpu.models.encoder import _time_reduction
from asr_streaming_tpu.train.losses import (
    init_random_quantizer, random_quantization_loss,
)


@dataclasses.dataclass(frozen=True)
class SSLConfig:
    encoder: SqueezeformerConfig = dataclasses.field(
        default_factory=SqueezeformerConfig)
    # BEST-RQ masking: each frame starts a masked span with prob
    # mask_prob; spans cover mask_span consecutive feature frames
    # (40 x 10 ms = the paper's 400 ms at our 10 ms hop).
    mask_prob: float = 0.01
    mask_span: int = 40
    mask_noise_std: float = 0.1
    # random-projection quantizer (frozen) + AM-softmax head (trained)
    quantizer_size: int = 16
    codebook_size: int = 8192
    # feature->encoder time reduction of conv_subsampling (2x stride-2)
    reduction: int = 4

    @classmethod
    def tiny(cls) -> "SSLConfig":
        return cls(encoder=SqueezeformerConfig(
            d_model=32, num_layers=2, attn_num_heads=2, input_dim=16,
            subsampling_num_filters=8, conv_kernel_size=7),
            mask_span=8, codebook_size=64, quantizer_size=8)


def init_ssl_params(key: jax.Array, cfg: SSLConfig) -> tuple[dict, dict]:
    """Returns (trainable, frozen): the encoder + AM head train; the
    random projection/codebook are fixed buffers (the point of BEST-RQ)."""
    k1, k2 = jax.random.split(key)
    quant = init_random_quantizer(
        k2, feature_dim=cfg.encoder.input_dim * cfg.reduction,
        encoder_dim=cfg.encoder.d_model,
        quantizer_size=cfg.quantizer_size,
        vocabulary_size=cfg.codebook_size)
    trainable = {
        "encoder": init_acoustic_encoder_params(k1, cfg.encoder),
        "am": quant.pop("am"),
    }
    return trainable, quant  # quant == {"projection", "codebook"}


def span_mask(key: jax.Array, shape: tuple, prob: float, span: int,
              lens: Optional[jax.Array] = None) -> jax.Array:
    """[B, T] bool: spans of ``span`` frames seeded by Bernoulli starts."""
    starts = jax.random.bernoulli(key, prob, shape).astype(jnp.float32)
    mask = jax.lax.reduce_window(
        starts, 0.0, jax.lax.max, (1, span), (1, 1),
        padding=((0, 0), (span - 1, 0))) > 0
    if lens is not None:
        mask = mask & (jnp.arange(shape[1])[None, :] < lens[:, None])
    return mask


def ssl_loss_fn(trainable: dict, frozen: dict, cfg: SSLConfig,
                feats: jax.Array, lens: jax.Array, key: jax.Array
                ) -> jax.Array:
    """feats: [B, T, F] log-mel; lens: [B] valid frames."""
    k_mask, k_noise = jax.random.split(key)
    B, T, F = feats.shape
    mask = span_mask(k_mask, (B, T), cfg.mask_prob, cfg.mask_span, lens)
    noise = cfg.mask_noise_std * jax.random.normal(k_noise, feats.shape,
                                                   feats.dtype)
    masked = jnp.where(mask[..., None], noise, feats)

    enc, enc_lens = acoustic_encoder(trainable["encoder"], cfg.encoder,
                                     masked, lens, training=True)
    # quantization targets from the UNMASKED features at encoder rate
    red = _time_reduction(feats, cfg.reduction)      # [B, T//r, r*F]
    T4 = min(enc.shape[1], red.shape[1])
    red_mask = _time_reduction(
        mask[..., None].astype(jnp.float32), cfg.reduction
    ).max(axis=-1) > 0                               # [B, T//r]
    q = {"projection": frozen["projection"], "codebook": frozen["codebook"],
         "am": trainable["am"]}
    return random_quantization_loss(
        q, enc[:, :T4], jnp.minimum(enc_lens, T4), red[:, :T4],
        pos_mask=red_mask[:, :T4])


def make_ssl_train_step(cfg: SSLConfig, optimizer):
    """(trainable, frozen, opt_state, feats, lens, key) ->
    (trainable, opt_state, loss)."""
    import optax

    def train_step(trainable, frozen, opt_state, feats, lens, key):
        loss, grads = jax.value_and_grad(ssl_loss_fn)(
            trainable, frozen, cfg, feats, lens, key)
        updates, opt_state = optimizer.update(grads, opt_state, trainable)
        return optax.apply_updates(trainable, updates), opt_state, loss

    return train_step


# ----------------------------------------------------------------- driver

def main(argv=None):
    import argparse
    import logging
    import time

    import numpy as np
    import optax

    from asr_streaming_tpu.ops.frontend import (
        MelConfig, log_mel, make_mel_params,
    )
    from asr_streaming_tpu.train.data import SpeechRepresentationDataset
    from asr_streaming_tpu.utils.checkpoint import save_params

    parser = argparse.ArgumentParser()
    parser.add_argument("--manifest", required=True)
    parser.add_argument("--steps", type=int, default=1000)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--seconds", type=float, default=16.0,
                        help="fixed crop/pad length per example")
    parser.add_argument("--lr", type=float, default=3e-4)
    parser.add_argument("--save", default="ssl.npz")
    parser.add_argument("--save-every", type=int, default=500)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--tiny", action="store_true")
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO, format="%(message)s")
    log = logging.getLogger("ssl")

    cfg = SSLConfig.tiny() if args.tiny else SSLConfig()
    mel = MelConfig.for_vietnamese() if not args.tiny else \
        dataclasses.replace(MelConfig.for_vietnamese(),
                            n_mels=cfg.encoder.input_dim)
    mel_params = make_mel_params(mel)

    key = jax.random.PRNGKey(args.seed)
    key, k_init = jax.random.split(key)
    trainable, frozen = init_ssl_params(k_init, cfg)
    optimizer = optax.adamw(args.lr, weight_decay=1e-4)
    opt_state = optimizer.init(trainable)
    step = jax.jit(make_ssl_train_step(cfg, optimizer))
    featurize = jax.jit(lambda w: log_mel(mel_params, mel, w))

    ds = SpeechRepresentationDataset(args.manifest)
    n_samples = int(args.seconds * 16000)
    rng = np.random.default_rng(args.seed)
    order = rng.permutation(len(ds))
    waves = np.zeros((args.batch_size, n_samples), np.float32)
    lens_s = np.zeros(args.batch_size, np.int32)

    i = 0
    t0 = time.perf_counter()
    for it in range(args.steps):
        for b in range(args.batch_size):
            w = ds[int(order[i % len(ds)])]
            i += 1
            n = min(len(w), n_samples)
            waves[b, :n] = w[:n]
            waves[b, n:] = 0.0
            lens_s[b] = n
        feats = featurize(jnp.asarray(waves))
        frame_lens = jnp.asarray(lens_s // mel.hop_length, jnp.int32)
        key, k = jax.random.split(key)
        trainable, opt_state, loss = step(trainable, frozen, opt_state,
                                          feats, frame_lens, k)
        if it % 50 == 0 or it == args.steps - 1:
            log.info("step %d loss %.4f (%.2f s/step)", it, float(loss),
                     (time.perf_counter() - t0) / (it + 1))
        if args.save and (it + 1) % args.save_every == 0:
            save_params(args.save, {"trainable": trainable,
                                    "frozen": frozen})
    if args.save:
        save_params(args.save, {"trainable": trainable, "frozen": frozen})
        log.info("saved %s", args.save)


if __name__ == "__main__":
    main()
