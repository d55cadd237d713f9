"""Speaker-ID (ECAPA-TDNN) training: AM-softmax classification + driver.

Assembles the reference's speaker lineage — the ECAPA embedding model
(ours models/ecapa.py; reference uses speechbrain's pretrained net,
streaming_server.py:192-196), the AdditiveMarginSoftmaxLoss (reference
streaming_decoder_v1/lightspeech/modules/criterion.py:12-45, ours
train/losses.py), and the SpeechClassificationDataset (v1
datas/dataset.py, ours train/data.py) — into a speaker-classification
training loop.  The trained embedding params drop straight into
``SpeakerVerifier`` (server `speaker_weights:`).

Run: ``python -m asr_streaming_tpu.train.speaker --manifest spk.jsonl``
(manifest lines: {"audio_filepath", "label"}).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from asr_streaming_tpu.models.ecapa import (
    EcapaConfig, ecapa_embed, init_ecapa_params,
)
from asr_streaming_tpu.train.losses import (
    additive_margin_softmax_loss, init_am_softmax_params,
)


@dataclasses.dataclass(frozen=True)
class SpeakerTrainConfig:
    ecapa: EcapaConfig = dataclasses.field(default_factory=EcapaConfig)
    num_speakers: int = 1000
    margin: float = 0.2
    scale: float = 30.0

    @classmethod
    def tiny(cls, num_speakers: int = 4) -> "SpeakerTrainConfig":
        return cls(ecapa=EcapaConfig.tiny(), num_speakers=num_speakers)


def init_speaker_params(key: jax.Array, cfg: SpeakerTrainConfig) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "ecapa": init_ecapa_params(k1, cfg.ecapa),
        "am": init_am_softmax_params(k2, cfg.ecapa.embedding_dim,
                                     cfg.num_speakers),
    }


def speaker_loss_fn(params: dict, cfg: SpeakerTrainConfig,
                    feats: jax.Array, feat_lens: jax.Array,
                    labels: jax.Array) -> jax.Array:
    emb = ecapa_embed(params["ecapa"], cfg.ecapa, feats, feat_lens,
                      training=True)
    loss, _preds = additive_margin_softmax_loss(
        params["am"], emb, labels, margin=cfg.margin, scale=cfg.scale)
    return loss


def make_speaker_train_step(cfg: SpeakerTrainConfig, optimizer):
    import optax

    def train_step(params, opt_state, feats, feat_lens, labels):
        loss, grads = jax.value_and_grad(speaker_loss_fn)(
            params, cfg, feats, feat_lens, labels)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

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
    from asr_streaming_tpu.train.data import SpeechClassificationDataset
    from asr_streaming_tpu.utils.checkpoint import save_params

    parser = argparse.ArgumentParser()
    parser.add_argument("--manifest", required=True)
    parser.add_argument("--steps", type=int, default=1000)
    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument("--seconds", type=float, default=3.0,
                        help="fixed crop/pad per example")
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--save", default="ecapa.npz")
    parser.add_argument("--save-every", type=int, default=500)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--tiny", action="store_true")
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO, format="%(message)s")
    log = logging.getLogger("speaker")

    ds = SpeechClassificationDataset(args.manifest)
    n_spk = len(ds.label_index)
    cfg = (SpeakerTrainConfig.tiny(n_spk) if args.tiny
           else SpeakerTrainConfig(num_speakers=n_spk))
    # SpeakerVerifier's frontend geometry (models/ecapa.py)
    mel = MelConfig(n_fft=512, win_length=400, hop_length=160,
                    n_mels=cfg.ecapa.n_mels, center=True)
    mel_params = make_mel_params(mel)

    params = init_speaker_params(jax.random.PRNGKey(args.seed), cfg)
    optimizer = optax.adamw(args.lr, weight_decay=1e-4)
    opt_state = optimizer.init(params)
    step = jax.jit(make_speaker_train_step(cfg, optimizer))
    featurize = jax.jit(lambda w: log_mel(mel_params, mel, w))

    n_samples = int(args.seconds * 16000)
    rng = np.random.default_rng(args.seed)
    order = rng.permutation(len(ds))
    waves = np.zeros((args.batch_size, n_samples), np.float32)
    lens_s = np.zeros(args.batch_size, np.int32)
    labels = np.zeros(args.batch_size, np.int32)

    i = 0
    t0 = time.perf_counter()
    for it in range(args.steps):
        for b in range(args.batch_size):
            w, lab = ds[int(order[i % len(ds)])]
            i += 1
            n = min(len(w), n_samples)
            waves[b, :n] = w[:n]
            waves[b, n:] = 0.0
            lens_s[b] = n
            labels[b] = lab
        feats = featurize(jnp.asarray(waves))
        frame_lens = jnp.asarray(
            np.minimum(lens_s // mel.hop_length + 1, feats.shape[1]),
            jnp.int32)
        params, opt_state, loss = step(params, opt_state, feats,
                                       frame_lens, jnp.asarray(labels))
        if it % 50 == 0 or it == args.steps - 1:
            log.info("step %d loss %.4f (%.2f s/step)", it, float(loss),
                     (time.perf_counter() - t0) / (it + 1))
        if args.save and (it + 1) % args.save_every == 0:
            save_params(args.save, params["ecapa"])
    if args.save:
        # save the embedding net in SpeakerVerifier-loadable layout
        save_params(args.save, params["ecapa"])
        log.info("saved %s", args.save)


if __name__ == "__main__":
    main()
