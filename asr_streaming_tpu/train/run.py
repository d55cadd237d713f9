"""End-to-end CTC training driver: ``python -m asr_streaming_tpu.train.run``.

The reference keeps its training utilities unassembled in the v1 tree
(datasets/losses/schedulers with no runner; SURVEY.md §2.8); this driver
wires the framework's pieces into a working loop:

  JSONL manifest -> SpeechRecognitionDataset (real corpus tokenizer)
  -> duration-bucketed static-shape batches -> device log-mel
  -> CTC train step (optax noam/adamw) sharded over a ('data','model')
  mesh -> periodic npz checkpoints (server-loadable).

  python -m asr_streaming_tpu.train.run --manifest train.jsonl \
      [--steps 1000] [--batch-size 8] [--save ckpt.npz] [--resume ckpt.npz]
      [--model-parallel 1] [--tiny]
"""

from __future__ import annotations

import argparse
import logging
import time

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--manifest", required=True)
    parser.add_argument("--steps", type=int, default=1000)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--save", default="ckpt.npz")
    parser.add_argument("--save-every", type=int, default=500)
    parser.add_argument("--resume", default=None)
    parser.add_argument("--base-lr", type=float, default=1.0)
    parser.add_argument("--warmup-steps", type=int, default=10_000)
    parser.add_argument("--model-parallel", type=int, default=1)
    parser.add_argument("--token-bucket", type=int, default=256)
    parser.add_argument("--buckets-seconds", type=float, nargs="+",
                        default=[4.0, 8.0, 16.0, 32.0])
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--tiny", action="store_true",
                        help="tiny model geometry (tests/smoke)")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from asr_streaming_tpu.models.asr import ASRConfig, init_asr_params
    from asr_streaming_tpu.ops.frontend import log_mel
    from asr_streaming_tpu.parallel.mesh import (
        make_mesh, shard_batch, shard_params,
    )
    from asr_streaming_tpu.text.corpus import load_corpus
    from asr_streaming_tpu.text.vocab import placeholder_vocab
    from asr_streaming_tpu.train.ctc import (
        Batch, make_optimizer, make_train_step,
    )
    from asr_streaming_tpu.train.data import (
        SpeechRecognitionDataset, bucket_batches,
    )
    from asr_streaming_tpu.utils.checkpoint import load_params, save_params
    from asr_streaming_tpu.utils.compile_cache import enable_compile_cache

    if jax.default_backend() != "cpu":
        enable_compile_cache()
    logging.basicConfig(level=logging.INFO)
    log = logging.getLogger("train")

    vocab, lexicon = load_corpus()
    if args.tiny or vocab is None:
        vocab = vocab or placeholder_vocab(24)
    if lexicon is None:
        lexicon = {}
    import dataclasses
    if args.tiny:
        cfg = ASRConfig.tiny(vocab_size=len(vocab))
    else:
        cfg = ASRConfig.vietnamese()
        cfg = dataclasses.replace(cfg, encoder=dataclasses.replace(
            cfg.encoder, vocab_size=len(vocab)))

    dataset = SpeechRecognitionDataset(args.manifest, vocab, lexicon)
    log.info("dataset: %d examples, vocab %d", len(dataset), len(vocab))

    # data axis must divide the batch: use the largest device count that
    # does (a 2-sample smoke batch on an 8-device mesh runs on 2 devices)
    mp = args.model_parallel
    avail = len(jax.devices()) // mp
    dp = max(d for d in range(1, avail + 1) if args.batch_size % d == 0)
    mesh = make_mesh(dp * mp, model_parallel=mp)
    log.info("mesh: %s", mesh)

    params = init_asr_params(jax.random.PRNGKey(args.seed), cfg)
    if args.resume:
        params = load_params(args.resume, like=params)
        log.info("resumed from %s", args.resume)
    optimizer = make_optimizer(cfg, base_lr=args.base_lr,
                               warmup_steps=args.warmup_steps)

    mel = cfg.mel

    def featurize_and_step(params, opt_state, waves, wave_lens, tokens,
                           token_lens):
        feats = log_mel(params["frontend"], mel, waves)
        feat_lens = jnp.maximum(
            0, 1 + (wave_lens - mel.n_fft) // mel.hop_length)
        if cfg.encoder.stride > 1:
            feat_lens = feat_lens // cfg.encoder.stride
        batch = Batch(feats=feats, feat_lens=feat_lens.astype(jnp.int32),
                      labels=tokens, label_lens=token_lens)
        return make_train_step(cfg, optimizer)(params, opt_state, batch)

    step_fn = jax.jit(featurize_and_step)

    with mesh:
        params = shard_params(params, mesh)
        opt_state = optimizer.init(params["encoder"])
        step = 0
        t0 = time.time()
        while step < args.steps:
            for b in bucket_batches(dataset, args.batch_size,
                                    buckets_seconds=args.buckets_seconds,
                                    token_bucket=args.token_bucket,
                                    shuffle_seed=args.seed + step):
                sb = shard_batch(
                    (jnp.asarray(b.waves), jnp.asarray(b.wave_lens),
                     jnp.asarray(b.tokens), jnp.asarray(b.token_lens)),
                    mesh)
                params, opt_state, loss = step_fn(params, opt_state, *sb)
                step += 1
                if step % 10 == 0 or step == 1:
                    log.info("step %d  loss %.4f  (%.2f s/step)",
                             step, float(loss), (time.time() - t0) / step)
                if step % args.save_every == 0 or step >= args.steps:
                    save_params(args.save, jax.device_get(params))
                    log.info("saved %s @ step %d", args.save, step)
                if step >= args.steps:
                    break
        save_params(args.save, jax.device_get(params))
        log.info("done: %d steps, final loss %.4f", step, float(loss))
    return float(loss)


if __name__ == "__main__":
    main()
