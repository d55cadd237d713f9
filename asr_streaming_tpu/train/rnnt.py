"""RNN-T training for the English Emformer-RNNT model.

The reference's joint objective lives in ``SequenceToSequenceLoss``
(reference: streaming_decoder_v1/lightspeech/modules/criterion.py:86-126,
CTC + torchaudio rnnt_loss); here the RNNT forward is the same streaming
transcriber scanned over chunks (train == serve), the predictor consumes
blank-prepended targets, and the lattice loss is train/losses.rnnt_loss.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from asr_streaming_tpu.models.emformer import (
    emformer_forward, init_emformer_state,
)
from asr_streaming_tpu.models.encoder import _time_reduction
from asr_streaming_tpu.models.emformer import _layer_norm
from asr_streaming_tpu.models.rnnt import (
    PredictorState, RNNTConfig, joiner, predictor_step, transcriber_step,
)
from asr_streaming_tpu.train.losses import rnnt_loss


class RNNTBatch(NamedTuple):
    feats: jax.Array        # [B, T_mel, n_mels]
    feat_lens: jax.Array    # [B]
    targets: jax.Array      # [B, U] int32
    target_lens: jax.Array  # [B]


def transcriber_forward(params: dict, cfg: RNNTConfig, feats: jax.Array
                        ) -> jax.Array:
    """Offline transcriber: scan of the streaming step over chunks
    (identical math to serving).  Returns [B, T_out, encoding_dim]."""
    x = feats @ params["input_linear"]["w"]
    x = _time_reduction(x, 4)
    enc, _ = emformer_forward(params["emformer"], cfg.emformer, x)
    enc = enc[:, :x.shape[1]]
    p = params["enc_out"]
    return _layer_norm(enc @ p["w"] + p["b"], p["ln_scale"], p["ln_bias"])


def streaming_features(mel_params: dict, mel_cfg, waves: jax.Array,
                       segment_len: int, buffer_len: int, want: int
                       ) -> jax.Array:
    """Per-chunk features EXACTLY as the serving tick computes them.

    serving_step_rnnt (models/serving.py:353-391) assembles each chunk's
    wave as [carried buffer_len of context | segment_len new samples],
    runs center=True mel PER CHUNK (parity with torchaudio's streaming
    pipeline — the reference recomputes MelSpectrogram per chunk,
    recognition.py:122-133), and trims to ``want`` frames.  Training on
    features built the same way removes the chunk-edge skew between the
    offline featurizer and serving (tests/test_en_frontend_chunks.py
    documents the skew; it is confined to edge frames but a freshly
    trained model should not have to be robust to it).

    Args:
      waves: [B, n_samples] float audio; n_samples must be a multiple of
        segment_len (pad the tail like the serving flush does).
    Returns:
      [B, n_chunks, want, n_mels] — chunk axis ready for
      ``transcriber_forward_streaming`` / ``transcriber_step``.
    """
    from asr_streaming_tpu.ops.frontend import log_mel

    B, n = waves.shape
    n_chunks = n // segment_len
    segs = waves[:, :n_chunks * segment_len].reshape(B, n_chunks,
                                                     segment_len)
    # chunk i's context = tail of chunk i-1 (zeros for the first chunk:
    # _assemble_wave zeroes ctx on new_stream)
    ctx = jnp.concatenate(
        [jnp.zeros((B, 1, buffer_len), waves.dtype),
         segs[:, :-1, -buffer_len:]], axis=1)
    wins = jnp.concatenate([ctx, segs], axis=2)   # [B, C, buf+seg]
    feats = jax.vmap(lambda w: log_mel(mel_params, mel_cfg, w),
                     in_axes=1, out_axes=1)(wins)  # [B, C, F, n_mels]
    return feats[:, :, :want]


def transcriber_forward_streaming(params: dict, cfg: RNNTConfig,
                                  chunk_feats: jax.Array) -> jax.Array:
    """Transcriber over per-chunk features via the SERVING encoder step
    (transcriber_step scanned with carried EmformerState) — train==serve
    by construction, including the per-chunk right-context geometry.

    chunk_feats: [B, n_chunks, want, n_mels] from ``streaming_features``.
    Returns [B, n_chunks * segment_length, encoding_dim].
    """
    B = chunk_feats.shape[0]
    state0 = init_emformer_state(cfg.emformer, B)

    def step(state, feats_c):
        enc, state = transcriber_step(params, cfg, feats_c, state)
        return state, enc

    _, encs = jax.lax.scan(step, state0,
                           chunk_feats.transpose(1, 0, 2, 3))
    # [C, B, U, E] -> [B, C*U, E]
    C, _, U, E = encs.shape
    return encs.transpose(1, 0, 2, 3).reshape(B, C * U, E)


def predictor_forward(params: dict, cfg: RNNTConfig, targets: jax.Array
                      ) -> jax.Array:
    """Predictor over blank-prepended targets -> [B, U+1, encoding_dim]."""
    B, U = targets.shape
    bos = jnp.full((B, 1), cfg.blank, jnp.int32)
    tokens = jnp.concatenate([bos, targets], axis=1)      # [B, U+1]
    state = PredictorState(
        h=jnp.zeros((cfg.pred_layers, B, cfg.pred_hidden)),
        c=jnp.zeros((cfg.pred_layers, B, cfg.pred_hidden)))

    def step(state, tok):
        out, state = predictor_step(params, tok, state)
        return state, out

    _, outs = jax.lax.scan(step, state, tokens.T)
    return outs.transpose(1, 0, 2)                        # [B, U+1, E]


def rnnt_loss_fn(params: dict, cfg: RNNTConfig, batch: RNNTBatch
                 ) -> jax.Array:
    """Joint loss.  batch.feats is either [B, T_mel, n_mels] (offline
    featurizer) or [B, n_chunks, want, n_mels] (``streaming_features`` —
    the serving featurizer; batch.feat_lens then counts VALID CHUNKS)."""
    if batch.feats.ndim == 4:
        enc = transcriber_forward_streaming(params, cfg, batch.feats)
        t_lens = jnp.minimum(
            batch.feat_lens * cfg.emformer.segment_length, enc.shape[1])
    else:
        enc = transcriber_forward(params, cfg, batch.feats)  # [B, T, E]
        t_lens = jnp.minimum((batch.feat_lens - 1) // 4 + 1, enc.shape[1])
    pred = predictor_forward(params, cfg, batch.targets)     # [B, U+1, E]
    logits = joiner(params, enc[:, :, None, :], pred[:, None, :, :])
    return rnnt_loss(logits, t_lens, batch.targets, batch.target_lens,
                     blank=cfg.blank)


def make_rnnt_train_step(cfg: RNNTConfig,
                         optimizer: optax.GradientTransformation):
    def train_step(params, opt_state, batch: RNNTBatch):
        loss, grads = jax.value_and_grad(
            lambda p: rnnt_loss_fn(p, cfg, batch))(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


# ----------------------------------------------------------------- driver

def main(argv=None):
    """EN Emformer-RNNT training CLI:
    ``python -m asr_streaming_tpu.train.rnnt --manifest en.jsonl
      --spm spm_bpe_4096.model`` (or ``--tiny`` with a char vocab)."""
    import argparse
    import logging
    import time

    import numpy as np

    from asr_streaming_tpu.models.rnnt import init_rnnt_params
    from asr_streaming_tpu.ops.frontend import (
        MelConfig, log_mel, make_mel_params,
    )
    from asr_streaming_tpu.train.data import load_manifest, read_wav
    from asr_streaming_tpu.utils.checkpoint import save_params

    parser = argparse.ArgumentParser()
    parser.add_argument("--manifest", required=True)
    parser.add_argument("--spm", default=None,
                        help="SentencePiece .model (greedy encoding); "
                        "omit with --tiny for a character vocab")
    parser.add_argument("--steps", type=int, default=1000)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--seconds", type=float, default=8.0)
    parser.add_argument("--token-bucket", type=int, default=128)
    parser.add_argument("--lr", type=float, default=3e-4)
    parser.add_argument("--save", default="rnnt.npz")
    parser.add_argument("--save-every", type=int, default=500)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--tiny", action="store_true")
    parser.add_argument("--streaming-features", action="store_true",
                        help="featurize with the serving tick's per-chunk "
                        "mel (train == serve, no chunk-edge skew)")
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO, format="%(message)s")
    log = logging.getLogger("rnnt")

    entries = load_manifest(args.manifest)
    if args.spm:
        from asr_streaming_tpu.text.spm import encode_pieces, \
            load_spm_pieces
        pieces = load_spm_pieces(args.spm)

        def encode(text):
            return encode_pieces(text, pieces)
        vocab_size = len(pieces) + 1          # + blank (reference: 4097)
    else:
        chars = sorted({c for e in entries for c in e["text"].lower()})
        index = {c: i for i, c in enumerate(chars)}

        def encode(text):
            return [index[c] for c in text.lower() if c in index]
        vocab_size = len(chars) + 1

    cfg = RNNTConfig.tiny(vocab_size=max(vocab_size, 8)) if args.tiny \
        else RNNTConfig(vocab_size=vocab_size, blank=vocab_size - 1)
    mel = MelConfig.for_english()
    if cfg.n_mels != mel.n_mels:
        import dataclasses as _dc
        mel = _dc.replace(mel, n_mels=cfg.n_mels)
    mel_params = make_mel_params(mel)

    params = init_rnnt_params(jax.random.PRNGKey(args.seed), cfg)
    optimizer = optax.adamw(args.lr, weight_decay=1e-4)
    opt_state = optimizer.init(params)
    step = jax.jit(make_rnnt_train_step(cfg, optimizer))
    if args.streaming_features:
        # train on the SERVING featurizer (per-chunk center=True mel) —
        # no chunk-edge skew between training and the serving tick
        from asr_streaming_tpu.utils.audio import EN_AUDIO
        want = (cfg.emformer.segment_length
                + cfg.emformer.right_context_length) * 4
        featurize = jax.jit(lambda w: streaming_features(
            mel_params, mel, w, EN_AUDIO.segment_length,
            EN_AUDIO.buffer_length, want))
    else:
        featurize = jax.jit(lambda w: log_mel(mel_params, mel, w))

    n_samples = int(args.seconds * 16000)
    if args.streaming_features:
        n_samples -= n_samples % EN_AUDIO.segment_length  # whole chunks
    rng = np.random.default_rng(args.seed)
    order = rng.permutation(len(entries))
    waves = np.zeros((args.batch_size, n_samples), np.float32)
    wave_lens = np.zeros(args.batch_size, np.int32)
    targets = np.zeros((args.batch_size, args.token_bucket), np.int32)
    target_lens = np.zeros(args.batch_size, np.int32)

    i = 0
    t0 = time.perf_counter()
    for it in range(args.steps):
        for b in range(args.batch_size):
            e = entries[int(order[i % len(entries)])]
            i += 1
            w, _sr = read_wav(e["audio_filepath"])
            n = min(len(w), n_samples)
            waves[b, :n] = w[:n]
            waves[b, n:] = 0.0
            wave_lens[b] = n
            toks = encode(e["text"])[:args.token_bucket]
            targets[b, :len(toks)] = toks
            targets[b, len(toks):] = 0
            target_lens[b] = len(toks)
        feats = featurize(jnp.asarray(waves))
        if args.streaming_features:
            # feat_lens counts VALID CHUNKS in streaming mode
            from asr_streaming_tpu.utils.audio import EN_AUDIO
            frame_lens = jnp.asarray(np.minimum(
                -(-wave_lens // EN_AUDIO.segment_length), feats.shape[1]),
                jnp.int32)
        else:
            frame_lens = jnp.asarray(
                np.minimum(wave_lens // mel.hop_length + 1, feats.shape[1]),
                jnp.int32)
        batch = RNNTBatch(feats=feats, feat_lens=frame_lens,
                          targets=jnp.asarray(targets),
                          target_lens=jnp.asarray(target_lens))
        params, opt_state, loss = step(params, opt_state, batch)
        if it % 50 == 0 or it == args.steps - 1:
            log.info("step %d loss %.4f (%.2f s/step)", it, float(loss),
                     (time.perf_counter() - t0) / (it + 1))
        if args.save and (it + 1) % args.save_every == 0:
            save_params(args.save, params)
    if args.save:
        save_params(args.save, params)
        log.info("saved %s", args.save)


if __name__ == "__main__":
    main()
