"""Silero-shaped VAD training: per-window BCE + self-labeling driver.

The reference ships Silero's pretrained ONNX and never trains a VAD
(vad_silero.py:12-23); importing those weights is covered by
``tools/onnx_weights.py`` + ``silero_params_from_onnx``.  This driver
exists for the complementary path: training the same v5-shaped graph
(models/vad.py) from scratch on labeled (or energy-self-labeled) audio,
so deployments without the ONNX asset can still run the two-stage gate
at full fidelity — and so the serving-side VAD routing
(``decode = active & (contain | (gate & silero))``, models/serving.py)
can be exercised end-to-end with LEARNED weights in the golden loop
(tests/test_overfit_e2e.py).

The decision geometry matches serving exactly: probabilities are
emitted per 512-sample window by ``silero_chunk_probs`` (64-sample
carried context, LSTM state reset at chunk start — reference
get_speech_probs, vad_silero.py:104-128).

Run: ``python -m asr_streaming_tpu.train.vad --manifest audio.jsonl``
(manifest lines: {"audio_filepath": ..., optional "label_windows":
[0/1, ...]}; windows without labels are self-labeled by frame energy).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from asr_streaming_tpu.models.vad import (
    SileroConfig, init_silero_params, silero_chunk_probs,
)


@dataclasses.dataclass(frozen=True)
class VadTrainConfig:
    silero: SileroConfig = dataclasses.field(default_factory=SileroConfig)
    base_lr: float = 1e-3
    weight_decay: float = 0.0
    # self-labeling: a window is speech when any 10 ms frame's peak
    # exceeds this linear amplitude (clean/synthetic audio assumption;
    # provide explicit label_windows for noisy corpora)
    label_amplitude: float = 0.01


def window_labels(wave: np.ndarray, cfg: SileroConfig,
                  amplitude: float = 0.01) -> np.ndarray:
    """Energy self-labels aligned with silero_chunk_probs windowing:
    window k covers samples [k*window, (k+1)*window) of the chunk.
    wave: [T] or [B, T] -> [n_win] / [B, n_win] float32 in {0, 1}."""
    squeeze = wave.ndim == 1
    if squeeze:
        wave = wave[None]
    B, T = wave.shape
    n_win = -(-T // cfg.window)
    pad = n_win * cfg.window - T
    w = np.pad(wave, ((0, 0), (0, pad)))
    peaks = np.abs(w.reshape(B, n_win, cfg.window)).max(axis=-1)
    labels = (peaks > amplitude).astype(np.float32)
    return labels[0] if squeeze else labels


def vad_loss_fn(params: dict, cfg: SileroConfig, waves: jax.Array,
                labels: jax.Array,
                mask: Optional[jax.Array] = None) -> jax.Array:
    """Per-window binary cross-entropy through the full serving forward
    (conv encoder + LSTM scan).  waves [B, T], labels [B, n_win]."""
    probs = silero_chunk_probs(params, cfg, waves)
    probs = jnp.clip(probs, 1e-6, 1.0 - 1e-6)
    bce = -(labels * jnp.log(probs) + (1.0 - labels) * jnp.log1p(-probs))
    if mask is not None:
        return jnp.sum(bce * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.mean(bce)


def make_optimizer(cfg: VadTrainConfig) -> optax.GradientTransformation:
    if cfg.weight_decay > 0.0:
        return optax.adamw(cfg.base_lr, weight_decay=cfg.weight_decay)
    return optax.adam(cfg.base_lr)


def make_train_step(cfg: VadTrainConfig, optimizer):
    def train_step(params: dict, opt_state, waves: jax.Array,
                   labels: jax.Array,
                   mask: Optional[jax.Array] = None):
        # the STFT basis is a fixed buffer, not a trainable weight
        loss, grads = jax.value_and_grad(vad_loss_fn)(
            params, cfg.silero, waves, labels, mask)
        grads["stft_basis"] = jnp.zeros_like(grads["stft_basis"])
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return train_step


def train_vad(waves: np.ndarray, labels: np.ndarray,
              cfg: VadTrainConfig = VadTrainConfig(), steps: int = 200,
              seed: int = 0, log_every: int = 0
              ) -> Tuple[dict, float]:
    """In-process convenience loop (the golden loop and CLI both use it).
    waves [N, T] float32, labels [N, n_win]; returns (params, loss)."""
    params = init_silero_params(jax.random.PRNGKey(seed), cfg.silero)
    optimizer = make_optimizer(cfg)
    opt_state = optimizer.init(params)
    step_fn = jax.jit(make_train_step(cfg, optimizer))
    w = jnp.asarray(waves, jnp.float32)
    l = jnp.asarray(labels, jnp.float32)
    loss = jnp.inf
    for step in range(steps):
        params, opt_state, loss = step_fn(params, opt_state, w, l)
        if log_every and step % log_every == 0:
            print(f"step {step}: bce {float(loss):.4f}")
    return params, float(loss)


def main() -> None:
    import argparse
    import json

    from asr_streaming_tpu.train.data import read_wav
    from asr_streaming_tpu.utils.checkpoint import save_params

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--manifest", required=True,
                    help="jsonl: {audio_filepath, optional label_windows}")
    ap.add_argument("--out", default="vad.npz")
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seconds", type=float, default=0.84,
                    help="training chunk length (serving window: 0.2 s "
                         "context + 0.64 s segment)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    cfg = VadTrainConfig(base_lr=args.lr)
    T = int(cfg.silero.sample_rate * args.seconds)
    waves, labels = [], []
    with open(args.manifest) as f:
        for line in f:
            if not line.strip():
                continue
            item = json.loads(line)
            audio, sr = read_wav(item["audio_filepath"])
            assert sr == cfg.silero.sample_rate, \
                f"expected {cfg.silero.sample_rate} Hz, got {sr}"
            for off in range(0, max(1, len(audio) - T + 1), T):
                chunk = np.zeros(T, np.float32)
                piece = audio[off:off + T]
                chunk[:len(piece)] = piece
                waves.append(chunk)
                if "label_windows" in item:
                    n_win = -(-T // cfg.silero.window)
                    lw = np.zeros(n_win, np.float32)
                    src = item["label_windows"][
                        off // cfg.silero.window:
                        off // cfg.silero.window + n_win]
                    lw[:len(src)] = src
                    labels.append(lw)
                else:
                    labels.append(window_labels(chunk, cfg.silero,
                                                cfg.label_amplitude))
    params, loss = train_vad(np.stack(waves), np.stack(labels), cfg,
                             steps=args.steps, seed=args.seed,
                             log_every=50)
    save_params(args.out, {"vad": params})
    print(f"saved {args.out} (final bce {loss:.4f}, "
          f"{len(waves)} chunks)")


if __name__ == "__main__":
    main()
