"""RNNT training: forward shapes + loss decreases."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from asr_streaming_tpu.models.rnnt import RNNTConfig, init_rnnt_params
from asr_streaming_tpu.train.rnnt import (
    RNNTBatch, make_rnnt_train_step, rnnt_loss_fn, transcriber_forward,
)

CFG = RNNTConfig.tiny()


def _batch(B=2, T_mel=40, U=4, seed=0):
    rng = np.random.default_rng(seed)
    return RNNTBatch(
        feats=jnp.asarray(rng.standard_normal((B, T_mel, CFG.n_mels)),
                          dtype=jnp.float32),
        feat_lens=jnp.full((B,), T_mel, jnp.int32),
        targets=jnp.asarray(rng.integers(0, CFG.blank, (B, U)),
                            dtype=jnp.int32),
        target_lens=jnp.full((B,), U, jnp.int32))


def test_transcriber_forward_shapes():
    params = init_rnnt_params(jax.random.PRNGKey(0), CFG)
    batch = _batch()
    enc = transcriber_forward(params, CFG, batch.feats)
    assert enc.shape == (2, 10, CFG.encoding_dim)
    loss = float(rnnt_loss_fn(params, CFG, batch))
    assert np.isfinite(loss) and loss > 0


def test_rnnt_training_reduces_loss():
    params = init_rnnt_params(jax.random.PRNGKey(1), CFG)
    optimizer = optax.adam(2e-3)
    step = jax.jit(make_rnnt_train_step(CFG, optimizer))
    opt_state = optimizer.init(params)
    batch = _batch(seed=3)
    losses = []
    for _ in range(10):
        params, opt_state, loss = step(params, opt_state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9
    assert np.isfinite(losses).all()


def test_rnnt_training_driver_tiny(tmp_path):
    """End-to-end RNNT training CLI on a synthetic manifest (char vocab)."""
    import json
    import wave as wave_mod

    import numpy as np

    rng = np.random.default_rng(0)
    entries = []
    for i in range(2):
        p = tmp_path / f"e{i}.wav"
        with wave_mod.open(str(p), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes((rng.standard_normal(8000) * 3000
                           ).astype(np.int16).tobytes())
        entries.append({"audio_filepath": str(p), "text": "hello world"})
    manifest = tmp_path / "en.jsonl"
    manifest.write_text("\n".join(json.dumps(e) for e in entries))

    from asr_streaming_tpu.train import rnnt as rnnt_mod
    rnnt_mod.main(["--manifest", str(manifest), "--steps", "2",
                   "--batch-size", "2", "--seconds", "0.5", "--tiny",
                   "--save", str(tmp_path / "rnnt.npz")])
    assert (tmp_path / "rnnt.npz").exists()


def test_spm_greedy_encode_roundtrip():
    from asr_streaming_tpu.models.rnnt import detokenize_pieces
    from asr_streaming_tpu.text.spm import encode_pieces
    pieces = ["<unk>", "▁the", "▁cat", "▁s", "at", "▁", "d", "o", "g"]
    ids = encode_pieces("the cat sat dog", pieces)
    assert detokenize_pieces(ids, pieces).strip() == "the cat sat dog"
    # unknown chars -> <unk>
    ids2 = encode_pieces("the ?", pieces)
    assert 0 in ids2
