"""Offline (non-streaming) encoders and auxiliary decoder heads.

Re-implementations of the reference's training-lineage models:

  * AcousticEncoder — Conv2d subsampling + N SqueezeformerBlocks with
    full-context masks (reference: lightspeech/modules/encoder.py:18-70)
  * LinguisticEncoder — phoneme/word two-level Squeezeformer encoder with
    duration predictor, length regulator and word->phoneme attention
    (encoder.py:150-274; TTS front half)
  * PredictorNetwork (GRU) + JointNetwork — RNN-T heads
    (modules/decoder.py:12-57)
  * WaveformDecoder — Squeezeformer + iSTFT vocoder (decoder.py:73-137)
  * TemporalPoolingDecoder — speaker-embedding head (decoder.py:140-159)
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from asr_streaming_tpu.models.emformer import _linear_init, _layer_norm
from asr_streaming_tpu.models.blocks import (
    conv_subsampling, init_subsampling_params,
    init_squeezeformer_block_params, squeezeformer_block,
)
from asr_streaming_tpu.ops.sequence import (
    compute_statistic, length_regulator, make_padding_mask,
    word_level_pooling,
)


@dataclasses.dataclass(frozen=True)
class SqueezeformerConfig:
    d_model: int = 256
    num_layers: int = 8
    attn_num_heads: int = 4
    attn_group_size: int = 1
    attn_max_pos_encoding: int = 512
    conv_kernel_size: int = 31
    input_dim: int = 128
    subsampling_num_filters: int = 128
    subsampling_kernel_size: int = 5


def init_acoustic_encoder_params(key, cfg: SqueezeformerConfig) -> dict:
    keys = jax.random.split(key, cfg.num_layers + 1)
    return {
        "subsampling": init_subsampling_params(
            keys[0], cfg.input_dim, cfg.d_model,
            cfg.subsampling_num_filters, cfg.subsampling_kernel_size),
        "layers": [init_squeezeformer_block_params(
            k, cfg.d_model, cfg.attn_num_heads, cfg.attn_group_size,
            cfg.attn_max_pos_encoding, cfg.conv_kernel_size)
            for k in keys[1:]],
    }


def _full_masks(lens: jax.Array, T: int):
    """attn mask [B,T,T] (True = masked) + conv mask [B,T] (True = masked),
    matching the reference mask construction (encoder.py:60-65)."""
    valid = make_padding_mask(lens, T)
    attn = valid[:, None, :] & valid[:, :, None]
    return ~attn, ~valid


def acoustic_encoder(params: dict, cfg: SqueezeformerConfig, x: jax.Array,
                     x_lens: jax.Array, training: bool = False
                     ) -> Tuple[jax.Array, jax.Array]:
    """Offline encoder forward (reference encoder.py:54-70)."""
    x, x_lens = conv_subsampling(params["subsampling"], x, x_lens, training)
    attn_mask, conv_mask = _full_masks(x_lens, x.shape[1])
    for layer in params["layers"]:
        x = squeezeformer_block(layer, x, attn_mask, conv_mask,
                                cfg.attn_num_heads, cfg.attn_group_size,
                                cfg.attn_max_pos_encoding, training)
    return x, x_lens


# -------------------------------------------------------- linguistic encoder

@dataclasses.dataclass(frozen=True)
class LinguisticConfig:
    vocab_size: int = 256
    d_model: int = 256
    num_layers: int = 4
    attn_num_heads: int = 4
    attn_group_size: int = 1
    attn_max_pos_encoding: int = 512
    conv_kernel_size: int = 15


def init_linguistic_encoder_params(key, cfg: LinguisticConfig) -> dict:
    keys = jax.random.split(key, 2 * cfg.num_layers + 5)
    emb = jax.random.normal(keys[0], (cfg.vocab_size, cfg.d_model)) * 1.0
    blocks_p = [init_squeezeformer_block_params(
        k, cfg.d_model, cfg.attn_num_heads, cfg.attn_group_size,
        cfg.attn_max_pos_encoding, cfg.conv_kernel_size)
        for k in keys[1:1 + cfg.num_layers]]
    blocks_w = [init_squeezeformer_block_params(
        k, cfg.d_model, cfg.attn_num_heads, cfg.attn_group_size,
        cfg.attn_max_pos_encoding, cfg.conv_kernel_size)
        for k in keys[1 + cfg.num_layers:1 + 2 * cfg.num_layers]]
    k_att, k_d1, k_d2, k_d3 = keys[-4:]
    wq, bq = _linear_init(k_att, cfg.d_model, 3 * cfg.d_model)
    kk = (cfg.conv_kernel_size - 1) // 2
    dur1 = _conv1d_init(k_d1, cfg.d_model, cfg.d_model, cfg.conv_kernel_size)
    dur2 = _conv1d_init(k_d2, cfg.d_model, cfg.d_model, cfg.conv_kernel_size)
    dur3 = _conv1d_init(k_d3, cfg.d_model, 1, 3)
    return {
        "embedding": emb,
        "phoneme_layers": blocks_p,
        "word_layers": blocks_w,
        "w2p_qkv": {"w": wq, "b": bq},
        "w2p_out": dict(zip(("w", "b"),
                            _linear_init(k_att, cfg.d_model, cfg.d_model))),
        "dur1": dur1, "dur2": dur2, "dur3": dur3,
        "dur_bn1": _bn_init(cfg.d_model), "dur_bn2": _bn_init(cfg.d_model),
    }


def _conv1d_init(key, cin, cout, k):
    bound = 1.0 / math.sqrt(cin * k)
    w = jax.random.uniform(key, (cout, cin, k), minval=-bound, maxval=bound)
    return {"w": w, "b": jnp.zeros(cout)}


def _bn_init(dim):
    return {"scale": jnp.ones((dim, 1)), "bias": jnp.zeros((dim, 1)),
            "mean": jnp.zeros((dim, 1)), "var": jnp.ones((dim, 1))}


def _conv1d(p, x, padding="SAME"):
    y = jax.lax.conv_general_dilated(
        x, p["w"], (1,), padding,
        dimension_numbers=("NCW", "OIW", "NCW"))
    return y + p["b"][:, None]


def _bn1d(p, x, training):
    if training:
        mean = jnp.mean(x, axis=(0, 2), keepdims=True)[0]
        var = jnp.var(x, axis=(0, 2), keepdims=True)[0]
    else:
        mean, var = p["mean"], p["var"]
    return ((x - mean) * jax.lax.rsqrt(var + 1e-5)) * p["scale"] + p["bias"]


def linguistic_encoder(params: dict, cfg: LinguisticConfig,
                       token_idxs: jax.Array, token_lens: jax.Array,
                       word_idxs: jax.Array,
                       word_durs: Optional[jax.Array] = None,
                       max_out: Optional[int] = None,
                       training: bool = False):
    """Phoneme encode -> duration predict -> word pool/encode -> length
    regulate -> word->phoneme attention (reference encoder.py:209-274).

    Returns (w_enc_outs, w_enc_lens, predicted_word_durs).
    """
    B, Tp = token_idxs.shape
    p_embs = params["embedding"][token_idxs]
    attn_mask, conv_mask = _full_masks(token_lens, Tp)

    h = p_embs
    for layer in params["phoneme_layers"]:
        h = squeezeformer_block(layer, h, attn_mask, conv_mask,
                                cfg.attn_num_heads, cfg.attn_group_size,
                                cfg.attn_max_pos_encoding, training)
    p_enc = h

    # duration predictor (conv-bn-relu x2 + conv head)
    d = p_enc.transpose(0, 2, 1)
    d = jax.nn.relu(_bn1d(params["dur_bn1"], _conv1d(params["dur1"], d),
                          training))
    d = jax.nn.relu(_bn1d(params["dur_bn2"], _conv1d(params["dur2"], d),
                          training))
    p_durs = _conv1d(params["dur3"], d)[:, 0]               # [B, Tp] (log)
    p_durs = jnp.where(conv_mask, 0.0, p_durs)

    # word-level pooling (Tw bounded statically by Tp: >=1 token per word)
    w_embs = word_level_pooling(p_enc, word_idxs, reduction="mean",
                                num_words=Tp)
    w_lens = jnp.max(word_idxs, axis=1) + 1
    w_durs_pred = word_level_pooling(
        jnp.exp(p_durs)[:, :, None], word_idxs, num_words=Tp)[:, :, 0]

    Tw = w_embs.shape[1]
    w_attn_mask, w_conv_mask = _full_masks(w_lens, Tw)
    h = w_embs
    for layer in params["word_layers"]:
        h = squeezeformer_block(layer, h, w_attn_mask, w_conv_mask,
                                cfg.attn_num_heads, cfg.attn_group_size,
                                cfg.attn_max_pos_encoding, training)
    w_enc = h

    if word_durs is None:
        word_durs = jnp.clip(jnp.ceil(w_durs_pred), 10, None).astype(
            jnp.int32)
        word_durs = jnp.where(w_conv_mask, 0, word_durs)
    elif word_durs.shape[1] < Tw:
        # teacher-forced durations padded to the static word bound
        word_durs = jnp.pad(word_durs,
                            ((0, 0), (0, Tw - word_durs.shape[1])))

    valid_w = make_padding_mask(w_lens, Tw)
    w_out, w_out_lens = length_regulator(w_enc, valid_w.astype(w_enc.dtype),
                                         word_durs, max_out=max_out)

    # word->phoneme cross attention (single-head-per-head standard MHA)
    q = w_out @ params["w2p_qkv"]["w"][:, :cfg.d_model] + \
        params["w2p_qkv"]["b"][:cfg.d_model]
    k = p_enc @ params["w2p_qkv"]["w"][:, cfg.d_model:2 * cfg.d_model] + \
        params["w2p_qkv"]["b"][cfg.d_model:2 * cfg.d_model]
    v = p_enc @ params["w2p_qkv"]["w"][:, 2 * cfg.d_model:] + \
        params["w2p_qkv"]["b"][2 * cfg.d_model:]
    H = cfg.attn_num_heads
    Dh = cfg.d_model // H

    def heads(x):
        return x.reshape(x.shape[0], x.shape[1], H, Dh).transpose(0, 2, 1, 3)

    logits = jnp.einsum("bhqd,bhkd->bhqk", heads(q) / math.sqrt(Dh),
                        heads(k), preferred_element_type=jnp.float32)
    key_mask = make_padding_mask(token_lens, Tp)
    logits = jnp.where(key_mask[:, None, None, :], logits, -1e9)
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, heads(v))
    out = out.transpose(0, 2, 1, 3).reshape(q.shape[0], q.shape[1],
                                            cfg.d_model)
    out = out @ params["w2p_out"]["w"] + params["w2p_out"]["b"]
    return out, w_out_lens, w_durs_pred


# ------------------------------------------------------------- RNN-T heads

def init_predictor_params(key, num_embeddings: int, embedding_dim: int,
                          d_model: int) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    emb = jax.random.normal(k1, (num_embeddings, embedding_dim))
    wi, bi = _linear_init(k2, embedding_dim, 3 * d_model)
    wh, bh = _linear_init(k3, d_model, 3 * d_model)
    return {"embedding": emb, "gru_wi": wi, "gru_bi": bi,
            "gru_wh": wh, "gru_bh": bh,
            "norm_scale": jnp.ones(d_model), "norm_bias": jnp.zeros(d_model)}


def gru_cell(p: dict, x: jax.Array, h: jax.Array) -> jax.Array:
    """torch.nn.GRU cell semantics."""
    gi = x @ p["gru_wi"] + p["gru_bi"]
    gh = h @ p["gru_wh"] + p["gru_bh"]
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1 - z) * n + z * h


def predictor_network(p: dict, token_idxs: jax.Array,
                      state: Optional[jax.Array] = None
                      ) -> Tuple[jax.Array, jax.Array]:
    """GRU predictor (reference decoder.py:12-38).  token_idxs: [B, U]."""
    B, U = token_idxs.shape
    D = p["norm_scale"].shape[0]
    h0 = state if state is not None else jnp.zeros((B, D))
    embs = p["embedding"][token_idxs]

    def step(h, x):
        h = gru_cell(p, x, h)
        return h, h

    hT, hs = jax.lax.scan(step, h0, embs.transpose(1, 0, 2))
    out = _layer_norm(hs.transpose(1, 0, 2), p["norm_scale"], p["norm_bias"])
    return out, hT


def init_joint_params(key, input_dim: int, output_dim: int) -> dict:
    w, b = _linear_init(key, input_dim, output_dim)
    return {"w": w, "b": b}


def joint_network(p: dict, enc: jax.Array, pred: jax.Array) -> jax.Array:
    """SiLU(enc[:, :, None] + pred[:, None]) @ W (reference
    decoder.py:41-57).  enc: [B, T, D]; pred: [B, U, D] -> [B, T, U, V]."""
    joint = jax.nn.silu(enc[:, :, None, :] + pred[:, None, :, :])
    return joint @ p["w"] + p["b"]


# --------------------------------------------------------- speaker head

def init_temporal_pooling_params(key, d_model: int) -> dict:
    k1, k2 = jax.random.split(key)
    w1, b1 = _linear_init(k1, 2 * d_model, d_model)
    w2, b2 = _linear_init(k2, d_model, d_model)
    return {"w1": w1, "b1": b1, "w2": w2, "b2": b2}


def temporal_pooling_decoder(p: dict, x: jax.Array, x_lens: jax.Array
                             ) -> jax.Array:
    """Mean+std pooling -> MLP speaker embedding (reference
    decoder.py:140-159)."""
    mean, std = compute_statistic(x, x_lens)
    h = jnp.concatenate([mean, std], axis=1)
    return jax.nn.silu(h @ p["w1"] + p["b1"]) @ p["w2"] + p["b2"]


# --------------------------------------------------------- waveform decoder

def init_waveform_decoder_params(key, cfg: SqueezeformerConfig,
                                 n_fft: int) -> dict:
    keys = jax.random.split(key, cfg.num_layers + 1)
    layers = [init_squeezeformer_block_params(
        k, cfg.d_model, cfg.attn_num_heads, cfg.attn_group_size,
        cfg.attn_max_pos_encoding, cfg.conv_kernel_size)
        for k in keys[:-1]]
    out = _conv1d_init(keys[-1], cfg.d_model, n_fft + 2, 3)
    return {"layers": layers, "out_conv": out}


def waveform_decoder(params: dict, cfg: SqueezeformerConfig, x: jax.Array,
                     x_lens: jax.Array, n_fft: int, win_length: int,
                     hop_length: int, training: bool = False
                     ) -> Tuple[jax.Array, jax.Array]:
    """Squeezeformer stack -> (mag, phase) -> iSTFT vocoder (reference
    decoder.py:73-137)."""
    attn_mask, conv_mask = _full_masks(x_lens, x.shape[1])
    for layer in params["layers"]:
        x = squeezeformer_block(layer, x, attn_mask, conv_mask,
                                cfg.attn_num_heads, cfg.attn_group_size,
                                cfg.attn_max_pos_encoding, training)
    h = _conv1d(params["out_conv"], x.transpose(0, 2, 1))   # [B, n_fft+2, T]
    n_bins = n_fft // 2 + 1
    mags, phases = h[:, :n_bins], h[:, n_bins:]
    spec = jnp.exp(mags) * (jnp.cos(phases) + 1j * jnp.sin(phases))
    spec = jnp.where(conv_mask[:, None, :], 0.0, spec)

    from asr_streaming_tpu.ops.istft import inverse_stft
    audio = inverse_stft(spec, n_fft, win_length, hop_length)
    audio_lens = (audio.shape[1] / x.shape[1] * x_lens).astype(jnp.int32)
    return audio[:, None, :], audio_lens
