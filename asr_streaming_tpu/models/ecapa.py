"""ECAPA-TDNN speaker embedding (JAX) for speaker verification.

TPU-native replacement for the reference's speechbrain ECAPA-TDNN
(reference: streaming_server.py:192-196 loads ``EncoderClassifier`` and
enrolls one speaker; _verify_speaker at 575-586 embeds the
[word_start, word_end] slice of each final segment and compares cosine
similarity against threshold 0.45, config asr-online.yaml:139-142).

Architecture (speechbrain ``ECAPA_TDNN`` module-for-module, so the real
``spkrec-ecapa-voxceleb`` checkpoint converts directly —
tools/convert_ecapa.py):
  TDNNBlock(k5) = Conv1d(reflect same-pad) + ReLU + BN
  -> 3x SERes2NetBlock (tdnn1 k1 -> Res2Net k3 dilations 2,3,4 -> tdnn2 k1
     -> SE bottleneck; residual)
  -> mfa TDNNBlock(k1) over the concatenated block outputs (1536)
  -> attentive statistics pooling with global context
     (tdnn k1 + ReLU + BN -> tanh -> conv) -> BN -> Linear -> embedding
     (192)

Inputs are 80-mel filterbanks; segment audio is bucketed to power-of-two
lengths so verification never triggers recompiles.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from asr_streaming_tpu.ops.frontend import MelConfig, make_mel_params, log_mel


@dataclasses.dataclass(frozen=True)
class EcapaConfig:
    n_mels: int = 80
    channels: int = 512
    res2net_scale: int = 8
    se_bottleneck: int = 128
    attention_channels: int = 128
    embedding_dim: int = 192
    dilations: Tuple[int, ...] = (2, 3, 4)

    @classmethod
    def tiny(cls) -> "EcapaConfig":
        return cls(n_mels=16, channels=32, res2net_scale=4,
                   se_bottleneck=16, attention_channels=16,
                   embedding_dim=24)


def _conv_init(key, cout, cin, k):
    bound = 1.0 / math.sqrt(cin * k)
    w = jax.random.uniform(key, (cout, cin, k), minval=-bound, maxval=bound)
    return {"w": w, "b": jnp.zeros(cout)}


def _bn_init(c):
    return {"scale": jnp.ones((c, 1)), "bias": jnp.zeros((c, 1)),
            "mean": jnp.zeros((c, 1)), "var": jnp.ones((c, 1))}


def _conv1d(p, x, dilation=1):
    """Conv1d with reflect "same" padding (speechbrain CNN.Conv1d
    defaults: padding="same", padding_mode="reflect")."""
    k = p["w"].shape[-1]
    pad = dilation * (k - 1) // 2
    if pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (pad, pad)), mode="reflect")
    y = jax.lax.conv_general_dilated(
        x, p["w"], (1,), [(0, 0)], rhs_dilation=(dilation,),
        dimension_numbers=("NCW", "OIW", "NCW"))
    return y + p["b"][:, None]


def _bn(p, x, training=False):
    if training:
        mean = jnp.mean(x, axis=(0, 2), keepdims=True)[0]
        var = jnp.var(x, axis=(0, 2), keepdims=True)[0]
    else:
        mean, var = p["mean"], p["var"]
    return (x - mean) * jax.lax.rsqrt(var + 1e-5) * p["scale"] + p["bias"]


def init_ecapa_params(key, cfg: EcapaConfig = EcapaConfig()) -> dict:
    C, S = cfg.channels, cfg.res2net_scale
    keys = iter(jax.random.split(key, 64))
    params = {
        "in_conv": _conv_init(next(keys), C, cfg.n_mels, 5),
        "in_bn": _bn_init(C),
        "blocks": [],
    }
    for _d in cfg.dilations:
        width = C // S
        block = {
            "conv1": _conv_init(next(keys), C, C, 1), "bn1": _bn_init(C),
            "res2": [_conv_init(next(keys), width, width, 3)
                     for _ in range(S - 1)],
            "res2_bn": [_bn_init(width) for _ in range(S - 1)],
            "conv3": _conv_init(next(keys), C, C, 1), "bn3": _bn_init(C),
            "se_down": _conv_init(next(keys), cfg.se_bottleneck, C, 1),
            "se_up": _conv_init(next(keys), C, cfg.se_bottleneck, 1),
        }
        params["blocks"].append(block)
    cat = C * len(cfg.dilations)
    params["mfa"] = _conv_init(next(keys), cat, cat, 1)
    params["mfa_bn"] = _bn_init(cat)
    params["att_conv1"] = _conv_init(next(keys), cfg.attention_channels,
                                     3 * cat, 1)
    params["att_bn"] = _bn_init(cfg.attention_channels)
    params["att_conv2"] = _conv_init(next(keys), cat,
                                     cfg.attention_channels, 1)
    params["out_bn"] = _bn_init(2 * cat)
    kw = next(keys)
    bound = 1.0 / math.sqrt(2 * cat)
    params["out_w"] = jax.random.uniform(
        kw, (2 * cat, cfg.embedding_dim), minval=-bound, maxval=bound)
    params["out_b"] = jnp.zeros(cfg.embedding_dim)
    return params


def _se_res2block(p, x, dilation, scale, mask, training=False):
    """SE-Res2Net block.  x: [B, C, T]; mask: [B, 1, T] valid."""
    residual = x
    h = jax.nn.relu(_conv1d(p["conv1"], x))
    h = _bn(p["bn1"], h, training)

    # Res2Net: split channels into `scale` groups; hierarchical conv
    chunks = jnp.split(h, scale, axis=1)
    outs = [chunks[0]]
    prev = None
    for i in range(1, scale):
        inp = chunks[i] if prev is None else chunks[i] + prev
        y = jax.nn.relu(_conv1d(p["res2"][i - 1], inp, dilation))
        y = _bn(p["res2_bn"][i - 1], y, training)
        outs.append(y)
        prev = y
    h = jnp.concatenate(outs, axis=1)

    h = jax.nn.relu(_conv1d(p["conv3"], h))
    h = _bn(p["bn3"], h, training)

    # squeeze-excitation (masked mean over time)
    denom = jnp.clip(jnp.sum(mask, axis=2, keepdims=True), 1, None)
    s = jnp.sum(h * mask, axis=2, keepdims=True) / denom
    s = jax.nn.relu(_conv1d(p["se_down"], s))
    s = jax.nn.sigmoid(_conv1d(p["se_up"], s))
    return h * s + residual


def ecapa_embed(params: dict, cfg: EcapaConfig, feats: jax.Array,
                feat_lens: Optional[jax.Array] = None,
                training: bool = False) -> jax.Array:
    """feats: [B, T, n_mels] -> L2-normalized embeddings [B, E]."""
    B, T, _ = feats.shape
    if feat_lens is None:
        feat_lens = jnp.full((B,), T)
    mask = (jnp.arange(T)[None, :] < feat_lens[:, None])[:, None, :]
    x = feats.transpose(0, 2, 1)                    # [B, F, T]

    x = x * mask
    h = jax.nn.relu(_conv1d(params["in_conv"], x))
    h = _bn(params["in_bn"], h, training) * mask

    feats_out = []
    for block, d in zip(params["blocks"], cfg.dilations):
        h = _se_res2block(block, h, d, cfg.res2net_scale, mask,
                          training) * mask
        feats_out.append(h)
    h = jax.nn.relu(_conv1d(params["mfa"], jnp.concatenate(feats_out,
                                                           axis=1)))
    h = _bn(params["mfa_bn"], h, training)

    # attentive statistics pooling with global context (speechbrain
    # AttentiveStatisticsPooling: TDNNBlock -> tanh -> conv)
    denom = jnp.clip(jnp.sum(mask, axis=2, keepdims=True), 1, None)
    mean = jnp.sum(h * mask, axis=2, keepdims=True) / denom
    var = jnp.sum(((h - mean) ** 2) * mask, axis=2, keepdims=True) / denom
    std = jnp.sqrt(jnp.clip(var, 1e-9, None))
    ctx = jnp.concatenate([
        h,
        jnp.broadcast_to(mean, h.shape),
        jnp.broadcast_to(std, h.shape)], axis=1)
    att = jax.nn.relu(_conv1d(params["att_conv1"], ctx))
    att = _bn(params["att_bn"], att, training)
    att = jnp.tanh(att)
    att = _conv1d(params["att_conv2"], att)
    att = jnp.where(mask, att, -1e9)
    att = jax.nn.softmax(att, axis=2)

    mu = jnp.sum(h * att, axis=2)
    sg = jnp.sqrt(jnp.clip(jnp.sum((h ** 2) * att, axis=2) - mu ** 2,
                           1e-9, None))
    pooled = jnp.concatenate([mu, sg], axis=1)[:, :, None]
    pooled = _bn(params["out_bn"], pooled, training)[:, :, 0]

    emb = pooled @ params["out_w"] + params["out_b"]
    return emb / jnp.clip(jnp.linalg.norm(emb, axis=-1, keepdims=True),
                          1e-9, None)


class SpeakerVerifier:
    """Enrolled-speaker cosine verification with bucketed jit steps
    (reference StreamingServer._verify_speaker, streaming_server.py:575-586).
    """

    BUCKETS = (0.5, 1.0, 2.0, 4.0, 8.0, 16.0)   # seconds

    def __init__(self, params: dict, cfg: EcapaConfig,
                 enrolled_wave: np.ndarray, threshold: float = 0.45,
                 sample_rate: int = 16000):
        self.params = params
        self.cfg = cfg
        self.threshold = threshold
        self.sample_rate = sample_rate
        self.mel_cfg = MelConfig(
            n_fft=512, win_length=400, hop_length=160, n_mels=cfg.n_mels,
            center=True)
        self.mel_params = make_mel_params(self.mel_cfg)
        self._embed = jax.jit(
            lambda w: ecapa_embed(
                params, cfg, log_mel(self.mel_params, self.mel_cfg, w)))
        self.enrolled = np.asarray(self._embed(
            self._bucket(np.asarray(enrolled_wave, np.float32)))[0])

    def _bucket(self, wave: np.ndarray) -> jnp.ndarray:
        secs = max(len(wave), 1) / self.sample_rate
        for b in self.BUCKETS:
            if secs <= b:
                n = int(b * self.sample_rate)
                break
        else:
            n = int(self.BUCKETS[-1] * self.sample_rate)
            wave = wave[:n]
        out = np.zeros(n, np.float32)
        out[:len(wave)] = wave[:n]
        return jnp.asarray(out)[None]

    def score(self, wave: np.ndarray) -> float:
        emb = np.asarray(self._embed(self._bucket(
            np.asarray(wave, np.float32)))[0])
        return float(np.dot(emb, self.enrolled))

    def __call__(self, wave: np.ndarray) -> bool:
        if len(wave) == 0:
            return False
        return self.score(wave) > self.threshold
