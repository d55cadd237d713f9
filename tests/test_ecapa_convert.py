"""ECAPA converter: speechbrain-named state dict -> params, torch oracle.

Builds a synthetic state dict using speechbrain's ECAPA_TDNN module names
(the layout of the real spkrec-ecapa-voxceleb embedding_model.ckpt,
reference streaming_server.py:192-196), converts it, and checks the JAX
graph (models/ecapa.py) against an independent torch re-implementation of
speechbrain's published architecture run in eval mode.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from asr_streaming_tpu.models.ecapa import EcapaConfig, ecapa_embed
from asr_streaming_tpu.tools.convert_ecapa import convert_ecapa_state_dict

CFG = EcapaConfig(n_mels=12, channels=16, res2net_scale=4,
                  se_bottleneck=8, attention_channels=8, embedding_dim=10)


def synthetic_state_dict(cfg: EcapaConfig, seed=0):
    rng = np.random.default_rng(seed)
    sd = {}

    def conv(prefix, cout, cin, k):
        sd[prefix + ".weight"] = rng.standard_normal(
            (cout, cin, k)).astype(np.float32) * 0.2
        sd[prefix + ".bias"] = rng.standard_normal(cout).astype(
            np.float32) * 0.1

    def bn(prefix, c):
        sd[prefix + ".weight"] = 1 + 0.1 * rng.standard_normal(c).astype(
            np.float32)
        sd[prefix + ".bias"] = 0.1 * rng.standard_normal(c).astype(
            np.float32)
        sd[prefix + ".running_mean"] = 0.1 * rng.standard_normal(c).astype(
            np.float32)
        sd[prefix + ".running_var"] = (1 + 0.1 * rng.random(c)).astype(
            np.float32)

    C, S = cfg.channels, cfg.res2net_scale
    conv("blocks.0.conv.conv", C, cfg.n_mels, 5)
    bn("blocks.0.norm.norm", C)
    for i in range(1, 1 + len(cfg.dilations)):
        p = f"blocks.{i}."
        conv(p + "tdnn1.conv.conv", C, C, 1)
        bn(p + "tdnn1.norm.norm", C)
        for j in range(S - 1):
            conv(p + f"res2net_block.blocks.{j}.conv.conv", C // S,
                 C // S, 3)
            bn(p + f"res2net_block.blocks.{j}.norm.norm", C // S)
        conv(p + "tdnn2.conv.conv", C, C, 1)
        bn(p + "tdnn2.norm.norm", C)
        conv(p + "se_block.conv1.conv", cfg.se_bottleneck, C, 1)
        conv(p + "se_block.conv2.conv", C, cfg.se_bottleneck, 1)
    cat = C * len(cfg.dilations)
    conv("mfa.conv.conv", cat, cat, 1)
    bn("mfa.norm.norm", cat)
    conv("asp.tdnn.conv.conv", cfg.attention_channels, 3 * cat, 1)
    bn("asp.tdnn.norm.norm", cfg.attention_channels)
    conv("asp.conv.conv", cat, cfg.attention_channels, 1)
    bn("asp_bn.norm", 2 * cat)
    conv("fc.conv", cfg.embedding_dim, 2 * cat, 1)
    return sd


# ---------------------------------------------------------------- oracle


def t_conv(sd, prefix, x, dilation=1):
    w = torch.from_numpy(sd[prefix + ".weight"])
    b = torch.from_numpy(sd[prefix + ".bias"])
    k = w.shape[-1]
    pad = dilation * (k - 1) // 2
    if pad:
        x = F.pad(x, (pad, pad), mode="reflect")
    return F.conv1d(x, w, b, dilation=dilation)


def t_bn(sd, prefix, x):
    return F.batch_norm(
        x, torch.from_numpy(sd[prefix + ".running_mean"]),
        torch.from_numpy(sd[prefix + ".running_var"]),
        torch.from_numpy(sd[prefix + ".weight"]),
        torch.from_numpy(sd[prefix + ".bias"]), training=False, eps=1e-5)


def t_tdnn(sd, prefix, x, dilation=1):
    return t_bn(sd, prefix + ".norm.norm",
                torch.relu(t_conv(sd, prefix + ".conv.conv", x, dilation)))


def torch_oracle_embed(sd, cfg: EcapaConfig, feats: np.ndarray):
    """speechbrain ECAPA_TDNN forward (eval), [B, T, F] -> [B, E]."""
    x = torch.from_numpy(feats).transpose(1, 2)
    h = t_tdnn(sd, "blocks.0", x)
    outs = []
    for i, d in enumerate(cfg.dilations, start=1):
        p = f"blocks.{i}"
        residual = h
        y = t_tdnn(sd, p + ".tdnn1", h)
        chunks = torch.chunk(y, cfg.res2net_scale, dim=1)
        ys = [chunks[0]]
        prev = None
        for j in range(1, cfg.res2net_scale):
            inp = chunks[j] if prev is None else chunks[j] + prev
            prev = t_tdnn(sd, p + f".res2net_block.blocks.{j - 1}", inp, d)
            ys.append(prev)
        y = torch.cat(ys, dim=1)
        y = t_tdnn(sd, p + ".tdnn2", y)
        s = y.mean(dim=2, keepdim=True)
        s = torch.relu(t_conv(sd, p + ".se_block.conv1.conv", s))
        s = torch.sigmoid(t_conv(sd, p + ".se_block.conv2.conv", s))
        h = y * s + residual
        outs.append(h)
    h = t_tdnn(sd, "mfa", torch.cat(outs, dim=1))

    mean = h.mean(dim=2, keepdim=True)
    std = h.var(dim=2, keepdim=True, unbiased=False).clamp(min=1e-9).sqrt()
    ctx = torch.cat([h, mean.expand_as(h), std.expand_as(h)], dim=1)
    att = torch.tanh(t_tdnn(sd, "asp.tdnn", ctx))
    att = t_conv(sd, "asp.conv.conv", att)
    att = torch.softmax(att, dim=2)
    mu = (h * att).sum(dim=2)
    sg = ((h ** 2 * att).sum(dim=2) - mu ** 2).clamp(min=1e-9).sqrt()
    pooled = torch.cat([mu, sg], dim=1).unsqueeze(2)
    pooled = t_bn(sd, "asp_bn.norm", pooled)
    emb = t_conv(sd, "fc.conv", pooled)[:, :, 0]
    return (emb / emb.norm(dim=1, keepdim=True).clamp(min=1e-9)).numpy()


def test_converted_params_match_torch_oracle():
    sd = synthetic_state_dict(CFG)
    params = jax.tree.map(jnp.asarray, convert_ecapa_state_dict(sd, CFG))
    rng = np.random.default_rng(1)
    feats = rng.standard_normal((2, 60, CFG.n_mels)).astype(np.float32)
    got = np.asarray(ecapa_embed(params, CFG, jnp.asarray(feats)))
    want = torch_oracle_embed(sd, CFG, feats)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_converter_shapes_production_config():
    cfg = EcapaConfig()      # 512ch / scale 8 / 80 mel / 192-dim
    sd = synthetic_state_dict(cfg, seed=2)
    params = convert_ecapa_state_dict(sd, cfg)
    assert params["in_conv"]["w"].shape == (512, 80, 5)
    assert len(params["blocks"]) == 3
    assert len(params["blocks"][0]["res2"]) == 7
    assert params["blocks"][0]["res2"][0]["w"].shape == (64, 64, 3)
    assert params["out_w"].shape == (3072, 192)
    assert params["att_conv1"]["w"].shape == (128, 4608, 1)


def test_embedding_model_prefix_stripped():
    from asr_streaming_tpu.tools.convert_ecapa import _np  # noqa: F401
    sd = {("embedding_model." + k): v
          for k, v in synthetic_state_dict(CFG).items()}
    stripped = {k.removeprefix("embedding_model."): v for k, v in sd.items()}
    params = convert_ecapa_state_dict(stripped, CFG)
    assert params["in_conv"]["w"].shape == (CFG.channels, CFG.n_mels, 5)
