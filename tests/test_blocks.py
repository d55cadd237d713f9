"""Squeezeformer blocks, offline encoders, RNN-T heads, sequence ops."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from asr_streaming_tpu.models.blocks import (
    _rel_to_abs, conv_subsampling, init_subsampling_params,
    init_squeezeformer_block_params, squeezeformer_block,
)
from asr_streaming_tpu.models.offline import (
    SqueezeformerConfig, acoustic_encoder, init_acoustic_encoder_params,
    init_predictor_params, predictor_network, gru_cell,
    init_joint_params, joint_network,
    init_temporal_pooling_params, temporal_pooling_decoder,
)
from asr_streaming_tpu.ops.sequence import (
    compute_statistic, fft_convolution, length_regulator, make_padding_mask,
    word_level_pooling,
)
from asr_streaming_tpu.ops.istft import inverse_stft


def test_rel_to_abs_matches_reference_semantics():
    """The rel->abs index trick: score[q, r] maps to key position
    q + (r - (T-1)) for relative index r."""
    B, H, T = 1, 1, 4
    rng = np.random.default_rng(0)
    rel = rng.standard_normal((B, H, T, 2 * T - 1)).astype(np.float32)
    out = np.asarray(_rel_to_abs(jnp.asarray(rel)))
    assert out.shape == (B, H, T, T)
    for q in range(T):
        for k in range(T):
            r = (T - 1) + (k - q)
            assert out[0, 0, q, k] == pytest.approx(rel[0, 0, q, r])


def test_conv_subsampling_shapes_and_lens():
    params = init_subsampling_params(jax.random.PRNGKey(0), 16, 32, 8)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 37, 16)),
                    dtype=jnp.float32)
    lens = jnp.array([37, 20])
    y, y_lens = conv_subsampling(params, x, lens)
    assert y.shape[0] == 2 and y.shape[2] == 32
    assert list(np.asarray(y_lens)) == [(37 - 1) // 4 + 1, (20 - 1) // 4 + 1]


def test_squeezeformer_block_runs_and_masks():
    p = init_squeezeformer_block_params(jax.random.PRNGKey(1), 32, 4, 1,
                                        64, 7)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 10, 32)),
                    dtype=jnp.float32)
    lens = jnp.array([10, 6])
    valid = make_padding_mask(lens, 10)
    attn_mask = ~(valid[:, None, :] & valid[:, :, None])
    conv_mask = ~valid
    y = squeezeformer_block(p, x, attn_mask, conv_mask, 4, 1, 64)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()
    # padded positions must not influence valid outputs: change padding
    x2 = x.at[1, 6:].set(99.0)
    y2 = squeezeformer_block(p, x2, attn_mask, conv_mask, 4, 1, 64)
    # conv kernel 7 leaks 3 frames across the boundary by design
    np.testing.assert_allclose(np.asarray(y[1, :3]), np.asarray(y2[1, :3]),
                               rtol=1e-4, atol=1e-4)


def test_grouped_attention_group2():
    p = init_squeezeformer_block_params(jax.random.PRNGKey(2), 32, 4, 2,
                                        64, 7)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((1, 9, 32)),
                    dtype=jnp.float32)  # odd length exercises chunk padding
    valid = make_padding_mask(jnp.array([9]), 9)
    attn_mask = ~(valid[:, None, :] & valid[:, :, None])
    y = squeezeformer_block(p, x, attn_mask, ~valid, 4, 2, 64)
    assert y.shape == (1, 9, 32)


def test_acoustic_encoder_end_to_end():
    cfg = SqueezeformerConfig(d_model=32, num_layers=2, attn_num_heads=4,
                              attn_max_pos_encoding=64, conv_kernel_size=7,
                              input_dim=16, subsampling_num_filters=8)
    params = init_acoustic_encoder_params(jax.random.PRNGKey(3), cfg)
    x = jnp.asarray(np.random.default_rng(3).standard_normal((2, 40, 16)),
                    dtype=jnp.float32)
    y, y_lens = acoustic_encoder(params, cfg, x, jnp.array([40, 24]))
    assert y.shape == (2, 10, 32)
    assert list(np.asarray(y_lens)) == [10, 6]


def test_gru_cell_matches_torch():
    D = 16
    p = init_predictor_params(jax.random.PRNGKey(4), 10, D, D)
    cell = torch.nn.GRUCell(D, D)
    with torch.no_grad():
        cell.weight_ih.copy_(torch.from_numpy(np.asarray(p["gru_wi"]).T))
        cell.weight_hh.copy_(torch.from_numpy(np.asarray(p["gru_wh"]).T))
        cell.bias_ih.copy_(torch.from_numpy(np.asarray(p["gru_bi"])))
        cell.bias_hh.copy_(torch.from_numpy(np.asarray(p["gru_bh"])))
    rng = np.random.default_rng(4)
    x = rng.standard_normal((3, D)).astype(np.float32)
    h = rng.standard_normal((3, D)).astype(np.float32)
    ours = np.asarray(gru_cell(p, jnp.asarray(x), jnp.asarray(h)))
    theirs = cell(torch.from_numpy(x), torch.from_numpy(h)).detach().numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_predictor_and_joint_shapes():
    p = init_predictor_params(jax.random.PRNGKey(5), 32, 16, 24)
    toks = jnp.asarray(np.random.default_rng(5).integers(0, 32, (2, 7)))
    out, state = predictor_network(p, toks)
    assert out.shape == (2, 7, 24)
    assert state.shape == (2, 24)
    jp = init_joint_params(jax.random.PRNGKey(6), 24, 32)
    enc = jnp.zeros((2, 5, 24))
    logits = joint_network(jp, enc, out)
    assert logits.shape == (2, 5, 7, 32)


def test_temporal_pooling_decoder():
    p = init_temporal_pooling_params(jax.random.PRNGKey(7), 16)
    x = jnp.asarray(np.random.default_rng(7).standard_normal((2, 9, 16)),
                    dtype=jnp.float32)
    emb = temporal_pooling_decoder(p, x, jnp.array([9, 5]))
    assert emb.shape == (2, 16)


def test_length_regulator():
    x = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 3, 4))
    mask = jnp.ones((1, 3), jnp.float32)
    durs = jnp.asarray([[2, 0, 3]])
    y, y_lens = length_regulator(x, mask, durs, max_out=6)
    assert int(y_lens[0]) == 5
    got = np.asarray(y[0])
    np.testing.assert_allclose(got[0], got[1])          # token0 twice
    np.testing.assert_allclose(got[2], np.arange(8, 12))  # token2 x3
    np.testing.assert_allclose(got[5], 0.0)             # padding


def test_word_level_pooling_mean():
    x = jnp.asarray([[[1.0], [3.0], [5.0], [7.0]]])
    ids = jnp.asarray([[0, 0, 1, -1]])
    pooled = word_level_pooling(x, ids, reduction="mean")
    np.testing.assert_allclose(np.asarray(pooled[0, :, 0]), [2.0, 5.0])


def test_fft_convolution_matches_numpy():
    rng = np.random.default_rng(8)
    sig = rng.standard_normal(50).astype(np.float32)
    ker = rng.standard_normal(9).astype(np.float32)
    ours = np.asarray(fft_convolution(jnp.asarray(sig), jnp.asarray(ker)))
    golden = np.convolve(sig, ker, mode="full")
    np.testing.assert_allclose(ours, golden, rtol=1e-4, atol=1e-4)


def test_istft_roundtrip():
    """STFT (torch) -> our iSTFT recovers the waveform interior."""
    rng = np.random.default_rng(9)
    wave = rng.standard_normal(4000).astype(np.float32)
    n_fft, win, hop = 512, 512, 128
    spec = torch.stft(torch.from_numpy(wave), n_fft, hop, win,
                      torch.hann_window(win), center=True,
                      return_complex=True).numpy()
    out = np.asarray(inverse_stft(jnp.asarray(spec)[None], n_fft, win, hop))
    n = min(out.shape[1], len(wave))
    np.testing.assert_allclose(out[0, hop:n - hop], wave[hop:n - hop],
                               rtol=1e-3, atol=1e-3)


def test_pixel_ops():
    from asr_streaming_tpu.models.blocks import (
        downsampling_pixel, init_downsampling_pixel_params,
        upsampling_pixel, make_padding_mask,
    )
    p = init_downsampling_pixel_params(jax.random.PRNGKey(10), 16, 2)
    x = jnp.asarray(np.random.default_rng(10).standard_normal((2, 12, 16)),
                    dtype=jnp.float32)
    lens = jnp.array([12, 8])
    valid = make_padding_mask(lens, 12)
    attn = ~(valid[:, None, :] & valid[:, :, None])
    y, y_lens, a2, c2 = downsampling_pixel(p, x, lens, attn, ~valid, 2)
    assert y.shape == (2, 6, 16)
    assert list(np.asarray(y_lens)) == [6, 4]
    assert a2.shape == (2, 6, 6) and c2.shape == (2, 6)

    u, u_lens, a3, c3 = upsampling_pixel(y, y_lens, a2, c2, 2)
    assert u.shape == (2, 12, 16)
    assert list(np.asarray(u_lens)) == [12, 8]
    np.testing.assert_array_equal(np.asarray(u[0, 0]), np.asarray(u[0, 1]))


def test_adaptive_and_mixstyle_norms():
    from asr_streaming_tpu.models.blocks import (
        adaptive_norm, init_adaptive_norm_params, mixstyle_norm,
    )
    p = init_adaptive_norm_params(jax.random.PRNGKey(11), 8, 4)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, 10, 8)) * 5 + 3,
                    dtype=jnp.float32)
    lens = jnp.array([10, 6])
    styles = jnp.asarray(rng.standard_normal((2, 4)), dtype=jnp.float32)
    y = adaptive_norm(p, x, lens, styles)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()
    # inference mixstyle = identity
    z = mixstyle_norm(p, jax.random.PRNGKey(0), x, lens, styles,
                      training=False)
    np.testing.assert_array_equal(np.asarray(z), np.asarray(x))
    # training mixstyle runs and stays finite
    z2 = mixstyle_norm(p, jax.random.PRNGKey(1), x, lens, styles,
                       training=True, probability=1.0)
    assert np.isfinite(np.asarray(z2)).all()
