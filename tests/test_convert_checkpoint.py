"""Reference-checkpoint converter: naming, stacking, orientation."""

import numpy as np
import jax
import pytest
import torch

from asr_streaming_tpu.models.asr import ASRConfig
from asr_streaming_tpu.models.encoder import init_encoder_params
from asr_streaming_tpu.tools.convert_checkpoint import (
    convert_ctc_state_dict, convert_encoder_state_dict,
)

L, D, FFN, MELS, V, H = 3, 32, 48, 16, 21, 24


def _synthetic_reference_state_dicts():
    """torch state dicts with the reference's names/shapes
    (torchaudio Emformer + CTCDecoder)."""
    g = torch.Generator().manual_seed(0)

    def t(*shape):
        return torch.randn(*shape, generator=g)

    enc = {"input_linear.weight": t(D // 4, MELS)}
    for i in range(L):
        p = f"encoder_layers.emformer_layers.{i}."
        enc.update({
            p + "attention.emb_to_key_value.weight": t(2 * D, D),
            p + "attention.emb_to_key_value.bias": t(2 * D),
            p + "attention.emb_to_query.weight": t(D, D),
            p + "attention.emb_to_query.bias": t(D),
            p + "attention.out_proj.weight": t(D, D),
            p + "attention.out_proj.bias": t(D),
            p + "layer_norm_input.weight": t(D),
            p + "layer_norm_input.bias": t(D),
            p + "pos_ff.0.weight": t(D),
            p + "pos_ff.0.bias": t(D),
            p + "pos_ff.1.weight": t(FFN, D),
            p + "pos_ff.1.bias": t(FFN),
            p + "pos_ff.4.weight": t(D, FFN),
            p + "pos_ff.4.bias": t(D),
            p + "layer_norm_output.weight": t(D),
            p + "layer_norm_output.bias": t(D),
        })
    dec = {
        "linear1.weight": t(H, D), "linear1.bias": t(H),
        "linear2.weight": t(V, H), "linear2.bias": t(V),
    }
    return enc, dec


def test_converted_params_match_template_shapes():
    from asr_streaming_tpu.models.emformer import EmformerConfig
    from asr_streaming_tpu.models.encoder import EncoderConfig

    enc_sd, dec_sd = _synthetic_reference_state_dicts()
    converted = {
        **convert_encoder_state_dict(enc_sd, num_layers=L),
        "ctc": convert_ctc_state_dict(dec_sd),
    }

    cfg = EncoderConfig(
        input_dim=MELS, d_model=D, vocab_size=V, ctc_hidden_dim=H,
        emformer=EmformerConfig(d_model=D, num_heads=4, ffn_dim=FFN,
                                num_layers=L))
    template = init_encoder_params(jax.random.PRNGKey(0), cfg)

    flat_c = {"/".join(str(getattr(k, "key", k)) for k in kp): leaf
              for kp, leaf in
              jax.tree_util.tree_flatten_with_path(converted)[0]}
    flat_t = {"/".join(str(getattr(k, "key", k)) for k in kp): leaf
              for kp, leaf in
              jax.tree_util.tree_flatten_with_path(template)[0]}
    assert set(flat_c) == set(flat_t)
    for key in flat_t:
        assert flat_c[key].shape == flat_t[key].shape, key

    # orientation: non-square ffn weights transposed to [in, out]
    np.testing.assert_array_equal(
        converted["emformer"]["ff_w1"][1],
        enc_sd["encoder_layers.emformer_layers.1.pos_ff.1.weight"]
        .numpy().T)
    # per-layer stacking preserved layer identity
    np.testing.assert_array_equal(
        converted["emformer"]["b_q"][2],
        enc_sd["encoder_layers.emformer_layers.2."
               "attention.emb_to_query.bias"].numpy())


def test_converted_params_run_end_to_end(tmp_path):
    from asr_streaming_tpu.models.emformer import EmformerConfig
    from asr_streaming_tpu.models.encoder import (
        EncoderConfig, encoder_stream_step, init_encoder_state,
    )
    from asr_streaming_tpu.utils.checkpoint import load_params, save_params
    import jax.numpy as jnp

    enc_sd, dec_sd = _synthetic_reference_state_dicts()
    converted = {"encoder": {
        **convert_encoder_state_dict(enc_sd, num_layers=L),
        "ctc": convert_ctc_state_dict(dec_sd)}}
    path = str(tmp_path / "converted.npz")
    save_params(path, converted)

    cfg = EncoderConfig(
        input_dim=MELS, d_model=D, vocab_size=V, ctc_hidden_dim=H,
        emformer=EmformerConfig(d_model=D, num_heads=4, ffn_dim=FFN,
                                num_layers=L))
    template = {"encoder": init_encoder_params(jax.random.PRNGKey(0), cfg)}
    params = load_params(path, like=template)

    state = init_encoder_state(cfg, 1)
    feats = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 80, MELS)), dtype=jnp.float32)
    logp, _ = encoder_stream_step(params["encoder"], cfg, feats, state)
    assert logp.shape == (1, 16, V)
    assert np.isfinite(np.asarray(logp)).all()
