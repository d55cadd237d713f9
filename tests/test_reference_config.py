"""Drop-in loading of the reference's OWN config layout + checkpoints.

Migration story (VERDICT r2 "degraded stack" weak item, extended): a user
of the reference stack points this server at their UNMODIFIED
``asr-online.yaml`` (reference streaming_decoder/config/asr-online.yaml)
and the nested OmegaConf sections — Acoustic_Model, Linguistic_Model,
Vad, Speaker_Diar, LM_Endpointing, model_dir/corpus_dir, audio/audio_en —
map onto ServerSettings with the reference's exact path-resolution
semantics (recognition.py:99-119, 147, 238-239; streaming_server.py:
192-196).  Reference torch checkpoints (.ckpt Lightning vi / .pt
torchaudio RNNT en) convert on the fly at load (load_params_auto), and
the EN global-stats feature normalization (recognition.py:107) rides in
the en_frontend params.
"""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from asr_streaming_tpu.server.config import ServerSettings  # noqa: E402
from asr_streaming_tpu.utils.checkpoint import (  # noqa: E402
    load_params, load_params_auto, merge_params, save_params,
)

# fake_tree builds a full /opt/server_e2e-layout deploy tree from the
# converter-oracle synthetic state dicts (incl. global_stats_rnnt.json
# and an enrolled-speaker wav); synthetic_sd is its RNNT input fixture.
from tests.test_bootstrap_assets import fake_tree  # noqa: E402,F401
from tests.test_convert_rnnt import synthetic_sd  # noqa: E402,F401

REF_YAML = "/root/reference/streaming_decoder/config/asr-online.yaml"


def _write_reference_yaml(tree: str) -> str:
    """A config in the reference's exact layout, pointing into the
    synthetic deploy tree (mirrors asr-online.yaml structurally)."""
    pv2 = os.path.join(tree, "streaming_decoder", "pretrained_v2")
    path = os.path.join(tree, "streaming_decoder", "asr-online.yaml")
    with open(path, "w") as f:
        f.write(f"""
model_dir: {pv2}/AM
corpus_dir: {pv2}/LM
send_internal: True
save_audio: False
filter_noise: False
noise_threashold: -40
language: vi

Acoustic_Model:
  _target_: lightspeech.models.recognition.LightningASR
  filepath: asr-online.ckpt
  device: cuda

Linguistic_Model:
  GENERAL:
    _target_: lightspeech.models.recognition.BeamSearchDecoder
    lexicon: lexicon.txt
    lm: 3gram.bin
    lm_weight: 1.25
    beam_size: 40
    beam_size_token: 6
    beam_threshold: 45.0
    word_score: 0.25

LM_Endpointing: {pv2}/endpointing/lm_general.arpa

audio:
  sample_rate: 16000
  hop_length: 0.01
  segment_size: 64
  context_size: 16
  bias: 4
  framerate: 4

audio_en:
  sample_rate: 16000
  hop_length: 0.01
  segment_size: 16
  context_size: 4
  bias: 0
  framerate: 1

Vad:
  Webrtc:
    aggressiveness: 2
    chunk_duration: 0.03
    min_segment_dur: 0.2
  Silero:
    model_path: pretrained_v2/vad/silero_vad_v5.onnx
    force_onnx_cpu: False

Speaker_Diar:
  model_dir: {pv2}/diar/ecapa-tdnn
  speaker_wav: speaker_16k.wav
  threshold: 0.37
""")
    return path


def test_reference_layout_vi_mapping(fake_tree):
    pv2 = os.path.join(fake_tree, "streaming_decoder", "pretrained_v2")
    cfg = _write_reference_yaml(fake_tree)
    s = ServerSettings.load(cfg, env={"LANGUAGE": "vi"})

    assert s.checkpoint == os.path.join(pv2, "AM", "asr-online.ckpt")
    assert s.lexicon_path == os.path.join(pv2, "LM", "lexicon.txt")
    assert s.lm_path == os.path.join(pv2, "LM", "3gram.bin")
    assert s.lm_endpointing_path == os.path.join(
        pv2, "endpointing", "lm_general.arpa")
    # cwd-relative silero path resolved against the deploy root
    # (dirname(dirname(model_dir)) — the reference runs from there)
    assert s.vad_weights == os.path.join(
        pv2, "vad", "silero_vad_v5.onnx")
    assert s.use_silero is True
    assert s.speaker_weights == os.path.join(
        pv2, "diar", "ecapa-tdnn", "embedding_model.ckpt")
    assert s.speaker_wav == os.path.join(
        pv2, "diar", "ecapa-tdnn", "speaker_16k.wav")
    assert s.speaker_threshold == 0.37
    assert (s.lm_weight, s.beam_size, s.beam_size_token,
            s.beam_threshold, s.word_score) == (1.25, 40, 6, 45.0, 0.25)
    # vi geometry from the `audio` section, not audio_en
    assert s.audio.segment_size == 64 and s.audio.framerate == 4
    # reference layout adopts the shipped production serving posture
    assert s.device_worker is True and s.scheduler_groups == 2


def test_reference_layout_en_mapping(fake_tree):
    pv2 = os.path.join(fake_tree, "streaming_decoder", "pretrained_v2")
    cfg = _write_reference_yaml(fake_tree)
    s = ServerSettings.load(cfg, env={"LANGUAGE": "en"})

    rnnt_dir = os.path.join(pv2, "emformer-rnnt")
    # EN assets live under dirname(model_dir)/emformer-rnnt
    # (recognition.py:99-119)
    assert s.checkpoint == os.path.join(rnnt_dir, "emformer_rnnt.pt")
    assert s.vocab_path == os.path.join(rnnt_dir, "spm_bpe_4096.model")
    assert s.en_global_stats == os.path.join(
        rnnt_dir, "global_stats_rnnt.json")
    # EN picks the audio_en section (the reference switches on LANGUAGE)
    assert s.audio.segment_size == 16 and s.audio.framerate == 1
    assert s.audio.bias == 0


def test_reference_layout_missing_assets_degrade(tmp_path, caplog):
    """The REAL reference config (hardcoded /opt paths that don't exist
    here) still loads: rules/beam/audio map, asset keys warn + stay None,
    the server boots degraded instead of crashing."""
    import logging

    src = REF_YAML
    if not os.path.exists(src):
        pytest.skip("reference tree not present")
    with caplog.at_level(logging.WARNING,
                         logger="asr_streaming_tpu.server.config"):
        s = ServerSettings.load(src, env={"LANGUAGE": "vi"})
    assert len(s.endpoint_rules) == 13
    assert (s.lm_weight, s.beam_size, s.beam_size_token,
            s.beam_threshold, s.word_score) == (1.0, 50, 5, 50.0, 0.5)
    assert s.speaker_threshold == 0.45
    assert s.audio.segment_size == 64 and s.audio.context_size == 16
    assert s.checkpoint is None and s.lm_path is None
    assert s.vad_weights is None and s.speaker_weights is None
    assert any("not present on this host" in r.message
               for r in caplog.records)


def test_real_reference_en_yaml_reduced_geometry():
    """The reference's shipped EN config (asr-online-en.yaml: audio_en
    segment 8 / context 4 / bias 0 / framerate 1) maps to the reduced
    EN geometry."""
    src = "/root/reference/streaming_decoder/config/asr-online-en.yaml"
    if not os.path.exists(src):
        pytest.skip("reference tree not present")
    s = ServerSettings.load(src, env={})
    assert s.language == "en"
    assert len(s.endpoint_rules) == 4
    assert (s.audio.segment_size, s.audio.context_size,
            s.audio.bias, s.audio.framerate) == (8, 4, 0, 1)
    assert s.checkpoint is None          # /opt assets absent here


def test_explicit_scalars_beat_reference_sections(fake_tree, tmp_path):
    """Top-level framework scalars win over Linguistic_Model /
    Speaker_Diar values (the documented overlay contract — review
    finding: scalars used to be overwritten unconditionally)."""
    cfg = _write_reference_yaml(fake_tree)
    blob = open(cfg).read() + "\nlm_weight: 2.0\nspeaker_threshold: 0.6\n"
    cfg2 = tmp_path / "overlay2.yaml"
    cfg2.write_text(blob)
    s = ServerSettings.load(str(cfg2), env={"LANGUAGE": "vi"})
    assert s.lm_weight == 2.0
    assert s.speaker_threshold == 0.6
    # un-overridden section values still map
    assert s.beam_size == 40


def test_empty_reference_sections_degrade(tmp_path):
    """Nulled nested sections (user disables the LM) degrade instead of
    crashing (review finding: next(iter(...)).get raised on None)."""
    cfg = tmp_path / "c.yaml"
    cfg.write_text("""
language: vi
Linguistic_Model:
  GENERAL:
Vad:
  Silero:
Speaker_Diar:
""")
    s = ServerSettings.load(str(cfg), env={})
    assert s.lm_path is None and s.lexicon_path is None
    assert s.vad_weights is None and s.speaker_weights is None


def test_partial_checkpoint_warns_untouched_subtrees(tmp_path, caplog):
    import logging

    template = {
        "frontend": {"k": jnp.ones((2,), jnp.float32)},
        "encoder": {"w": jnp.zeros((3,), jnp.float32)},
    }
    npz = tmp_path / "partial.npz"
    save_params(str(npz), {"encoder": {"w": np.ones(3)}})
    with caplog.at_level(logging.WARNING,
                         logger="asr_streaming_tpu.utils.checkpoint"):
        load_params_auto(str(npz), like=template)
    assert any("frontend" in r.message and "initialized values"
               in r.message for r in caplog.records)


def test_explicit_keys_beat_reference_mapping(fake_tree, tmp_path):
    """Framework keys in the same file win over the mapped nested
    sections (overlay migration: keep the reference sections, override
    one key)."""
    cfg = _write_reference_yaml(fake_tree)
    npz = tmp_path / "mine.npz"
    save_params(str(npz), {"x": np.zeros(1, np.float32)})
    blob = open(cfg).read() + f"\ncheckpoint: {npz}\n"
    cfg2 = tmp_path / "overlay.yaml"
    cfg2.write_text(blob)
    s = ServerSettings.load(str(cfg2), env={"LANGUAGE": "vi"})
    assert s.checkpoint == str(npz)


# --------------------------------------------------- on-the-fly conversion


def test_load_params_auto_vi_lightning_ckpt(tmp_path):
    from tests.test_convert_checkpoint import (
        L, _synthetic_reference_state_dicts,
    )
    from asr_streaming_tpu.tools.convert_checkpoint import (
        convert_ctc_state_dict, convert_encoder_state_dict,
    )

    enc_sd, dec_sd = _synthetic_reference_state_dicts()
    ckpt = tmp_path / "asr-online.ckpt"
    torch.save({"state_dict": {"encoder": enc_sd, "decoder": dec_sd}},
               str(ckpt))

    ref = {"encoder": {**convert_encoder_state_dict(enc_sd, L),
                       "ctc": convert_ctc_state_dict(dec_sd)}}
    # template with extra subtrees the checkpoint does not carry
    template = jax.tree.map(
        lambda a: jnp.zeros(np.asarray(a).shape, jnp.float32), ref)
    template["vad"] = {"w": jnp.ones((3,), jnp.float32)}

    merged = load_params_auto(str(ckpt), like=template)
    np.testing.assert_array_equal(
        merged["encoder"]["emformer"]["ff_w1"],
        np.asarray(ref["encoder"]["emformer"]["ff_w1"], np.float32))
    # layer count was inferred from the state-dict keys
    assert merged["encoder"]["emformer"]["ff_w1"].shape[0] == L
    # untouched subtree keeps template values
    np.testing.assert_array_equal(merged["vad"]["w"], np.ones(3))


def test_load_params_auto_en_rnnt_pt(synthetic_sd, tmp_path):
    from tests.test_convert_rnnt import CFG, L, PL
    from asr_streaming_tpu.models.rnnt import init_rnnt_params
    from asr_streaming_tpu.tools.convert_rnnt_checkpoint import (
        convert_rnnt_state_dict,
    )

    pt = tmp_path / "emformer_rnnt.pt"
    torch.save(synthetic_sd, str(pt))
    template = init_rnnt_params(jax.random.PRNGKey(0), CFG)
    template["vad"] = {"w": jnp.ones((2,), jnp.float32)}

    merged = load_params_auto(str(pt), like=template)
    ref = convert_rnnt_state_dict(synthetic_sd, num_layers=L,
                                  pred_layers=PL)
    np.testing.assert_allclose(
        np.asarray(merged["joiner"]["w"], np.float32),
        np.asarray(ref["joiner"]["w"], np.float32), rtol=1e-6)
    np.testing.assert_array_equal(merged["vad"]["w"], np.ones(2))


def test_load_params_auto_partial_npz(tmp_path):
    """bootstrap_assets writes subtree-only npz files (am.npz holds just
    the converted encoder); the server's checkpoint: key must load them
    against the FULL serving template (regression: strict load_params
    raised KeyError on the frontend buffers)."""
    template = {
        "frontend": {"k": jnp.ones((2, 2), jnp.float32)},
        "encoder": {"w": jnp.zeros((3,), jnp.float32)},
        "vad": {"w": jnp.zeros((4,), jnp.float32)},
    }
    npz = tmp_path / "am.npz"
    save_params(str(npz), {"encoder": {"w": np.arange(3, dtype=np.int64)}})
    merged = load_params_auto(str(npz), like=template)
    np.testing.assert_array_equal(merged["encoder"]["w"],
                                  np.arange(3, dtype=np.float32))
    assert merged["encoder"]["w"].dtype == np.float32   # cast to template
    np.testing.assert_array_equal(merged["frontend"]["k"], np.ones((2, 2)))

    # unknown keys still raise (typo safety)
    save_params(str(npz), {"encoderr": {"w": np.zeros(3)}})
    with pytest.raises(KeyError):
        load_params_auto(str(npz), like=template)

    # shape mismatches still raise
    save_params(str(npz), {"encoder": {"w": np.zeros(5)}})
    with pytest.raises(AssertionError):
        load_params_auto(str(npz), like=template)


def test_merge_params_leaf_vs_subtree_mismatch():
    with pytest.raises(KeyError):
        merge_params({"a": {"b": np.zeros(2)}}, {"a": np.zeros(2)})
    with pytest.raises(KeyError):
        merge_params({"a": np.zeros(2)}, {"a": {"b": np.zeros(2)}})


# ------------------------------------------------------- EN global stats


def test_en_global_stats_in_serving_params(tmp_path):
    """ServingConfig.en_global_stats loads the reference's
    global_stats_rnnt.json into the en_frontend params and the serving
    featurizer applies (x - mean) * invstddev after the piecewise log
    (reference recognition.py:100-109)."""
    import dataclasses

    from asr_streaming_tpu.models.asr import ASRConfig
    from asr_streaming_tpu.models.rnnt import RNNTConfig
    from asr_streaming_tpu.models.serving import (
        ServingConfig, init_serving_params,
    )
    from asr_streaming_tpu.ops.frontend import log_mel
    from asr_streaming_tpu.utils.audio import EN_AUDIO

    rnnt = RNNTConfig.tiny()
    stats = tmp_path / "global_stats_rnnt.json"
    rng = np.random.default_rng(0)
    mean = rng.normal(size=rnnt.n_mels).tolist()
    inv = (1.0 + rng.random(rnnt.n_mels)).tolist()
    stats.write_text(json.dumps({"mean": mean, "invstddev": inv}))

    asr = dataclasses.replace(ASRConfig.tiny(), audio=EN_AUDIO)
    cfg = ServingConfig(asr=asr, model_kind="rnnt", rnnt=rnnt,
                        use_silero=False,
                        en_global_stats=str(stats))
    params = init_serving_params(jax.random.PRNGKey(0), cfg)
    ef = params["en_frontend"]
    np.testing.assert_allclose(np.asarray(ef["mean"]), mean, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ef["invstddev"]), inv,
                               rtol=1e-6)

    # the featurizer applies the affine transform exactly
    from asr_streaming_tpu.ops.frontend import MelConfig
    mel_cfg = dataclasses.replace(
        MelConfig.for_english(), n_mels=rnnt.n_mels)
    wave = jnp.asarray(rng.normal(size=(1, 3200)).astype(np.float32))
    raw = log_mel({k: ef[k] for k in ("dft_kernel", "mel_fb")},
                  mel_cfg, wave)
    normed = log_mel(ef, mel_cfg, wave, mean=ef["mean"],
                     invstddev=ef["invstddev"])
    np.testing.assert_allclose(
        np.asarray(normed),
        (np.asarray(raw) - np.asarray(mean)) * np.asarray(inv),
        rtol=1e-5, atol=1e-6)


def test_en_scheduler_serves_with_global_stats(tmp_path):
    """End-to-end smoke: the EN scheduler ticks with global stats wired
    (the en serving step passes mean/invstddev through log_mel)."""
    import dataclasses

    from asr_streaming_tpu.models.asr import ASRConfig
    from asr_streaming_tpu.models.rnnt import RNNTConfig
    from asr_streaming_tpu.models.serving import (
        ServingConfig, init_serving_params,
    )
    from asr_streaming_tpu.streaming.endpoint import EndpointRule
    from asr_streaming_tpu.streaming.scheduler import Scheduler
    from asr_streaming_tpu.utils.audio import EN_AUDIO

    rnnt = RNNTConfig.tiny()
    stats = tmp_path / "stats.json"
    stats.write_text(json.dumps({"mean": [0.5] * rnnt.n_mels,
                                 "invstddev": [1.5] * rnnt.n_mels}))
    asr = dataclasses.replace(ASRConfig.tiny(), audio=EN_AUDIO)
    cfg = ServingConfig(asr=asr, model_kind="rnnt", rnnt=rnnt,
                        use_silero=False, en_global_stats=str(stats))
    params = init_serving_params(jax.random.PRNGKey(0), cfg)
    pieces = ["▁t{}".format(i) for i in range(rnnt.vocab_size - 1)] + \
        ["<b>"]
    sched = Scheduler(params, cfg, pieces, max_slots=2, language="en",
                      rules={"flush": EndpointRule(True, 0.0, 0.9,
                                                   float("inf"))})
    s = sched.admit("en0")
    rng = np.random.default_rng(1)
    s.accept_waveform(
        (rng.standard_normal(16000) * 0.3).astype(np.float32))
    events = sched.drain()
    assert events  # decoded through the stats-normalized featurizer
