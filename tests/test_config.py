"""Server settings: YAML + env overrides, reference-style rule tables."""

import math

from asr_streaming_tpu.server.config import ServerSettings
from asr_streaming_tpu.utils.audio import EN_AUDIO


def test_defaults_and_env_override():
    s = ServerSettings.load(None, env={"PORT": "7777", "LANGUAGE": "en",
                                       "NORM_PORT": "9000"})
    assert s.port == 7777
    assert s.language == "en"
    assert s.audio == EN_AUDIO
    assert s.norm_url == "http://localhost:9000/cleanoutput"
    # en default rules include the 30 s hard flush
    assert any(r.min_utterance_length == 30.0
               for r in s.endpoint_rules.values())


def test_reference_style_yaml(tmp_path):
    cfg = tmp_path / "asr-online.yaml"
    cfg.write_text("""
language: vi
send_internal: false
noise_threashold: -35
audio:
  sample_rate: 16000
  hop_length: 0.01
  segment_size: 32
  context_size: 8
  bias: 4
  framerate: 4
Endpointing_rules:
  DEFAULT:
    rule1:
      must_contain_nonsilence: true
      min_trailing_silence: 1.0
      min_utterance_length: 0.0
      max_relative_cost: .inf
    rule2:
      must_contain_nonsilence: true
      min_trailing_silence: 0.5
      min_utterance_length: 5.0
      max_relative_cost: 4
""")
    s = ServerSettings.load(str(cfg), env={})
    assert s.send_internal is False
    assert s.noise_threshold_db == -35
    assert s.audio.segment_size == 32
    assert s.audio.chunk_length == (32 + 8 + 4) * 160
    assert set(s.endpoint_rules) == {"rule1", "rule2"}
    assert s.endpoint_rules["rule1"].max_relative_cost == math.inf
    assert s.endpoint_rules["rule2"].max_relative_cost == 4.0


def test_env_beats_yaml_language(tmp_path):
    cfg = tmp_path / "c.yaml"
    cfg.write_text("language: vi\nport: 1234\n")
    s = ServerSettings.load(str(cfg), env={"LANGUAGE": "en"})
    assert s.language == "en"
    assert s.port == 1234


def test_shipped_production_configs():
    """configs/server-{vi,en}.yaml are full production configs: complete
    reference rule tables (13 vi / 4 en), beam hyperparameters, thresholds
    (reference config/asr-online.yaml:18-110, asr-online-en.yaml:31-55)."""
    import os
    root = os.path.join(os.path.dirname(__file__), "..", "configs")

    vi = ServerSettings.load(os.path.join(root, "server-vi.yaml"), env={})
    assert vi.language == "vi"
    assert len(vi.endpoint_rules) == 13
    r4 = vi.endpoint_rules["rule4"]
    assert r4.min_utterance_length == 40.0
    assert r4.max_relative_cost == math.inf
    assert (vi.lm_weight, vi.beam_size, vi.beam_size_token,
            vi.beam_threshold, vi.word_score) == (1.0, 50, 5, 50.0, 0.5)
    assert vi.speaker_threshold == 0.45
    assert vi.noise_threshold_db == -40
    assert vi.upload_encoding == "mulaw"
    assert vi.audio.segment_size == 64 and vi.audio.context_size == 16

    en = ServerSettings.load(os.path.join(root, "server-en.yaml"), env={})
    assert en.language == "en"
    assert len(en.endpoint_rules) == 4
    assert en.endpoint_rules["rule4"].min_utterance_length == 30.0
    assert en.audio.segment_size == 16 and en.audio.framerate == 1
    # r5: per-chunk beam partials are the EN default — the reference's
    # only EN decode mode (streaming_server.py:441-465)
    assert en.en_beam_partials is True and en.en_beam_width == 10
