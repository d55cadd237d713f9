"""Multi-LM registry: named rescorers + per-model endpoint rules.

The reference loads ``Linguistic_Model`` as a dict of named
BeamSearchDecoders (streaming_server.py:165-169), selects one per stream
via ``stream.sw_model`` at every final (streaming_server.py:511-513),
and maps each model to its own endpoint ruleset through ``Mapping_rule``
(stream.py:61,139; config/asr-online.yaml:18-27,109-110).  These tests
pin that whole surface in the rebuild: config registry parsing, the
``__SET_LM_MODEL__`` protocol carrier, per-model rule selection in
Stream, and two streams of one server getting measurably different
finals from their selected rescorers.
"""

import asyncio
import json
import math
import os

import jax
import numpy as np
import pytest
import websockets
import yaml

from asr_streaming_tpu.models.asr import ASRConfig
from asr_streaming_tpu.models.serving import ServingConfig, init_serving_params
from asr_streaming_tpu.server.config import VI_AUDIO, ServerSettings
from asr_streaming_tpu.server.protocol import parse_text_message
from asr_streaming_tpu.server.ws_server import StreamingServer
from asr_streaming_tpu.streaming.endpoint import EndpointRule
from asr_streaming_tpu.streaming.scheduler import Scheduler
from asr_streaming_tpu.streaming.stream import Stream

VOCAB = ["-", "|"] + [chr(ord("a") + i) for i in range(19)]
FLUSH_RULES = {"flush": EndpointRule(True, 0.0, 1.9, float("inf"))}
PORT = 18600 + (os.getpid() % 300)


# ------------------------------------------------------------------ config

def _reference_blob(tmp_path, two_models=True):
    corpus = tmp_path / "corpus"
    corpus.mkdir(exist_ok=True)
    for name in ("lexicon.txt", "3gram.bin", "legal_lexicon.txt",
                 "legal.bin"):
        (corpus / name).write_text("x")
    blob = {
        "corpus_dir": str(corpus),
        "Linguistic_Model": {
            "GENERAL": {"lexicon": "lexicon.txt", "lm": "3gram.bin",
                        "lm_weight": 1.0, "beam_size": 50,
                        "beam_size_token": 5, "beam_threshold": 50.0,
                        "word_score": 0.5},
        },
        "Endpointing_rules": {
            "DEFAULT": {
                "rule1": {"must_contain_nonsilence": True,
                          "min_trailing_silence": 1.0,
                          "min_utterance_length": 0.0,
                          "max_relative_cost": ".inf"},
            },
            "STRICT": {
                "rule1": {"must_contain_nonsilence": True,
                          "min_trailing_silence": 2.5,
                          "min_utterance_length": 0.0,
                          "max_relative_cost": ".inf"},
            },
        },
        "Mapping_rule": {"GENERAL": "DEFAULT"},
    }
    if two_models:
        blob["Linguistic_Model"]["LEGAL"] = {
            "lexicon": "legal_lexicon.txt", "lm": "legal.bin",
            "lm_weight": 2.0}
        blob["Mapping_rule"]["LEGAL"] = "STRICT"
    return blob


def test_config_parses_full_registry(tmp_path):
    blob = _reference_blob(tmp_path)
    p = tmp_path / "asr-online.yaml"
    p.write_text(yaml.safe_dump(blob))
    s = ServerSettings.load(str(p), env={})

    assert set(s.lm_models) == {"GENERAL", "LEGAL"}
    assert s.lm_models["GENERAL"]["lm_path"].endswith("3gram.bin")
    assert s.lm_models["LEGAL"]["lexicon_path"].endswith(
        "legal_lexicon.txt")
    assert s.lm_models["LEGAL"]["lm_weight"] == 2.0
    # flat single-LM fields mirror GENERAL
    assert s.lexicon_path == s.lm_models["GENERAL"]["lexicon_path"]
    assert s.lm_path == s.lm_models["GENERAL"]["lm_path"]
    # every named ruleset loads, not just DEFAULT (r4 flattened these)
    assert set(s.endpoint_rulesets) == {"DEFAULT", "STRICT"}
    strict = s.endpoint_rulesets["STRICT"]["rule1"]
    assert strict.min_trailing_silence == 2.5
    assert math.isinf(strict.max_relative_cost)
    assert s.mapping_rule == {"GENERAL": "DEFAULT", "LEGAL": "STRICT"}
    # endpoint_rules stays the DEFAULT set
    assert s.endpoint_rules["rule1"].min_trailing_silence == 1.0


def test_reference_shipped_yaml_mapping_not_flattened():
    """The reference's own asr-online.yaml must load its Mapping_rule."""
    ref = "/root/reference/streaming_decoder/config/asr-online.yaml"
    if not os.path.exists(ref):
        pytest.skip("reference tree unavailable")
    s = ServerSettings.load(ref, env={})
    assert s.mapping_rule.get("GENERAL") == "DEFAULT"
    assert "GENERAL" in s.lm_models
    assert "DEFAULT" in s.endpoint_rulesets


# ---------------------------------------------------------------- protocol

def test_parse_set_lm_model():
    cmd = parse_text_message(json.dumps({
        "__COMMAND__": "__SET_LM_MODEL__",
        "__ARGUMENT__": {"model": "LEGAL"},
        "request-id": "r1"}))
    assert cmd.kind == "set_lm_model"
    assert cmd.lm_model == "LEGAL"
    assert cmd.request_id == "r1"
    # bare-string argument form
    cmd = parse_text_message(json.dumps({
        "__COMMAND__": "__SET_LM_MODEL__", "__ARGUMENT__": "MEDICAL"}))
    assert cmd.lm_model == "MEDICAL"


# ------------------------------------------------------------------ stream

def test_stream_uses_mapped_ruleset():
    rulesets = {
        "DEFAULT": {"r": EndpointRule(True, 10.0, 1e9, float("inf"))},
        "FAST": {"r": EndpointRule(False, 0.0, 0.0, float("inf"))},
    }
    mapping = {"GENERAL": "DEFAULT", "QUICK": "FAST"}

    def make():
        s = Stream(VI_AUDIO, VOCAB, rulesets=rulesets, mapping_rule=mapping)
        s.chunk_processed = 4
        s.buffer = np.zeros(VI_AUDIO.chunk_length, np.float32)
        return s

    s = make()                       # GENERAL -> DEFAULT never fires
    detected, _ = s.check_endpoint()
    assert not detected
    s = make()
    s.sw_model = "QUICK"             # -> FAST fires immediately
    detected, _ = s.check_endpoint()
    assert detected
    s = make()
    s.sw_model = "UNKNOWN"           # unmapped -> self.rules fallback
    detected, _ = s.check_endpoint()
    assert not detected


# ------------------------------------------------------------- server E2E

def _fake_rescorer(word):
    def rescore(seg):
        return [{"beg": 0.0, "end": 0.5, "word": word, "confidence": 0.9}]
    return rescore


def build_server(max_slots=4):
    cfg = ServingConfig(asr=ASRConfig.tiny(vocab_size=len(VOCAB)),
                        use_silero=False)
    params = init_serving_params(jax.random.PRNGKey(0), cfg)
    sched = Scheduler(params, cfg, VOCAB, max_slots=max_slots,
                      rules=FLUSH_RULES)
    return StreamingServer(
        sched, tick_idle_sleep=0.002,
        rescorer=_fake_rescorer("general"),
        rescorers={"GENERAL": _fake_rescorer("general"),
                   "BIASED": _fake_rescorer("biased")})


def pcm_bytes(seconds, seed=0, level=0.3):
    rng = np.random.default_rng(seed)
    f = rng.standard_normal(int(16000 * seconds)) * level
    return (np.clip(f, -1, 1) * 32767).astype(np.int16).tobytes()


async def _connect_with_retry(url, attempts=120, delay=0.5):
    for _ in range(attempts):
        try:
            return await websockets.connect(url)
        except OSError:
            await asyncio.sleep(delay)
    raise ConnectionRefusedError(url)


async def _run_client(port, lm_model=None, expect_error=False):
    messages = []
    async with await _connect_with_retry(
            f"ws://127.0.0.1:{port}/voice/api/asr/v1/ws/decode_online"
            f"?content-type=audio/x-raw,+layout=(string)interleaved,"
            f"+rate=(int)16000") as ws:
        if lm_model:
            await ws.send(json.dumps({"__COMMAND__": "__SET_LM_MODEL__",
                                      "__ARGUMENT__": {"model": lm_model}}))
        data = pcm_bytes(3.0)
        step = 16000 // 4 * 2
        for i in range(0, len(data), step):
            await ws.send(data[i:i + step])
            await asyncio.sleep(0.01)
        await ws.send(json.dumps({"__COMMAND__": "__EOS__"}))
        while True:
            msg = await asyncio.wait_for(ws.recv(), timeout=30)
            messages.append(msg)
            if msg == "__REQUEST_COMPLETED__":
                break
    return messages


async def _run_pair():
    server = build_server()
    server_task = asyncio.create_task(server.run(PORT))
    await asyncio.sleep(0.3)
    try:
        a, b, c = await asyncio.gather(
            _run_client(PORT),
            _run_client(PORT, lm_model="BIASED"),
            _run_client(PORT, lm_model="NOPE", expect_error=True))
    finally:
        server_task.cancel()
        server.stop_ticks()
    return a, b, c


def _final_transcripts(messages):
    out = []
    for m in messages[:-1]:
        blob = json.loads(m)
        if blob["result"].get("final"):
            out.append(blob["result"]["hypotheses"][0]["transcript"])
    return out


def test_two_streams_use_their_selected_rescorers():
    a, b, c = asyncio.run(_run_pair())
    fa, fb, fc = (_final_transcripts(x) for x in (a, b, c))
    assert fa and all(t == "general" for t in fa), fa
    assert fb and all(t == "biased" for t in fb), fb
    # the unknown-model client got an error notice and DEFAULT finals
    errs = [m for m in c[:-1]
            if json.loads(m).get("status") == 1]
    assert errs and "NOPE" in json.loads(errs[0])["msg"]
    assert fc and all(t == "general" for t in fc), fc
