"""Train -> checkpoint -> serve golden loop with LEARNED weights.

Every other correctness test in this suite is weights-independent (oracles,
invariances, fixed-seed regressions over random params).  This one closes
the loop the only way possible in an image that ships no checkpoints: it
OVERFITS a tiny CTC model on synthetic tone audio with the real training
step (train/ctc.py), round-trips the weights through the checkpoint
machinery (utils/checkpoint.py), and serves them through the full
continuous-batching scheduler — asserting the *exact transcript* comes
back out, partials, endpointing and all.

This exercises, with non-random weights: log-mel frontend -> Emformer ->
CTC loss training; train/serve consistency (encoder_forward's chunk scan
== the scheduler's streaming step, reference parity discussion in
models/asr.py); npz checkpoint save/load; scheduler admission, device
emission buffer, greedy incremental decode, endpoint rules, and final
segment emission (reference pipeline: streaming_decoder/streaming_server.py
:339-572).

Task design notes (the optimization landscape at this scale is finicky —
a convergence sweep showed every (seed, lr, audio-geometry) combination
leaves SOME token class or boundary underfit, with the victim varying
by seed — classic CTC blank-collapse local minima):
  - every tone is followed by a short silence gap, so CTC alignment is
    near-trivial; single-letter utterances anchor each tone class;
  - the word separator '|' has its own 1 kHz hum (see TONE_HZ) —
    duration-coded silence left blank/'|' near-ties that flipped under
    the f16 emission buffer and the serving ring-buffer shift;
  - the fixture does NOT demand a perfect overfit.  It trains until at
    least one two-word GOLDEN candidate greedy-decodes exactly at BOTH
    stream alignments (offset 0 and the serving ring buffer's 0.2 s
    prepend), then anchors the serving assertions on that verified
    sentence.  The e2e guarantee — exact transcript through the real
    scheduler, emission buffer, incremental decoder and endpointing —
    is unchanged; only the toy model's worst-case token is not load-
    bearing.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from asr_streaming_tpu.models.asr import ASRConfig, init_asr_params
from asr_streaming_tpu.models.encoder import encoder_forward
from asr_streaming_tpu.models.serving import ServingConfig, init_serving_params
from asr_streaming_tpu.ops.frontend import log_mel
from asr_streaming_tpu.streaming.endpoint import EndpointRule
from asr_streaming_tpu.streaming.scheduler import Scheduler
from asr_streaming_tpu.train.ctc import Batch, make_optimizer, make_train_step
from asr_streaming_tpu.utils.checkpoint import load_params, save_params
from asr_streaming_tpu.decode.greedy import greedy_search_full

SR = 16000
# blank, word separator, four tone tokens (vi-style character vocab)
VOCAB = ["-", "|", "a", "b", "c", "d"]
# Every token, including the separator, gets an unambiguous acoustic cue:
# a 2-layer d=64 model distinguishes 0.24 s of silence from 0.08 s only
# marginally, so a silence-coded space left near-ties that flipped
# between the offline forward and the serving path.
TONE_HZ = {"a": 350.0, "b": 700.0, "c": 1400.0, "d": 2100.0, " ": 1000.0}

# Single letters anchor each tone class; sentences cover order variety.
TRAIN_SENTENCES = ["a", "b", "c", "d",
                   "ab cd", "dc ba", "ad bc", "ca db", "bd", "acd b"]
# Two-word sentences eligible to anchor the serving assertions.
GOLDEN_CANDIDATES = ["ab cd", "dc ba", "ad bc", "acd b", "ca db"]
UTT_SECONDS = 2.56          # 4 vi chunks of 0.64 s
TONE_SEC, GAP_SEC = 0.24, 0.08


def _tone(tok: str) -> np.ndarray:
    t = np.arange(int(SR * TONE_SEC)) / SR
    wave = 0.3 * np.sin(2 * np.pi * TONE_HZ[tok] * t)
    # 10 ms fade in/out: windows straddling a tone edge see low energy, so
    # edge frames decode confidently as blank instead of sitting at a
    # near-tie the f16 emission buffer (or a different device count's
    # reduction order) could flip into a duplicate token.
    ramp = np.minimum(1.0, np.arange(len(t)) / (0.010 * SR))
    return (wave * ramp * ramp[::-1]).astype(np.float32)


def _sentence_audio(s: str, total: float = UTT_SECONDS,
                    lead: float = 0.0) -> np.ndarray:
    parts = [np.zeros(int(SR * lead), np.float32)]
    for ch in s:
        parts.extend([_tone(ch), np.zeros(int(SR * GAP_SEC), np.float32)])
    audio = np.concatenate(parts)
    assert len(audio) <= int(SR * total), (s, len(audio))
    return np.pad(audio, (0, int(SR * total) - len(audio)))


def _labels(s: str) -> list:
    return [1 if ch == " " else VOCAB.index(ch) for ch in s]


@pytest.fixture(scope="module")
def trained():
    """Overfit the tiny model on the tone sentences.  Returns
    (cfg, trained asr params, final loss, golden sentence) where the
    golden sentence greedy-decodes exactly at both stream alignments.

    Fast path: the committed asset (assets/test_fixtures/overfit_ctc.npz,
    tools/make_test_fixtures.py) is loaded and its golden property
    RE-VERIFIED on this host — exact greedy decode at both alignments,
    the same acceptance that gated training.  Verification failure (code
    drift, host float divergence) falls back to training."""
    cfg = ASRConfig.tiny(vocab_size=len(VOCAB))
    probe = init_asr_params(jax.random.PRNGKey(0), cfg)

    from tests.fixture_assets import load_asset
    asset = load_asset("overfit_ctc", like=probe)
    if asset is not None:
        params, meta = asset
        golden = meta["golden"]
        lead0 = cfg.audio.buffer_length / SR

        def _decode_at(off):
            w = np.stack([_sentence_audio(golden, lead=off)])
            f = log_mel(params["frontend"], cfg.mel, jnp.asarray(w))
            lp, _ = encoder_forward(params["encoder"], cfg.encoder, f)
            return greedy_search_full(np.asarray(lp)[0], VOCAB)[0].strip()

        if _decode_at(0.0) == golden and _decode_at(lead0) == golden:
            return cfg, params, float(meta["loss"]), golden
        import logging
        logging.getLogger(__name__).warning(
            "overfit_ctc asset failed re-verification — retraining")

    # Each sentence at lead offsets {0, 0.2 s}: the serving ring buffer
    # prepends buffer_length (=0.2 s) of zeros, shifting the chunk/tone
    # alignment by 5 emission frames vs the offline forward — the tiny
    # model is not shift-robust unless BOTH alignments are trained.
    lead = cfg.audio.buffer_length / SR
    pairs = [(s, off) for s in TRAIN_SENTENCES for off in (0.0, lead)]
    waves = np.stack([_sentence_audio(s, lead=off) for s, off in pairs])
    feats = np.asarray(log_mel(probe["frontend"], cfg.mel,
                               jnp.asarray(waves)))
    lab_lists = [_labels(s) for s, _ in pairs]
    lmax = max(len(l) for l in lab_lists)
    labels = np.zeros((len(lab_lists), lmax), np.int32)
    for i, l in enumerate(lab_lists):
        labels[i, :len(l)] = l
    batch = Batch(
        feats=jnp.asarray(feats, jnp.float32),
        feat_lens=jnp.full((len(waves),), feats.shape[1], jnp.int32),
        labels=jnp.asarray(labels),
        label_lens=jnp.asarray([len(l) for l in lab_lists], jnp.int32),
    )

    def decode(params, sentences, off):
        w = np.stack([_sentence_audio(s, lead=off) for s in sentences])
        f = log_mel(params["frontend"], cfg.mel, jnp.asarray(w))
        lp, _ = encoder_forward(params["encoder"], cfg.encoder, f)
        lp = np.asarray(lp)
        return [greedy_search_full(lp[i], VOCAB)[0].strip()
                for i in range(len(sentences))]

    def golden_of(params):
        """First candidate that decodes exactly at both alignments."""
        at0 = decode(params, GOLDEN_CANDIDATES, 0.0)
        atl = decode(params, GOLDEN_CANDIDATES, lead)
        for s, t0, tl in zip(GOLDEN_CANDIDATES, at0, atl):
            if t0 == s and tl == s:
                return s
        return None

    optimizer = make_optimizer(cfg, base_lr=0.5, warmup_steps=100,
                               weight_decay=0.0)
    train_step = jax.jit(make_train_step(cfg, optimizer))
    # Seed order from a convergence sweep under the test env's 8-virtual-
    # device mesh: seed 5 yields 4/5 verified candidates by ~600 steps.
    best = (None, float("inf"), None)
    for seed in (5, 3, 0, 7):
        params = init_asr_params(jax.random.PRNGKey(seed), cfg)
        opt_state = optimizer.init(params["encoder"])
        loss = None
        for step in range(1000):
            params, opt_state, loss = train_step(params, opt_state, batch)
            # periodic decode probe: stop as soon as a candidate verifies
            # (full convergence on every toy sentence is seed-dependent)
            if step >= 300 and step % 150 == 0 and float(loss) < 0.5:
                g = golden_of(params)
                if g is not None:
                    return cfg, params, float(loss), g
        g = golden_of(params)
        if float(loss) < 0.5 and g is not None:
            return cfg, params, float(loss), g
        if float(loss) < best[1]:
            best = (params, float(loss), g)
    params, loss, g = best
    assert g is not None, f"no seed produced a verified sentence (loss={loss})"
    return cfg, params, loss, g


def test_overfit_converges(trained):
    _, _, loss, _ = trained
    # init loss is ~20-30; anything below 0.5 means the model aligned and
    # fit nearly every token (exactness is enforced per-sentence below)
    assert loss < 0.5, f"tiny CTC model failed to overfit (loss={loss})"


def test_offline_greedy_recovers_golden(trained):
    """Trained offline forward must greedy-decode the golden sentence at
    both stream alignments, and each single-letter anchor that appears in
    it must decode on its own."""
    cfg, params, _, golden = trained
    lead = cfg.audio.buffer_length / SR
    for off in (0.0, lead):
        feats = log_mel(params["frontend"], cfg.mel,
                        jnp.asarray(_sentence_audio(golden, lead=off))[None])
        log_probs, _ = encoder_forward(params["encoder"], cfg.encoder, feats)
        text, _ = greedy_search_full(np.asarray(log_probs)[0], VOCAB)
        assert text.strip() == golden, (off, golden, text)


def test_checkpoint_then_serve_exact_transcript(trained, tmp_path):
    """npz checkpoint round trip, then the full scheduler serves the
    trained weights: streaming partials grow toward the golden sentence
    and the endpoint rule fires a final with the exact transcript."""
    cfg, params, _, golden = trained
    path = str(tmp_path / "overfit.npz")
    save_params(path, params)
    loaded = load_params(path, like=params)

    # Gates off: the inter-token gaps are DIGITAL silence (-inf dB), which
    # even a -200 dB energy gate classifies as non-speech, so gated chunks
    # could drop token onsets.  Endpointing still works: trailing silence
    # is decode-driven (stream.py trailing_blank_duration), not VAD-driven.
    scfg = ServingConfig(asr=cfg, use_silero=False, use_energy_gate=False,
                         energy_threshold_db=-200.0)
    sparams = init_serving_params(jax.random.PRNGKey(1), scfg)
    sparams["frontend"] = loaded["frontend"]
    sparams["encoder"] = loaded["encoder"]

    # 0.8 s trailing silence: above the intra-sentence gaps (<=0.32 s),
    # well below the ~2 s of trailing silence after the sentence.
    rules = {"trained": EndpointRule(True, 0.8, 0.0, float("inf"))}
    sched = Scheduler(sparams, scfg, VOCAB, max_slots=2, rules=rules)

    # extra trailing silence so the endpoint rule (0.8 s) fires mid-stream
    audio = _sentence_audio(golden, total=3.84)
    s = sched.admit("t0")
    s.accept_waveform(audio)
    s.add_tail_padding()
    events = sched.drain()

    finals = [e for e in events if e.kind == "final" and e.stream_id == "t0"]
    partials = [e for e in events
                if e.kind == "partial" and e.stream_id == "t0"]
    assert finals, f"no final emitted: {[(e.kind, e.text) for e in events]}"
    texts = [f.text.strip() for f in finals]
    assert golden in texts, (golden, texts, [p.text for p in partials])
    # partials must build monotonically toward the sentence (prefix growth)
    nonempty = [p.text.strip() for p in partials if p.text.strip()]
    assert nonempty and all(golden.startswith(t) for t in nonempty), \
        (golden, nonempty)


def test_beam_decoders_recover_golden(trained, tmp_path):
    """Lexicon-constrained beam search over the LEARNED log-probs: the
    Python oracle and the native C++ decoder must both recover the golden
    sentence as words through the real trie machinery.  (All other beam
    tests use synthetic peaky/noisy emissions; this is the only one whose
    emissions come from a trained model.)  The audio gets one trailing
    separator hum so the final word ends with '|' like every vi lexicon
    entry (reference corpus convention: word -> chars + '|')."""
    from asr_streaming_tpu.decode.beam import LexiconBeamDecoder
    from asr_streaming_tpu.decode.beam_native import (
        NativeBeamDecoder, native_available,
    )
    cfg, params, _, golden = trained
    words = sorted({w for s in TRAIN_SENTENCES for w in s.split(" ")})
    lexicon = {w: list(w) + ["|"] for w in words}

    audio = _sentence_audio(golden + " ")   # trailing hum closes last word
    feats = log_mel(params["frontend"], cfg.mel, jnp.asarray(audio)[None])
    log_probs, _ = encoder_forward(params["encoder"], cfg.encoder, feats)
    lp = np.asarray(log_probs)[0]

    res = LexiconBeamDecoder(VOCAB, lexicon).decode(lp)
    assert res.transcript == golden, (golden, res.transcript)
    assert res.words == golden.split(" ")

    if native_available():
        lex_path = tmp_path / "lexicon.txt"
        lex_path.write_text("\n".join(
            f"{w}\t{' '.join(t)}" for w, t in lexicon.items()))
        got = NativeBeamDecoder(VOCAB, str(lex_path)).decode_full(lp)
        assert got["transcript"] == golden, (golden, got["transcript"])


def test_final_segment_beam_rescore_roundtrip(trained):
    """The server rescored finals through decode.beam.make_rescorer:
    beam search over the segment's DEVICE-buffered emission (f16 ring
    buffer -> _fetch_emission -> [T, V] log-probs).  With learned
    weights, the fetched emission must beam-decode back to the golden
    sentence — exercising the emission append, the final-segment
    snapshot, the f16 round trip and the lexicon beam on served data
    (reference: rescore-on-final, streaming_server.py:500-520)."""
    from asr_streaming_tpu.decode.beam import LexiconBeamDecoder
    cfg, params, _, golden = trained
    scfg = ServingConfig(asr=cfg, use_silero=False, use_energy_gate=False,
                         energy_threshold_db=-200.0)
    sparams = init_serving_params(jax.random.PRNGKey(1), scfg)
    sparams["frontend"] = params["frontend"]
    sparams["encoder"] = params["encoder"]
    rules = {"trained": EndpointRule(True, 0.8, 0.0, float("inf"))}
    sched = Scheduler(sparams, scfg, VOCAB, max_slots=2, rules=rules)
    s = sched.admit("t0")
    # trailing separator hum closes the last word for the lexicon
    s.accept_waveform(_sentence_audio(golden + " ", total=3.84))
    s.add_tail_padding()
    events = sched.drain()
    finals = [e for e in events if e.kind == "final" and e.text.strip()]
    assert finals and finals[0].segment is not None
    seg = finals[0].segment
    assert seg.length > 0
    emission = np.asarray(seg.emission[:seg.length], np.float32)
    words = sorted({w for t in TRAIN_SENTENCES for w in t.split(" ")})
    lexicon = {w: list(w) + ["|"] for w in words}
    res = LexiconBeamDecoder(VOCAB, lexicon).decode(emission)
    assert res.transcript == golden, (golden, res.transcript)


def test_two_segments_reset_and_serve(trained):
    """Continuous dictation: the same stream carries TWO utterances
    separated by silence.  The endpoint rule finalizes the first; the
    slot's device state resets (_needs_reset -> state_init) and the
    second utterance must decode exactly into its own final — with
    learned weights, stale Emformer state or a missed reset would
    corrupt the second segment."""
    cfg, params, _, golden = trained
    scfg = ServingConfig(asr=cfg, use_silero=False, use_energy_gate=False,
                         energy_threshold_db=-200.0)
    sparams = init_serving_params(jax.random.PRNGKey(1), scfg)
    sparams["frontend"] = params["frontend"]
    sparams["encoder"] = params["encoder"]
    rules = {"trained": EndpointRule(True, 0.8, 0.0, float("inf"))}
    sched = Scheduler(sparams, scfg, VOCAB, max_slots=2, rules=rules)

    one = _sentence_audio(golden, total=3.84)   # ~2.2 s trailing silence
    audio = np.concatenate([one, one])
    s = sched.admit("t0")
    s.accept_waveform(audio)
    s.add_tail_padding()
    events = sched.drain()
    finals = [e.text.strip() for e in events
              if e.kind == "final" and e.text.strip()]
    assert len(finals) == 2, (finals, [(e.kind, e.text) for e in events])
    assert finals[0] == golden, finals
    # Second segment: every token must decode in order; the separator's
    # exact placement is allowed to drift — post-reset the encoder has
    # processed silence chunks, an alignment the toy fixture never
    # trains, and the '|' near-tie moves by a frame (reset semantics —
    # no stale tokens, no duplicates — are what this test pins).
    assert finals[1].replace(" ", "") == golden.replace(" ", ""), finals


def test_sharded_mesh_serves_golden(trained):
    """Multi-chip data-parallel serving (slots sharded over the mesh's
    data axis via shard_map, parallel/serving.py) must produce the exact
    golden transcript on the virtual 8-device mesh — cross-device slot
    placement, sharded state reset and the per-shard step all carry
    learned weights."""
    from asr_streaming_tpu.parallel.serving import make_serving_mesh
    cfg, params, _, golden = trained
    scfg = ServingConfig(asr=cfg, use_silero=False, use_energy_gate=False,
                         energy_threshold_db=-200.0)
    sparams = init_serving_params(jax.random.PRNGKey(1), scfg)
    sparams["frontend"] = params["frontend"]
    sparams["encoder"] = params["encoder"]
    rules = {"trained": EndpointRule(True, 0.8, 0.0, float("inf"))}
    mesh = make_serving_mesh(8)
    sched = Scheduler(sparams, scfg, VOCAB, max_slots=8, mesh=mesh,
                      rules=rules, donate_state=False)
    audio = _sentence_audio(golden, total=3.84)
    streams = [sched.admit(f"t{i}") for i in range(3)]
    for s in streams:
        s.accept_waveform(audio)
        s.add_tail_padding()
    events = sched.drain()
    for s in streams:
        finals = [e.text.strip() for e in events
                  if e.kind == "final" and e.stream_id == s.id
                  and e.text.strip()]
        assert finals == [golden], (s.id, finals)


def test_mulaw_upload_serves_golden(trained):
    """upload_encoding="mulaw" is the production default (halves upload
    bytes over the host link); the G.711 companding plus the native
    gather+encode codec must not move the golden transcript."""
    cfg, params, _, golden = trained
    scfg = ServingConfig(asr=cfg, use_silero=False, use_energy_gate=False,
                         energy_threshold_db=-200.0,
                         upload_encoding="mulaw")
    sparams = init_serving_params(jax.random.PRNGKey(1), scfg)
    sparams["frontend"] = params["frontend"]
    sparams["encoder"] = params["encoder"]
    rules = {"trained": EndpointRule(True, 0.8, 0.0, float("inf"))}
    sched = Scheduler(sparams, scfg, VOCAB, max_slots=2, rules=rules)
    s = sched.admit("t0")
    s.accept_waveform(_sentence_audio(golden, total=3.84))
    s.add_tail_padding()
    events = sched.drain()
    finals = [e.text.strip() for e in events
              if e.kind == "final" and e.text.strip()]
    assert finals == [golden], (finals,
                                [(e.kind, e.text) for e in events])


def test_grouped_scheduler_serves_golden(trained):
    """GroupedScheduler (the latency-oriented production mode: slots
    split into independently ticked groups) must serve the exact golden
    transcript for streams landing in DIFFERENT groups."""
    from asr_streaming_tpu.streaming.scheduler import GroupedScheduler
    cfg, params, _, golden = trained
    scfg = ServingConfig(asr=cfg, use_silero=False, use_energy_gate=False,
                         energy_threshold_db=-200.0)
    sparams = init_serving_params(jax.random.PRNGKey(1), scfg)
    sparams["frontend"] = params["frontend"]
    sparams["encoder"] = params["encoder"]
    rules = {"trained": EndpointRule(True, 0.8, 0.0, float("inf"))}
    sched = GroupedScheduler(sparams, scfg, VOCAB, max_slots=4, groups=2,
                             rules=rules)
    audio = _sentence_audio(golden, total=3.84)
    streams = [sched.admit(f"t{i}") for i in range(3)]  # spans both groups
    for s in streams:
        s.accept_waveform(audio)
        s.add_tail_padding()
    events = sched.drain()
    for s in streams:
        finals = [e.text.strip() for e in events
                  if e.kind == "final" and e.stream_id == s.id
                  and e.text.strip()]
        assert finals == [golden], (s.id, finals)


def test_worker_mode_serves_golden(trained, tmp_path):
    """device_worker mode (the production default: a spawned child owns
    the device, shared-memory staging, checkpoint-loaded params) must
    serve the exact golden transcript — the only worker test with
    learned weights, so a child-side param mismatch or staging
    corruption would surface as a wrong transcript, not just a shape
    error."""
    cfg, params, _, golden = trained
    scfg = ServingConfig(asr=cfg, use_silero=False, use_energy_gate=False,
                         energy_threshold_db=-200.0)
    sparams = init_serving_params(jax.random.PRNGKey(1), scfg)
    sparams["frontend"] = params["frontend"]
    sparams["encoder"] = params["encoder"]
    path = str(tmp_path / "worker_overfit.npz")
    save_params(path, sparams)

    rules = {"trained": EndpointRule(True, 0.8, 0.0, float("inf"))}
    sched = Scheduler(sparams, scfg, VOCAB, max_slots=2, rules=rules,
                      device_worker={"seed": 1, "checkpoint": path,
                                     "platform": "cpu"})
    try:
        assert sched.warmup() > 0
        s = sched.admit("t0")
        s.accept_waveform(_sentence_audio(golden, total=3.84))
        s.add_tail_padding()
        events = sched.drain()
    finally:
        sched.close()
    finals = [e.text.strip() for e in events
              if e.kind == "final" and e.text.strip()]
    assert golden in finals, (golden, [(e.kind, e.text) for e in events])


def test_asrmodel_api_transcribes_golden(trained, tmp_path):
    """The user-facing ASRModel surface (checkpoint load -> offline
    transcribe via the chunk scan, reference LightningASR
    recognition.py:136-217) must reproduce the golden transcript from the
    checkpoint file alone."""
    from asr_streaming_tpu.models.api import ASRModel
    cfg, params, _, golden = trained
    path = str(tmp_path / "api_overfit.npz")
    save_params(path, params)
    model = ASRModel(cfg=cfg, checkpoint=path, vocab=VOCAB)
    text = model.transcribe(_sentence_audio(golden))
    assert text.strip() == golden, (golden, text)


def test_websocket_server_serves_golden(trained):
    """Full network stack with learned weights: StreamingServer over the
    trained scheduler, a real websocket client streaming int16 PCM
    packets, EOS flush — the final JSON must carry the exact golden
    transcript (reference protocol, streaming_server.py:339-572)."""
    import asyncio
    import json as json_mod
    import os

    import websockets

    from asr_streaming_tpu.server.ws_server import StreamingServer

    cfg, params, _, golden = trained
    scfg = ServingConfig(asr=cfg, use_silero=False, use_energy_gate=False,
                         energy_threshold_db=-200.0)
    sparams = init_serving_params(jax.random.PRNGKey(1), scfg)
    sparams["frontend"] = params["frontend"]
    sparams["encoder"] = params["encoder"]
    rules = {"trained": EndpointRule(True, 0.8, 0.0, float("inf"))}
    sched = Scheduler(sparams, scfg, VOCAB, max_slots=2, rules=rules)
    server = StreamingServer(sched, tick_idle_sleep=0.002)
    port = 18550 + (os.getpid() % 300)

    audio = _sentence_audio(golden, total=3.84)
    pcm = (np.clip(audio, -1, 1) * 32767).astype(np.int16).tobytes()

    async def client():
        url = (f"ws://127.0.0.1:{port}/voice/api/asr/v1/ws/decode_online"
               f"?content-type=audio/x-raw,+layout=(string)interleaved,"
               f"+rate=(int)16000")
        for _ in range(120):
            try:
                ws = await websockets.connect(url)
                break
            except OSError:
                await asyncio.sleep(0.5)
        messages = []
        async with ws:
            step = 16000 // 4 * 2          # 0.25 s packets
            for i in range(0, len(pcm), step):
                await ws.send(pcm[i:i + step])
                await asyncio.sleep(0.01)
            await ws.send(json_mod.dumps({"__COMMAND__": "__EOS__"}))
            while True:
                msg = await asyncio.wait_for(ws.recv(), timeout=60)
                messages.append(msg)
                if msg == "__REQUEST_COMPLETED__":
                    break
        return messages

    async def run():
        task = asyncio.create_task(server.run(port))
        await asyncio.sleep(0.3)
        try:
            return await client()
        finally:
            task.cancel()
            server.stop_ticks()

    messages = asyncio.run(run())
    finals = [json_mod.loads(m)["result"]["hypotheses"][0]["transcript"]
              for m in messages
              if m != "__REQUEST_COMPLETED__"
              and json_mod.loads(m).get("result", {}).get("final")]
    assert any(t.strip() == golden for t in finals), (golden, messages)


def test_44k_resample_serves_golden(trained):
    """A 44.1 kHz client: the websocket server's streaming polyphase
    resampler (utils/resample.py, reference streaming_server.py:348-360)
    must deliver audio the trained model still transcribes exactly —
    pure tones survive resampling up to filter ripple, so a wrong
    transcript means a resampler defect, not audio loss."""
    import asyncio
    import json as json_mod
    import os

    import websockets

    from asr_streaming_tpu.server.ws_server import StreamingServer

    cfg, params, _, golden = trained
    scfg = ServingConfig(asr=cfg, use_silero=False, use_energy_gate=False,
                         energy_threshold_db=-200.0)
    sparams = init_serving_params(jax.random.PRNGKey(1), scfg)
    sparams["frontend"] = params["frontend"]
    sparams["encoder"] = params["encoder"]
    rules = {"trained": EndpointRule(True, 0.8, 0.0, float("inf"))}
    sched = Scheduler(sparams, scfg, VOCAB, max_slots=2, rules=rules)
    server = StreamingServer(sched, tick_idle_sleep=0.002)
    port = 18880 + (os.getpid() % 300)

    # golden audio synthesized NATIVELY at 44.1 kHz (same timing layout)
    sr = 44100
    parts = []
    for ch in golden:
        t = np.arange(int(sr * TONE_SEC)) / sr
        w = 0.3 * np.sin(2 * np.pi * TONE_HZ[ch] * t)
        ramp = np.minimum(1.0, np.arange(len(t)) / (0.010 * sr))
        parts.extend([(w * ramp * ramp[::-1]).astype(np.float32),
                      np.zeros(int(sr * GAP_SEC), np.float32)])
    audio = np.concatenate(parts)
    audio = np.pad(audio, (0, int(sr * 3.84) - len(audio)))
    pcm = (np.clip(audio, -1, 1) * 32767).astype(np.int16).tobytes()

    async def client():
        url = (f"ws://127.0.0.1:{port}/voice/api/asr/v1/ws/decode_online"
               f"?content-type=audio/x-raw,+layout=(string)interleaved,"
               f"+rate=(int)44100")
        for _ in range(120):
            try:
                ws = await websockets.connect(url)
                break
            except OSError:
                await asyncio.sleep(0.5)
        messages = []
        async with ws:
            step = 44100 // 4 * 2
            for i in range(0, len(pcm), step):
                await ws.send(pcm[i:i + step])
                await asyncio.sleep(0.01)
            await ws.send(json_mod.dumps({"__COMMAND__": "__EOS__"}))
            while True:
                msg = await asyncio.wait_for(ws.recv(), timeout=60)
                messages.append(msg)
                if msg == "__REQUEST_COMPLETED__":
                    break
        return messages

    async def run():
        task = asyncio.create_task(server.run(port))
        await asyncio.sleep(0.3)
        try:
            return await client()
        finally:
            task.cancel()
            server.stop_ticks()

    messages = asyncio.run(run())
    finals = [json_mod.loads(m)["result"]["hypotheses"][0]["transcript"]
              for m in messages
              if m != "__REQUEST_COMPLETED__"
              and json_mod.loads(m).get("result", {}).get("final")]
    assert any(t.strip() == golden for t in finals), (golden, messages)


def test_golden_survives_f16_emission_roundtrip(trained):
    """The serving path stores per-frame argmax through an f16-packed
    emission ring buffer (models/serving.py).  The golden sentence's
    frame decisions must be stable under f16 quantization of the log-
    probs — i.e. the trained margins are real, not float artifacts."""
    cfg, params, _, golden = trained
    feats = log_mel(params["frontend"], cfg.mel,
                    jnp.asarray(_sentence_audio(golden))[None])
    log_probs, _ = encoder_forward(params["encoder"], cfg.encoder, feats)
    lp = np.asarray(log_probs)[0]
    lp16 = lp.astype(np.float16).astype(np.float32)
    text, _ = greedy_search_full(lp16, VOCAB)
    assert text.strip() == golden, (golden, text)


# ---------------------------------------------------- trained-VAD golden loop

@pytest.fixture(scope="module")
def trained_vad(trained):
    """Train the Silero-shaped VAD (train/vad.py) on the tone corpus's
    energy labels, at the exact serving decision geometry: one wave per
    scheduler chunk (0.2 s ring-buffer context + 0.64 s segment), window
    labels aligned with silero_chunk_probs' 512-sample windows.

    Acceptance-driven like the AM fixture: a seed only returns once the
    CHUNK-level speech decisions (any window > 0.5 — exactly the serving
    gate, models/serving.py _vad_stage) match the energy labels on every
    training wave; otherwise the next seed trains."""
    import jax.numpy as jnp
    from asr_streaming_tpu.models.vad import silero_chunk_probs
    from asr_streaming_tpu.train.vad import (
        VadTrainConfig, train_vad, window_labels,
    )

    cfg, _params, _, _golden = trained
    seg, buf = cfg.audio.segment_length, cfg.audio.buffer_length
    T = buf + seg

    def serving_slices(audio: np.ndarray) -> list:
        """The waves the serving VAD actually sees for this stream."""
        n_chunks = len(audio) // seg
        out = []
        padded = np.concatenate([np.zeros(buf, np.float32), audio])
        for k in range(n_chunks):
            out.append(padded[k * seg:k * seg + T])
        return out

    waves = []
    lead = buf / SR
    for s in TRAIN_SENTENCES:
        for off in (0.0, lead, 0.64):      # incl. a one-chunk lead
            waves.extend(serving_slices(
                _sentence_audio(s, total=3.84, lead=off)))
    waves.append(np.zeros(T, np.float32))  # pure silence
    waves = np.stack(waves)
    labels = window_labels(waves, VadTrainConfig().silero)
    assert labels.any() and not labels.all()

    vcfg = VadTrainConfig(base_lr=3e-3)

    def _chunk_decisions_ok(params):
        probs = np.asarray(silero_chunk_probs(params, vcfg.silero,
                                              jnp.asarray(waves)))
        return ((probs > 0.5).any(axis=1)
                == labels.astype(bool).any(axis=1)).all()

    from tests.fixture_assets import load_asset
    asset = load_asset("overfit_ctc_vad")
    if asset is not None:
        vparams, meta = asset
        vparams = jax.tree.map(jnp.asarray, vparams)
        if _chunk_decisions_ok(vparams):
            return vparams, float(meta["loss"])

    for seed in (0, 1, 2):
        params, loss = train_vad(waves, labels, vcfg, steps=250, seed=seed)
        probs = np.asarray(silero_chunk_probs(params, vcfg.silero,
                                              jnp.asarray(waves)))
        chunk_pred = (probs > 0.5).any(axis=1)
        chunk_true = labels.astype(bool).any(axis=1)
        if (chunk_pred == chunk_true).all():
            return params, loss
    raise AssertionError(
        f"VAD failed to learn chunk decisions (bce={loss})")


def test_trained_vad_window_quality(trained_vad):
    _, loss = trained_vad
    assert loss < 0.25, f"VAD under-trained (bce={loss})"


def test_trained_vad_gates_silence_and_serves_exact(trained, trained_vad):
    """The flagship on-device routing claim with LEARNED weights on BOTH
    sides: decode = active & (contain | (gate & silero)) must (a) skip
    pure-silence chunks without touching the model — the reference's
    two-stage VAD skip, streaming_server.py:400-411 / vad_silero.py:
    104-137 — and (b) still serve the EXACT transcript, with endpointing
    driven across skipped chunks (stream.skip_silence trailing-silence
    accounting, reference stream.py:181-187)."""
    cfg, params, _, golden = trained
    vad_params, _ = trained_vad

    scfg = ServingConfig(asr=cfg, use_silero=True, use_energy_gate=False)
    sparams = init_serving_params(jax.random.PRNGKey(1), scfg)
    sparams["frontend"] = params["frontend"]
    sparams["encoder"] = params["encoder"]
    sparams["vad"] = vad_params
    rules = {"trained": EndpointRule(True, 0.8, 0.0, float("inf"))}
    sched = Scheduler(sparams, scfg, VOCAB, max_slots=2, rules=rules)

    # one full chunk of leading silence (must be SKIPPED), the sentence,
    # then trailing silence (first trailing chunk may decode via the ring
    # buffer's 0.2 s context; the rest must be skipped)
    seg_sec = cfg.audio.segment_seconds
    audio = np.concatenate([
        np.zeros(int(SR * seg_sec), np.float32),
        _sentence_audio(golden, total=4.48),
    ])
    s = sched.admit("t0")
    s.accept_waveform(audio)
    s.add_tail_padding()
    events = sched.drain()

    finals = [e.text.strip() for e in events
              if e.kind == "final" and e.text.strip()]
    assert golden in finals, (golden, finals,
                              [(e.kind, e.text) for e in events])

    counters = sched.timers.snapshot()["counters"]
    processed = counters["chunks_processed"]
    decoded = counters.get("chunks_decoded", 0)
    # the VAD gate must have actually routed: silence chunks skipped
    # (leading chunk + >= 2 trailing), speech chunks decoded
    assert 0 < decoded < processed, (decoded, processed)
    assert processed - decoded >= 3, (decoded, processed)


def test_trained_vad_random_weights_control(trained, trained_vad):
    """Control: the trained-VAD assertion is earned by training.  At the
    WINDOW level (the unit the gate thresholds), the trained weights
    must classify the serving waves essentially perfectly while random
    weights must not — chunk-level ANY can be matched by a lucky random
    net on a handful of chunks (observed), window-level cannot.

    Note the serving test above is ALSO self-controlling: an
    always-speech VAD fails its skipped>=3 assertion and an
    always-silence VAD fails its exact-transcript assertion."""
    import jax.numpy as jnp
    from asr_streaming_tpu.models.vad import (
        init_silero_params, silero_chunk_probs, SileroConfig,
    )
    from asr_streaming_tpu.train.vad import window_labels

    cfg, _, _, golden = trained
    vad_params, _ = trained_vad
    seg, buf = cfg.audio.segment_length, cfg.audio.buffer_length
    audio = np.concatenate([
        np.zeros(seg, np.float32), _sentence_audio(golden, total=4.48)])
    padded = np.concatenate([np.zeros(buf, np.float32), audio])
    waves = np.stack([padded[k * seg:k * seg + buf + seg]
                      for k in range(len(audio) // seg)])
    labels = window_labels(waves, SileroConfig())

    def window_acc(params):
        probs = np.asarray(silero_chunk_probs(params, SileroConfig(),
                                              jnp.asarray(waves)))
        return float(((probs > 0.5) == labels.astype(bool)).mean())

    acc_trained = window_acc(vad_params)
    acc_random = max(window_acc(init_silero_params(jax.random.PRNGKey(k)))
                     for k in (3, 4, 5))
    assert acc_trained > 0.97, acc_trained
    assert acc_trained > acc_random + 0.02, (acc_trained, acc_random)


def test_int8_ffn_quant_preserves_golden_transcript(trained):
    """WER impact of the opt-in quantized kernels on learned weights:
    serving the overfit model with quant=int8_ffn (W8A8 on the FFN
    matmuls — the variant that measured fastest on v5e) must still emit
    the exact transcript.  Runs the Pallas megakernel in interpret mode
    off-TPU, so the quantization arithmetic itself is what's under test."""
    import dataclasses

    cfg, params, _, golden = trained
    enc = dataclasses.replace(
        cfg.encoder, emformer=dataclasses.replace(
            cfg.encoder.emformer, use_pallas_stack=True,
            pallas_stack_tile=2, quant="int8_ffn"))
    qcfg = dataclasses.replace(cfg, encoder=enc)
    scfg = ServingConfig(asr=qcfg, use_silero=False, use_energy_gate=False,
                         energy_threshold_db=-200.0)
    sparams = init_serving_params(jax.random.PRNGKey(1), scfg)
    sparams["frontend"] = params["frontend"]
    sparams["encoder"] = params["encoder"]
    rules = {"trained": EndpointRule(True, 0.8, 0.0, float("inf"))}
    sched = Scheduler(sparams, scfg, VOCAB, max_slots=2, rules=rules)
    s = sched.admit("q0")
    s.accept_waveform(_sentence_audio(golden, total=3.84))
    s.add_tail_padding()
    events = sched.drain()
    finals = [e.text.strip() for e in events
              if e.kind == "final" and e.text.strip()]
    assert golden in finals, (golden, finals)
