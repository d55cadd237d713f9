"""Websocket server protocol E2E (tiny model, in-process client)."""

import asyncio
import json
import os

import numpy as np
import jax
import pytest
import websockets

from asr_streaming_tpu.models.asr import ASRConfig
from asr_streaming_tpu.models.serving import ServingConfig, init_serving_params
from asr_streaming_tpu.streaming.scheduler import Scheduler
from asr_streaming_tpu.streaming.endpoint import EndpointRule
from asr_streaming_tpu.server.ws_server import StreamingServer
from asr_streaming_tpu.server.protocol import parse_text_message

VOCAB = ["-", "|"] + [chr(ord("a") + i) for i in range(19)]
FLUSH_RULES = {"flush": EndpointRule(True, 0.0, 1.9, float("inf"))}
PORT = 18200 + (os.getpid() % 300)  # avoid collisions with stale runs


def build_server(max_slots=4):
    cfg = ServingConfig(asr=ASRConfig.tiny(vocab_size=len(VOCAB)),
                        use_silero=False)
    params = init_serving_params(jax.random.PRNGKey(0), cfg)
    sched = Scheduler(params, cfg, VOCAB, max_slots=max_slots,
                      rules=FLUSH_RULES)
    return StreamingServer(sched, tick_idle_sleep=0.002)


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


async def _run_client(port):
    messages = []
    async with await _connect_with_retry(
            f"ws://127.0.0.1:{port}/voice/api/asr/v1/ws/decode_online"
            f"?content-type=audio/x-raw,+layout=(string)interleaved,"
            f"+rate=(int)16000") as ws:
        # stream 3 s of "speech" in 0.25 s packets
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


async def _run_test():
    server = build_server()
    server_task = asyncio.create_task(server.run(PORT))
    await asyncio.sleep(0.3)
    try:
        messages = await _run_client(PORT)
    finally:
        server_task.cancel()
        server.stop_ticks()
    return messages


def test_ws_protocol_end_to_end():
    messages = asyncio.run(_run_test())
    assert messages[-1] == "__REQUEST_COMPLETED__"
    parsed = [json.loads(m) for m in messages[:-1]]
    finals = [m for m in parsed if m["result"].get("final")]
    partials = [m for m in parsed if not m["result"].get("final")]
    assert len(finals) >= 1, parsed
    assert len(partials) >= 1
    f = finals[0]
    hyp = f["result"]["hypotheses"][0]
    assert hyp["transcript"].strip() != ""
    assert f["segment_length"] > 0
    # schema parity with the reference DecodedResult
    for key in ("id", "status", "msg", "segment", "segment_start",
                "segment_length", "total_length", "message_type",
                "word_start", "word_end", "snr", "vol_noise", "vol_speech",
                "is_speaker"):
        assert key in f, key


def test_http_fallback(tmp_path):
    (tmp_path / "index.html").write_text("<html>asr</html>")

    async def run():
        server = build_server()
        server.static = __import__(
            "asr_streaming_tpu.server.http_static",
            fromlist=["StaticFiles"]).StaticFiles(str(tmp_path))
        task = asyncio.create_task(server.run(PORT + 1))
        await asyncio.sleep(0.3)
        try:
            import urllib.request

            def fetch():
                for _ in range(120):
                    try:
                        with urllib.request.urlopen(
                                f"http://127.0.0.1:{PORT + 1}/",
                                timeout=10) as r:
                            return r.read()
                    except OSError:
                        import time
                        time.sleep(0.5)
                raise ConnectionRefusedError

            return await asyncio.to_thread(fetch)
        finally:
            task.cancel()
            server.stop_ticks()

    body = asyncio.run(run())
    assert b"asr" in body


def test_parse_text_message():
    assert parse_text_message("Done").kind == "eos"
    assert parse_text_message("EOS").kind == "eos"
    cmd = parse_text_message(json.dumps({
        "__COMMAND__": "__SET_AUDIO_FORMAT__",
        "__ARGUMENT__": {"sample_rate": 44100},
        "request-id": "r1"}))
    assert cmd.kind == "set_format"
    assert cmd.sample_rate == 44100
    assert cmd.request_id == "r1"
    assert parse_text_message("garbage{").kind == "unknown"


def test_sender_services_barrier_after_connection_closed():
    """Regression: a dead connection must not strand _flush_eos's
    __barrier__ event — the sender used to exit on ConnectionClosed,
    leaking the handler, the slot, and the admission count (observed as
    a whole load-test's connections still 'active' after the clients
    vanished)."""
    from asr_streaming_tpu.streaming.scheduler import StreamEvent

    server = build_server()

    class DeadConnection:
        async def send(self, *_a, **_k):
            raise websockets.exceptions.ConnectionClosedOK(None, None)

    async def run():
        outbox = asyncio.Queue()
        sender = asyncio.create_task(
            server._sender(DeadConnection(), None, outbox))
        # a partial send fails (connection dead) ...
        outbox.put_nowait(StreamEvent(stream_id="s", kind="partial",
                                      text="xin chao"))
        # ... and the barrier queued behind it MUST still be set
        barrier = asyncio.Event()
        ev = StreamEvent(stream_id="s", kind="__barrier__")
        ev._barrier = barrier
        outbox.put_nowait(ev)
        await asyncio.wait_for(barrier.wait(), timeout=5)
        sender.cancel()

    asyncio.run(run())


def test_graceful_signal_install_overrides_ignored_sigint():
    """Backgrounded children of non-interactive shells inherit
    SIGINT=SIG_IGN; install_graceful_signals must still route BOTH
    SIGINT and SIGTERM into KeyboardInterrupt on the main thread so
    main()'s drain branch (scheduler.close before exit) always runs."""
    import signal

    from asr_streaming_tpu.server import __main__ as server_main

    old_int = signal.getsignal(signal.SIGINT)
    old_term = signal.getsignal(signal.SIGTERM)
    try:
        signal.signal(signal.SIGINT, signal.SIG_IGN)   # simulate `&` launch
        server_main.install_graceful_signals()
        with pytest.raises(KeyboardInterrupt):
            os.kill(os.getpid(), signal.SIGINT)
        with pytest.raises(KeyboardInterrupt):
            os.kill(os.getpid(), signal.SIGTERM)
    finally:
        signal.signal(signal.SIGINT, old_int)
        signal.signal(signal.SIGTERM, old_term)
