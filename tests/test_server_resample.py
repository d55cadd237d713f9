"""Server-side input resampling E2E (the reference's pydub/ffmpeg path,
streaming_server.py:348-360, here utils/resample.py)."""

import asyncio
import json
import os

import numpy as np
import websockets

from tests.test_server import build_server, _connect_with_retry

PORT = 18520 + (os.getpid() % 80)


def pcm_44k(seconds, seed=0):
    rng = np.random.default_rng(seed)
    f = rng.standard_normal(int(44100 * seconds)) * 0.3
    return (np.clip(f, -1, 1) * 32767).astype(np.int16).tobytes()


async def _run():
    server = build_server()
    task = asyncio.create_task(server.run(PORT))
    messages = []
    try:
        ws = await _connect_with_retry(
            f"ws://127.0.0.1:{PORT}/voice/api/asr/v1/ws/decode_online"
            f"?content-type=audio/x-raw,+layout=(string)interleaved,"
            f"+rate=(int)44100")
        async with ws:
            data = pcm_44k(2.5)
            step = 44100 // 4 * 2
            for i in range(0, len(data), step):
                await ws.send(data[i:i + step])
            await ws.send(json.dumps({"__COMMAND__": "__EOS__"}))
            while True:
                msg = await asyncio.wait_for(ws.recv(), timeout=30)
                messages.append(msg)
                if msg == "__REQUEST_COMPLETED__":
                    break
    finally:
        task.cancel()
        server.stop_ticks()
    return messages


def test_44k_input_is_resampled_and_decoded():
    messages = asyncio.run(_run())
    assert messages[-1] == "__REQUEST_COMPLETED__"
    parsed = [json.loads(m) for m in messages[:-1]]
    finals = [m for m in parsed if m["result"].get("final")]
    assert finals, parsed
    # 2.5 s of 44.1 kHz audio -> ~2.5 s decoded at 16 kHz (not 6.9 s):
    # segment_length counts decoded utterance seconds
    assert finals[-1]["segment_length"] <= 3.5


def test_set_audio_format_command_switches_rate():
    """The v1 __SET_AUDIO_FORMAT__ command must also enable resampling."""

    async def run():
        server = build_server()
        task = asyncio.create_task(server.run(PORT + 1))
        messages = []
        try:
            ws = await _connect_with_retry(f"ws://127.0.0.1:{PORT + 1}/x")
            async with ws:
                await ws.send(json.dumps({
                    "__COMMAND__": "__SET_AUDIO_FORMAT__",
                    "__ARGUMENT__": {"sample_rate": 44100},
                    "request-id": "rid-7"}))
                await ws.send(pcm_44k(2.5, seed=1))
                await ws.send(json.dumps({"__COMMAND__": "__EOS__"}))
                while True:
                    msg = await asyncio.wait_for(ws.recv(), timeout=30)
                    messages.append(msg)
                    if msg == "__REQUEST_COMPLETED__":
                        break
        finally:
            task.cancel()
            server.stop_ticks()
        return messages

    messages = asyncio.run(run())
    parsed = [json.loads(m) for m in messages[:-1]]
    finals = [m for m in parsed if m["result"].get("final")]
    assert finals
    # client-supplied request id is echoed on finals (v1 protocol)
    assert finals[-1]["id"] == "rid-7"
