"""Client library: stream_audio against an in-process server; bilingual
merge logic."""

import asyncio
import os

import numpy as np

from asr_streaming_tpu.client.asr_client import stream_audio
from asr_streaming_tpu.client.dual_client import (
    MergedSegment, merge_bilingual,
)
from tests.test_server import build_server, pcm_bytes

PORT = 18450 + (os.getpid() % 60)


def test_stream_audio_client_end_to_end():
    async def run():
        server = build_server()
        task = asyncio.create_task(server.run(PORT))
        # wait for bind
        for _ in range(240):
            try:
                r, w = await asyncio.open_connection("127.0.0.1", PORT)
                w.close()
                break
            except OSError:
                await asyncio.sleep(0.5)
        try:
            return await stream_audio(
                f"ws://127.0.0.1:{PORT}/x", pcm_bytes(2.5),
                realtime=False, request_id="cli-1")
        finally:
            task.cancel()
            server.stop_ticks()

    result = asyncio.run(run())
    assert result.completed
    assert result.finals and result.transcript.strip()
    assert result.finals[-1]["id"] == "cli-1"
    assert result.partials
    assert result.first_partial_latency is not None


def test_merge_bilingual_prefers_confidence():
    vi = [MergedSegment(0.0, 2.0, "xin chao", "vi", 0.6),
          MergedSegment(2.5, 4.0, "tam biet", "vi", 0.9)]
    en = [MergedSegment(0.1, 1.9, "hello", "en", 0.8),
          MergedSegment(5.0, 6.0, "goodbye", "en", 0.7)]
    merged = merge_bilingual(vi, en)
    # overlapping segment: en wins on confidence
    assert merged[0].text == "hello"
    # non-overlapping vi segment kept
    assert merged[1].text == "tam biet"
    # non-overlapping en segment appended
    assert merged[2].text == "goodbye"
    # ties / lower en confidence keep vi
    vi2 = [MergedSegment(0.0, 2.0, "a", "vi", 0.8)]
    en2 = [MergedSegment(0.0, 2.0, "b", "en", 0.8)]
    assert merge_bilingual(vi2, en2)[0].text == "a"
