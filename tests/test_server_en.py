"""English (RNNT) server E2E over websocket."""

import asyncio
import dataclasses
import json
import os

import numpy as np
import jax

from asr_streaming_tpu.models.asr import ASRConfig
from asr_streaming_tpu.models.rnnt import RNNTConfig
from asr_streaming_tpu.models.serving import (
    ServingConfig, init_serving_params,
)
from asr_streaming_tpu.streaming.endpoint import EndpointRule
from asr_streaming_tpu.streaming.scheduler import Scheduler
from asr_streaming_tpu.server.ws_server import StreamingServer
from asr_streaming_tpu.utils.audio import EN_AUDIO
from tests.test_server import _connect_with_retry, pcm_bytes

PORT = 18610 + (os.getpid() % 80)
RNNT_CFG = RNNTConfig.tiny()
PIECES = [f"▁t{i}" for i in range(RNNT_CFG.vocab_size - 1)] + ["<b>"]


def build_en_server():
    from asr_streaming_tpu.models.rnnt import make_rnnt_rescorer
    asr = dataclasses.replace(ASRConfig.tiny(), audio=EN_AUDIO)
    cfg = ServingConfig(asr=asr, model_kind="rnnt", rnnt=RNNT_CFG,
                        use_silero=False)
    params = init_serving_params(jax.random.PRNGKey(0), cfg)
    sched = Scheduler(params, cfg, PIECES, max_slots=4, language="en",
                      rules={"flush": EndpointRule(True, 0.0, 0.9,
                                                   float("inf"))})
    return StreamingServer(
        sched, tick_idle_sleep=0.002,
        en_rescorer=make_rnnt_rescorer(params, RNNT_CFG, PIECES,
                                       beam_width=2))


def test_en_server_end_to_end():
    async def run():
        server = build_en_server()
        task = asyncio.create_task(server.run(PORT))
        messages = []
        try:
            ws = await _connect_with_retry(f"ws://127.0.0.1:{PORT}/x")
            async with ws:
                await ws.send(pcm_bytes(2.0))
                await ws.send("Done")
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
    assert messages[-1] == "__REQUEST_COMPLETED__"
    parsed = [json.loads(m) for m in messages[:-1]]
    finals = [m for m in parsed if m["result"].get("final")]
    assert finals
    hyp = finals[0]["result"]["hypotheses"][0]
    # EN final payload shape (reference get_hypotheses_en):
    assert set(hyp.keys()) == {"transcript", "transcript_normalized"}
    assert hyp["transcript"].strip()
