"""gRPC master façade + web gateway E2E against a tiny worker server."""

import asyncio
import json
import os

import numpy as np
import grpc
import pytest

from tests.test_server import build_server, pcm_bytes

PORT_BASE = 18700 + (os.getpid() % 100)
PORT_GRPC = PORT_BASE + 100
PORT_WEB = PORT_BASE + 200


async def _start_worker(port):
    server = build_server()
    task = asyncio.create_task(server.run(port))
    # wait for warmup-compile + bind
    for _ in range(240):
        try:
            reader, writer = await asyncio.open_connection("127.0.0.1",
                                                           port)
            writer.close()
            return server, task
        except OSError:
            await asyncio.sleep(0.5)
    raise TimeoutError("worker did not start")


def test_grpc_master_end_to_end():
    from asr_streaming_tpu.server.grpc_master import (
        METHOD, SERVICE, make_server,
    )

    async def run():
        worker, wtask = await _start_worker(PORT_BASE)
        gserver = make_server([f"ws://127.0.0.1:{PORT_BASE}/"], PORT_GRPC)
        await gserver.start()
        try:
            async with grpc.aio.insecure_channel(
                    f"127.0.0.1:{PORT_GRPC}") as channel:
                call = channel.stream_stream(
                    f"/{SERVICE}/{METHOD}",
                    request_serializer=lambda b: b,
                    response_deserializer=lambda b: b)

                async def frames():
                    data = pcm_bytes(2.5)
                    step = 8000
                    for i in range(0, len(data), step):
                        yield data[i:i + step]
                    yield json.dumps({"__COMMAND__": "__EOS__"}).encode()

                messages = []
                async for reply in call(frames()):
                    messages.append(reply)
                    if reply == b"__REQUEST_COMPLETED__":
                        break
                return messages
        finally:
            await gserver.stop(None)
            wtask.cancel()
            worker.stop_ticks()

    messages = asyncio.run(run())
    assert messages[-1] == b"__REQUEST_COMPLETED__"
    parsed = [json.loads(m) for m in messages[:-1]]
    assert any(p["result"].get("final") for p in parsed)


def test_web_gateway_end_to_end():
    from aiohttp import ClientSession, WSMsgType
    from aiohttp.test_utils import TestServer
    from asr_streaming_tpu.server.web_gateway import WebGateway

    async def run():
        worker, wtask = await _start_worker(PORT_BASE + 1)
        gw = WebGateway(vi_url=f"ws://127.0.0.1:{PORT_BASE + 1}/")
        test_server = TestServer(gw.app(), port=PORT_WEB)
        await test_server.start_server()
        got = []
        try:
            async with ClientSession() as session:
                async with session.ws_connect(
                        f"http://127.0.0.1:{PORT_WEB}/ws") as ws:
                    await ws.send_bytes(pcm_bytes(2.5))
                    await ws.send_str("Done")
                    while True:
                        msg = await asyncio.wait_for(ws.receive(),
                                                     timeout=30)
                        if msg.type != WSMsgType.TEXT:
                            break
                        blob = json.loads(msg.data)
                        got.append(blob)
                        if blob.get("completed"):
                            break
        finally:
            await test_server.close()
            wtask.cancel()
            worker.stop_ticks()
        return got

    got = asyncio.run(run())
    assert any(b.get("language") == "vi" and "result" in b for b in got)
    assert got[-1].get("completed")
