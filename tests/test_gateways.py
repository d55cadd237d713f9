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


def test_socketio_websocket_transport_end_to_end():
    """Hand-rolled Socket.IO 4.x frames (no socketio client package):
    direct websocket transport — open packet, namespace connect,
    base64 'audio_data' events in, 'asr_result' events out (the exact
    protocol of the reference's browser assets, asr_web_app/app.py:
    180-213 + templates/index.html:118)."""
    import base64

    from aiohttp import ClientSession, WSMsgType
    from aiohttp.test_utils import TestServer
    from asr_streaming_tpu.server.web_gateway import WebGateway

    async def run():
        worker, wtask = await _start_worker(PORT_BASE + 2)
        gw = WebGateway(vi_url=f"ws://127.0.0.1:{PORT_BASE + 2}/")
        test_server = TestServer(gw.app(), port=PORT_WEB + 1)
        await test_server.start_server()
        results = []
        try:
            async with ClientSession() as session:
                async with session.ws_connect(
                        f"http://127.0.0.1:{PORT_WEB + 1}/socket.io/"
                        "?EIO=4&transport=websocket") as ws:
                    msg = await asyncio.wait_for(ws.receive(), timeout=10)
                    assert msg.data.startswith("0{"), msg.data
                    open_blob = json.loads(msg.data[1:])
                    assert open_blob["pingInterval"] > 0

                    await ws.send_str("40")        # namespace connect
                    msg = await asyncio.wait_for(ws.receive(), timeout=10)
                    assert msg.data.startswith("40{"), msg.data

                    audio = pcm_bytes(2.5)
                    step = 8000
                    deadline = asyncio.get_event_loop().time() + 60
                    sent = 0
                    while asyncio.get_event_loop().time() < deadline:
                        if sent < len(audio):
                            await ws.send_str("42" + json.dumps(
                                ["audio_data", {"audio": base64.b64encode(
                                    audio[sent:sent + step]).decode()}]))
                            sent += step
                        try:
                            msg = await asyncio.wait_for(ws.receive(),
                                                         timeout=0.25)
                        except asyncio.TimeoutError:
                            continue
                        if msg.type != WSMsgType.TEXT:
                            break
                        if msg.data == "2":        # server ping
                            await ws.send_str("3")
                        elif msg.data.startswith("42"):
                            name, data = json.loads(msg.data[2:])
                            assert name == "asr_result"
                            results.append(data)
                            if data["isFinal"]:
                                break
        finally:
            await test_server.close()
            wtask.cancel()
            worker.stop_ticks()
        return results

    results = asyncio.run(run())
    assert results, "no asr_result events"
    assert all(r["type"] == "vi" for r in results)
    assert any(r["isFinal"] for r in results)


def test_socketio_polling_handshake_and_upgrade():
    """Engine.IO v4 polling handshake then websocket upgrade: GET open
    packet, POST '40' connect, long-poll the '40{sid}' ack, 2probe/
    3probe + noop release + '5' commit, then events flow over the
    upgraded websocket."""
    import base64

    from aiohttp import ClientSession, WSMsgType
    from aiohttp.test_utils import TestServer
    from asr_streaming_tpu.server.web_gateway import WebGateway

    async def run():
        worker, wtask = await _start_worker(PORT_BASE + 3)
        gw = WebGateway(vi_url=f"ws://127.0.0.1:{PORT_BASE + 3}/",
                        poll_timeout_s=5.0)
        test_server = TestServer(gw.app(), port=PORT_WEB + 2)
        await test_server.start_server()
        base = f"http://127.0.0.1:{PORT_WEB + 2}/socket.io/?EIO=4"
        results = []
        try:
            async with ClientSession() as session:
                async with session.get(base + "&transport=polling") as r:
                    body = await r.text()
                assert body.startswith("0{"), body
                sid = json.loads(body[1:])["sid"]
                assert "websocket" in json.loads(body[1:])["upgrades"]

                poll = base + "&transport=polling&sid=" + sid
                async with session.post(poll, data="40") as r:
                    assert await r.text() == "ok"
                async with session.get(poll) as r:
                    body = await r.text()
                assert body.split("\x1e")[0].startswith("40{"), body

                # a pending long-poll sits open while we upgrade
                pending = asyncio.create_task(session.get(poll))
                await asyncio.sleep(0.1)
                async with session.ws_connect(
                        base + "&transport=websocket&sid=" + sid) as ws:
                    await ws.send_str("2probe")
                    msg = await asyncio.wait_for(ws.receive(), timeout=10)
                    assert msg.data == "3probe"
                    r = await asyncio.wait_for(pending, timeout=10)
                    released = await r.text()    # noop (6) or queued pkts
                    assert "6" in released.split("\x1e"), released
                    await ws.send_str("5")       # upgrade commit

                    audio = pcm_bytes(2.5)
                    step = 8000
                    deadline = asyncio.get_event_loop().time() + 60
                    sent = 0
                    while asyncio.get_event_loop().time() < deadline:
                        if sent < len(audio):
                            await ws.send_str("42" + json.dumps(
                                ["audio_data", {"audio": base64.b64encode(
                                    audio[sent:sent + step]).decode()}]))
                            sent += step
                        try:
                            msg = await asyncio.wait_for(ws.receive(),
                                                         timeout=0.25)
                        except asyncio.TimeoutError:
                            continue
                        if msg.type != WSMsgType.TEXT:
                            break
                        if msg.data == "2":
                            await ws.send_str("3")
                        elif msg.data.startswith("42"):
                            name, data = json.loads(msg.data[2:])
                            results.append((name, data))
                            if data.get("isFinal"):
                                break
        finally:
            await test_server.close()
            wtask.cancel()
            worker.stop_ticks()
        return results

    results = asyncio.run(run())
    assert any(name == "asr_result" and data.get("isFinal")
               for name, data in results), results
