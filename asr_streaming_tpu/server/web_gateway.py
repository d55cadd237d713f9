"""Browser demo gateway: Socket.IO-style HTTP bridge to the ASR workers.

Re-design of the reference's Flask+SocketIO demo app (reference:
asr_web_app/app.py:22-213), which bridges browser audio to BOTH language
servers and relays results per session.  Flask isn't in this image, so the
gateway is aiohttp: a WebSocket endpoint (/ws) accepting base64 or binary
audio, fanned out to the configured vi/en worker websockets, with results
multiplexed back tagged by language — plus the static demo page.
"""

from __future__ import annotations

import asyncio
import base64
import json
import logging
from typing import Dict, Optional

from aiohttp import web, WSMsgType
import websockets

logger = logging.getLogger("asr_streaming_tpu.web_gateway")

INDEX_HTML = """<!doctype html>
<html><head><meta charset="utf-8"><title>ASR demo</title></head>
<body>
<h3>Streaming ASR demo</h3>
<button id="rec">Record</button>
<div><b>vi:</b> <span id="vi"></span></div>
<div><b>en:</b> <span id="en"></span></div>
<script>
let ws, ctx, proc, recording = false;
document.getElementById('rec').onclick = async () => {
  if (recording) { ws.send('Done'); recording = false; return; }
  ws = new WebSocket(`ws://${location.host}/ws`);
  ws.onmessage = (e) => {
    const m = JSON.parse(e.data);
    if (m.language && m.result)
      document.getElementById(m.language).textContent =
        m.result.hypotheses[0].transcript;
  };
  ctx = new AudioContext({sampleRate: 16000});
  const src = ctx.createMediaStreamSource(
    await navigator.mediaDevices.getUserMedia({audio: true}));
  proc = ctx.createScriptProcessor(4096, 1, 1);
  proc.onaudioprocess = (e) => {
    const f = e.inputBuffer.getChannelData(0);
    const i16 = new Int16Array(f.length);
    for (let i = 0; i < f.length; i++) i16[i] = f[i] * 32767;
    if (ws.readyState === 1) ws.send(i16.buffer);
  };
  src.connect(proc); proc.connect(ctx.destination);
  recording = true;
};
</script></body></html>"""


class WebGateway:
    def __init__(self, vi_url: Optional[str] = None,
                 en_url: Optional[str] = None):
        self.urls = {}
        if vi_url:
            self.urls["vi"] = vi_url
        if en_url:
            self.urls["en"] = en_url

    async def index(self, request: web.Request) -> web.Response:
        return web.Response(text=INDEX_HTML, content_type="text/html")

    async def ws_handler(self, request: web.Request) -> web.WebSocketResponse:
        ws = web.WebSocketResponse()
        await ws.prepare(request)

        backends: Dict[str, websockets.ClientConnection] = {}
        relays = []
        for lang, url in self.urls.items():
            try:
                conn = await websockets.connect(url)
                backends[lang] = conn
                relays.append(asyncio.create_task(
                    self._relay(lang, conn, ws)))
            except OSError as e:
                logger.warning("backend %s (%s) unavailable: %s",
                               lang, url, e)

        try:
            async for msg in ws:
                if msg.type == WSMsgType.BINARY:
                    payload = msg.data
                elif msg.type == WSMsgType.TEXT:
                    text = msg.data
                    if text.startswith("{"):
                        blob = json.loads(text)
                        if "audio" in blob:   # base64 audio (reference app)
                            payload = base64.b64decode(blob["audio"])
                        else:
                            for conn in backends.values():
                                await conn.send(text)
                            continue
                    else:
                        for conn in backends.values():
                            await conn.send(text)
                        continue
                else:
                    break
                for conn in backends.values():
                    await conn.send(payload)
        finally:
            for task in relays:
                task.cancel()
            for conn in backends.values():
                await conn.close()
        return ws

    @staticmethod
    async def _relay(lang: str, conn, ws: web.WebSocketResponse):
        try:
            async for msg in conn:
                if isinstance(msg, bytes):
                    continue
                if msg == "__REQUEST_COMPLETED__":
                    await ws.send_json({"language": lang, "completed": True})
                    continue
                blob = json.loads(msg)
                blob["language"] = lang
                await ws.send_json(blob)
        except (websockets.exceptions.ConnectionClosed,
                ConnectionResetError, asyncio.CancelledError):
            pass

    def app(self) -> web.Application:
        app = web.Application()
        app.router.add_get("/", self.index)
        app.router.add_get("/ws", self.ws_handler)
        return app


def main():
    import argparse
    parser = argparse.ArgumentParser()
    parser.add_argument("--port", type=int, default=8080)
    parser.add_argument("--vi-url", default=None)
    parser.add_argument("--en-url", default=None)
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)
    gw = WebGateway(args.vi_url, args.en_url)
    web.run_app(gw.app(), port=args.port)


if __name__ == "__main__":
    main()
