"""HTTP synthesis server.

Behavioral parity target: runtime/core/http/http_server.cc:38-152 —
GET with query params `text` and `name` (speaker) -> synthesize -> JSON
response {"status", "message", "audio": <base64 WAV>}; thread-per-request
(ThreadingHTTPServer mirrors the reference's thread-per-connection model).
A `/stream` endpoint additionally serves chunked raw PCM for streaming
clients (cpu_triton_stream semantics).
"""

from __future__ import annotations

import base64
import io
import json
import threading
import urllib.parse
import wave
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


# Minimal browser demo (replaces the reference's gradio app,
# runtime/web/app.py): text box -> GET / -> base64 WAV -> <audio> element.
DEMO_PAGE = """<!doctype html>
<html><head><meta charset="utf-8"><title>wetts_tpu demo</title>
<style>body{font-family:sans-serif;max-width:640px;margin:3em auto}
textarea{width:100%;height:5em}button{margin-top:.5em;padding:.5em 2em}
</style></head><body>
<h2>wetts_tpu &mdash; TTS demo</h2>
<textarea id="t" placeholder="Enter text..."></textarea><br>
<input id="s" placeholder="speaker (optional)">
<button onclick="go()">Synthesize</button>
<p id="status"></p><audio id="a" controls></audio>
<script>
async function go(){
  const st=document.getElementById('status');
  st.textContent='synthesizing...';
  const t=encodeURIComponent(document.getElementById('t').value);
  const s=encodeURIComponent(document.getElementById('s').value);
  const r=await fetch(`/?text=${t}&name=${s}`);
  const j=await r.json();
  if(j.status!=='ok'){st.textContent='error: '+j.message;return;}
  document.getElementById('a').src='data:audio/wav;base64,'+j.audio;
  document.getElementById('a').play();
  st.textContent='done';
}
</script></body></html>"""


def wav_bytes(audio: np.ndarray, sample_rate: int) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        pcm = (np.clip(audio, -1.0, 1.0) * 32767.0).astype(np.int16)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


class TtsServer:
    def __init__(self, engine, host: str = "0.0.0.0", port: int = 8080,
                 batching: bool = False, max_batch: int = 8,
                 max_delay_s: float = 0.005):
        self.engine = engine
        self.host = host
        self.port = port
        # serialization lives in the engine (engine.lock, reentrant): the
        # batcher dispatcher thread, /stream handlers, and plain handlers
        # all funnel through it, so concurrent paths can't race on the
        # engine's rng / jit caches / frontend
        self._lock = engine.lock if hasattr(engine, "lock") \
            else threading.RLock()
        self._httpd = None
        # cross-request dynamic batching (Triton dynamic_batching analog):
        # concurrent requests pad into one bucketed executable call
        self.batcher = None
        if batching:
            from wetts_tpu.serving.batcher import DynamicBatcher

            self.batcher = DynamicBatcher(engine, max_batch=max_batch,
                                          max_delay_s=max_delay_s)

    def _synthesize(self, text: str, name):
        if self.batcher is not None:
            # the batcher's dispatcher thread serializes engine calls
            return self.batcher.synthesize(text, name)
        with self._lock:
            return self.engine.synthesize(text, name)

    def make_handler(self):
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):
                pass

            def _send_json(self, code: int, payload: dict):
                body = json.dumps(payload).encode("utf8")
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                parsed = urllib.parse.urlparse(self.path)
                params = dict(urllib.parse.parse_qsl(parsed.query))
                text = params.get("text", "")
                name = params.get("name")
                if parsed.path == "/demo":
                    body = DEMO_PAGE.encode("utf8")
                    self.send_response(200)
                    self.send_header("Content-Type",
                                     "text/html; charset=utf-8")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                    return
                if not text:
                    self._send_json(400, {"status": "failed",
                                          "message": "missing `text` param"})
                    return
                if parsed.path == "/stream":
                    self._stream(text, name)
                    return
                try:
                    audio = server._synthesize(text, name)
                    wav = wav_bytes(audio, server.engine.sample_rate)
                    self._send_json(200, {
                        "status": "ok",
                        "message": "success",
                        "sample_rate": server.engine.sample_rate,
                        "audio": base64.b64encode(wav).decode("ascii"),
                    })
                except Exception as e:  # noqa: BLE001
                    self._send_json(500, {"status": "failed",
                                          "message": str(e)})

            def _stream(self, text: str, name):
                self.send_response(200)
                self.send_header("Content-Type", "application/octet-stream")
                self.send_header("Transfer-Encoding", "chunked")
                self.end_headers()
                try:
                    with server._lock:
                        for piece in server.engine.stream_synthesize(text,
                                                                     name):
                            pcm = (np.clip(piece, -1, 1)
                                   * 32767.0).astype(np.int16).tobytes()
                            self.wfile.write(
                                f"{len(pcm):x}\r\n".encode())
                            self.wfile.write(pcm + b"\r\n")
                    self.wfile.write(b"0\r\n\r\n")
                except BrokenPipeError:
                    pass

        return Handler

    def _bind(self):
        if self._httpd is None:
            self._httpd = ThreadingHTTPServer((self.host, self.port),
                                              self.make_handler())

    def serve_forever(self):
        self._bind()
        self._httpd.serve_forever()

    def start_background(self):
        # bind synchronously so the port is accepting before this returns
        # (a request racing the server thread would get ECONNREFUSED)
        self._bind()
        t = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        t.start()
        return t

    def shutdown(self):
        if self._httpd:
            self._httpd.shutdown()
        if self.batcher is not None:
            self.batcher.shutdown()
