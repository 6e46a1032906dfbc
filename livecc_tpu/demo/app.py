"""Web demo: real-time commentary + video QA in the browser.

Reference-equivalent of demo/app.py (Gradio two-mode chat UI with a JS
``video.currentTime`` poll loop, :148-176) built on the stdlib http.server
(gradio is not in this image). The browser plays the video locally and polls
``/tick?t=<currentTime>``; the server advances the live engine to that
timestamp and returns any new commentary bubbles. ``/qa`` posts a chat
question answered over the same KV cache.

Usage:
  python -m livecc_tpu.demo.app --video clip.mp4 [--model ckpt] [--port 7860]
"""

from __future__ import annotations

import argparse
import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

PAGE = """<!doctype html>
<html><head><title>LiveCC TPU demo</title><style>
body { font-family: sans-serif; margin: 2em; max-width: 900px; }
#log div { margin: 4px 0; padding: 6px 10px; border-radius: 8px; background: #eef; }
#log div.qa { background: #efe; }
video { width: 100%; border-radius: 8px; }
</style></head><body>
<h2>LiveCC — real-time commentary</h2>
<video id="v" src="/video" controls></video>
<div id="log"></div>
<form id="qaf"><input id="q" size="60" placeholder="Ask about the video..."/>
<button>Ask</button></form>
<script>
const v = document.getElementById('v'), log = document.getElementById('log');
setInterval(async () => {
  if (v.paused) return;
  const r = await fetch('/tick?t=' + v.currentTime);
  for (const [span, text] of await r.json()) {
    const d = document.createElement('div');
    d.textContent = `[${span[0].toFixed(1)}-${span[1].toFixed(1)}s] ${text}`;
    log.prepend(d);
  }
}, 500);
document.getElementById('qaf').onsubmit = async (e) => {
  e.preventDefault();
  const q = document.getElementById('q').value;
  const r = await fetch('/qa', {method: 'POST', body: q});
  const d = document.createElement('div'); d.className = 'qa';
  d.textContent = 'Q: ' + q + ' — A: ' + await r.text();
  log.prepend(d);
};
</script></body></html>"""


class DemoServer:
    def __init__(self, video_path: str, model_path: str | None, query: str,
                 speculative: bool = False, quantize_weights: bool | None = None):
        from livecc_tpu.demo.cli import build_engine
        from livecc_tpu.engine.live import LiveCC

        self.video_path = video_path
        self.query = query
        self.engine = build_engine(model_path, speculative=speculative,
                                   quantize_weights=quantize_weights)
        self.live = LiveCC(self.engine)
        self.session = self.live.open(video_path)
        self.lock = threading.Lock()

    def tick(self, t: float) -> list:
        with self.lock:
            return [[list(span), text] for span, text in
                    self.live.live_cc(self.session, t, query=self.query)]

    def qa(self, message: str) -> str:
        with self.lock:
            return self.live.video_qa(self.session, message)


def make_handler(server: DemoServer):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):
            pass

        def _send(self, body: bytes, ctype: str = "text/html"):
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            url = urllib.parse.urlparse(self.path)
            if url.path == "/":
                self._send(PAGE.encode())
            elif url.path == "/video":
                with open(server.video_path, "rb") as f:
                    self._send(f.read(), "video/mp4")
            elif url.path == "/tick":
                t = float(urllib.parse.parse_qs(url.query).get("t", ["0"])[0])
                self._send(json.dumps(server.tick(t)).encode(), "application/json")
            else:
                self.send_error(404)

        def do_POST(self):
            if self.path == "/qa":
                n = int(self.headers.get("Content-Length", 0))
                message = self.rfile.read(n).decode()
                self._send(server.qa(message).encode(), "text/plain")
            else:
                self.send_error(404)

    return Handler


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--video", required=True)
    parser.add_argument("--model", default=None)
    parser.add_argument("--query", default="Please describe the video.")
    parser.add_argument("--port", type=int, default=7860)
    parser.add_argument("--speculative", action="store_true",
                        help="fused on-device lookahead decoding")
    parser.add_argument("--quantize-weights", action=argparse.BooleanOptionalAction,
                        default=None,
                        help="weight-only int8 weights (ops/quant.py); "
                             "default on for TPU serving")
    args = parser.parse_args(argv)
    server = DemoServer(args.video, args.model, args.query,
                        speculative=args.speculative,
                        quantize_weights=args.quantize_weights)
    httpd = ThreadingHTTPServer(("0.0.0.0", args.port), make_handler(server))
    print(f"serving on http://localhost:{args.port}")
    httpd.serve_forever()


if __name__ == "__main__":
    main()
