"""HTTP model-worker server: the FastChat-style worker API over Chat.

The reference's ``serve/chat.py`` is adapted from the FastChat model
worker but is only ever driven in-process by the gradio app (reference:
vcoder_llava/serve/gradio_app.py:124-192 calls ``chat.generate_stream_gate``
directly). This module completes the serving stack with the HTTP layer
that protocol implies, so remote UIs / load balancers can talk to a
worker over the network:

* ``POST /worker_generate_stream`` — body: the Chat params dict
  (``prompt``, base64 ``images``/``segs``/``depths``, ``temperature``,
  ``top_p``, ``max_new_tokens``, ``stop``, ``lookahead``). Response:
  NUL-delimited JSON chunks ``{"text": ..., "error_code": 0}`` streamed
  as they decode — the exact wire format FastChat workers emit.
* ``GET /health`` — ``{"status": "ok", "model": <name>}``.

Stdlib-only (ThreadingHTTPServer); generation requests serialize through
a lock (one model on one chip — concurrent decode would interleave
cache state). Usage:

    python -m vcoder_tpu.serve.server --model-path <ckpt> --port 21002
"""

from __future__ import annotations

import argparse
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from vcoder_tpu.serve.chat import Chat
from vcoder_tpu.utils import build_logger

logger = build_logger("worker", "worker.log")


class WorkerHandler(BaseHTTPRequestHandler):
    chat: Chat = None  # set by serve()
    lock: threading.Lock = None

    protocol_version = "HTTP/1.1"

    def setup(self):
        super().setup()
        # The generation lock is held while streaming; a stalled client
        # must error out (releasing the lock) rather than block every
        # other request's generation forever.
        self.connection.settimeout(30.0)

    def log_message(self, fmt, *args):  # route to the rotating logger
        logger.info("%s - %s" % (self.address_string(), fmt % args))

    def _json(self, code: int, payload: dict) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path == "/health":
            self._json(
                200, {"status": "ok", "model": self.chat.model_name}
            )
        else:
            self._json(404, {"error": "not found"})

    def do_POST(self):
        if self.path != "/worker_generate_stream":
            self._json(404, {"error": "not found"})
            return
        try:
            length = int(self.headers.get("Content-Length", 0))
            params = json.loads(self.rfile.read(length) or b"{}")
        except Exception as e:
            self._json(400, {"error": f"bad request: {e}"})
            return
        self.send_response(200)
        self.send_header("Content-Type", "application/octet-stream")
        self.send_header("Transfer-Encoding", "chunked")
        self.end_headers()

        def send_chunk(data: bytes) -> None:
            self.wfile.write(f"{len(data):X}\r\n".encode())
            self.wfile.write(data + b"\r\n")
            self.wfile.flush()

        try:
            with self.lock:
                for chunk in self.chat.generate_stream_gate(params):
                    # generate_stream_gate yields JSON bytes; the NUL byte
                    # is the FastChat message delimiter.
                    send_chunk(
                        chunk if chunk.endswith(b"\0") else chunk + b"\0"
                    )
        finally:
            # Always terminate the chunked response — a mid-stream error
            # must not leave well-behaved clients waiting on an
            # unterminated body until their own timeout.
            try:
                send_chunk(b"")  # chunked-encoding terminator
            except OSError:
                self.close_connection = True


def serve(
    chat: Chat, host: str = "0.0.0.0", port: int = 21002
) -> ThreadingHTTPServer:
    """Build the server (caller runs serve_forever / shutdown)."""
    handler = type(
        "BoundWorkerHandler",
        (WorkerHandler,),
        {"chat": chat, "lock": threading.Lock()},
    )
    return ThreadingHTTPServer((host, port), handler)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-path", type=str, required=True)
    ap.add_argument("--model-base", type=str, default=None)
    ap.add_argument("--host", type=str, default="0.0.0.0")
    ap.add_argument("--port", type=int, default=21002)
    ap.add_argument("--load-8bit", action="store_true")
    ap.add_argument("--load-4bit", action="store_true")
    ap.add_argument("--device", type=str, default="tpu")
    args = ap.parse_args()

    chat = Chat(
        args.model_path,
        args.model_base,
        load_8bit=args.load_8bit,
        load_4bit=args.load_4bit,
        device=args.device,
    )
    httpd = serve(chat, args.host, args.port)
    logger.info(
        f"worker listening on {args.host}:{args.port}"
        f" model={chat.model_name}"
    )
    httpd.serve_forever()


if __name__ == "__main__":
    main()
