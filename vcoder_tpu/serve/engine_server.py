"""Concurrent HTTP model worker over the continuous-batching engines.

`serve/server.py` speaks the FastChat worker wire protocol but
serializes requests through a lock (one `Chat.generate_stream` at a
time — the reference's own concurrency model, a single HF generate
loop per process, vcoder_llava/serve/gradio_app.py:357-359 bounds
gradio's queue to hide that). This worker multiplexes every connected
client onto ONE `PagedServingEngine`: a background thread drives
`engine.step()`, each step decodes all active streams at once, and
per-request token queues fan the events back out to their HTTP
responses. N concurrent chats cost one batched decode, not N serialized
generate loops.

Same wire format as server.py (and FastChat):

* ``POST /worker_generate_stream`` — Chat params dict in, NUL-delimited
  ``{"text": ..., "error_code": 0}`` JSON chunks streamed out.
* ``GET /health`` — worker status + model name.
* ``GET /stats`` — engine step-timer percentiles, queue depth, active
  slots, prefix-cache counters.

Request preprocessing (sentinel validation, pixel decode, budget clamp)
is `Chat.prepare` — identical semantics to the serialized worker. Stop
strings are enforced host-side per stream and CANCEL the engine request
so the slot frees immediately (the reference's KeywordsStoppingCriteria
equivalent, mm_utils.py:128-151). Client disconnects cancel the same
way — a dropped connection never strands a slot.

    python -m vcoder_tpu.serve.engine_server --model-path <ckpt> \
        --port 21002 --max-batch 8 --page-size 128 [--kv-quant]
        [--speculative 4] [--prefix-cache] [--chunked-prefill 512]
"""

from __future__ import annotations

import argparse
import json
import queue
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Optional, Tuple

from vcoder_tpu.serve.chat import Chat, PreparedRequest
from vcoder_tpu.utils import build_logger, server_error_msg

logger = build_logger("engine_worker", "engine_worker.log")


class TokenStream:
    """Per-request bridge from the engine loop thread to an HTTP handler
    thread: a queue of (token, done, error) events. ``cancelled`` is set
    by the handler (under the worker's condition lock) so a cancel that
    races admission — the loop thread has not assigned ``request_id``
    yet — still takes effect at admission time."""

    def __init__(self):
        self.request_id: Optional[int] = None
        self.cancelled = False
        self.q: "queue.Queue[Tuple[int, bool, Optional[str]]]" = queue.Queue()

    def __iter__(self):
        while True:
            tok, done, err = self.q.get()
            yield tok, done, err
            if done:
                return


class EngineWorker:
    """Owns the model, the engine, and the engine-loop thread. All
    engine access happens on the loop thread; handlers talk to it
    through thread-safe submit/cancel queues."""

    def __init__(
        self,
        model_path: str,
        model_base=None,
        model_name=None,
        load_8bit: bool = False,
        load_4bit: bool = False,
        device: str = "tpu",
        tokenizer=None,
        engine: str = "paged",
        **engine_kw,
    ):
        self.chat = Chat(
            model_path,
            model_base,
            model_name=model_name,
            load_8bit=load_8bit,
            load_4bit=load_4bit,
            device=device,
            tokenizer=tokenizer,
        )
        model = self.chat.model
        if engine == "paged":
            from vcoder_tpu.serve.paged_engine import PagedServingEngine

            self.engine = PagedServingEngine(
                model.config, model.params, **engine_kw
            )
        elif engine == "slot":
            from vcoder_tpu.serve.engine import ServingEngine

            engine_kw.pop("page_size", None)
            self.engine = ServingEngine(
                model.config, model.params, **engine_kw
            )
        else:
            raise ValueError(f"unknown engine {engine!r}")
        self.model_name = self.chat.model_name
        self.eos_id = model.config.text.eos_token_id
        if hasattr(self.engine, "warmup_chunks"):
            # Compile every group-chunk shape before serving traffic —
            # a cold concurrent burst otherwise stalls tens of seconds
            # behind per-bucket XLA compiles (persistent-cached runs pay
            # this once per machine).
            self.engine.warmup_chunks()
        self._start_loop()

    @classmethod
    def from_engine(cls, engine, *, model_name: str, eos_id: int):
        """Wrap an already-built engine (in-memory weights) in the worker
        loop — the same submit/cancel/stream wire path as the HTTP server,
        minus the Chat checkpoint load. Used by scripts/bench_serving.py
        to hardware-bench the engine-worker path on synthetic weights;
        the HTTP handler surface needs `chat` and is not available on
        such a worker."""
        self = cls.__new__(cls)
        self.chat = None
        self.engine = engine
        self.model_name = model_name
        self.eos_id = eos_id
        self._start_loop()
        return self

    def _start_loop(self) -> None:
        self._cond = threading.Condition()
        self._submissions: List[Tuple[PreparedRequest, TokenStream]] = []
        self._cancels: List[int] = []
        self._streams: Dict[int, TokenStream] = {}
        self._stopping = False
        self._thread = threading.Thread(
            target=self._loop, name="engine-loop", daemon=True
        )
        self._thread.start()

    # ---- handler-side API (any thread) ----

    def submit(self, prep: PreparedRequest) -> TokenStream:
        handle = TokenStream()
        with self._cond:
            self._submissions.append((prep, handle))
            self._cond.notify()
        return handle

    def cancel(self, handle: TokenStream) -> None:
        with self._cond:
            handle.cancelled = True
            if handle.request_id is not None:
                self._cancels.append(handle.request_id)
            # else: the loop thread sees `cancelled` when it admits.
            self._cond.notify()

    def stats(self) -> dict:
        eng = self.engine
        out = {
            "model": self.model_name,
            "active_slots": int(sum(eng.active)),
            "queued": len(eng.queue),
            "timers": eng.timer.summary(),
        }
        if hasattr(eng, "prefix_stats"):
            out["prefix_cache"] = eng.prefix_stats()
        if hasattr(eng, "preemptions"):
            out["preemptions"] = eng.preemptions
        if eng.lora_ids:
            out["lora_adapters"] = sorted(eng.lora_ids)
        return out

    def shutdown(self) -> None:
        with self._cond:
            self._stopping = True
            self._cond.notify()
        self._thread.join(timeout=30)

    # ---- engine loop (single thread owns the engine) ----

    def _drain_inbox(self) -> None:
        with self._cond:
            subs, self._submissions = self._submissions, []
            cancels, self._cancels = self._cancels, []
        for prep, handle in subs:
            with self._cond:
                if handle.cancelled:
                    continue
            rid = self.engine.add_request(
                prep.input_ids,
                images=prep.images,
                segs=prep.segs,
                depths=prep.depths,
                max_new_tokens=prep.max_new_tokens,
                temperature=prep.temperature,
                top_p=prep.top_p,
                lora=prep.lora,
            )
            with self._cond:
                handle.request_id = rid
                if handle.cancelled:
                    # Client dropped before admission: never decode it.
                    self.engine.cancel(rid)
                    continue
            self._streams[rid] = handle
        for rid in cancels:
            self.engine.cancel(rid)
            # The handler has already stopped reading; just forget it.
            self._streams.pop(rid, None)

    def _loop(self) -> None:
        while True:
            with self._cond:
                while (
                    not self._stopping
                    and not self._submissions
                    and not self._cancels
                    and not self.engine.has_work()
                ):
                    self._cond.wait()
                if self._stopping:
                    # Fail any in-flight streams before exiting — their
                    # handler threads block forever on q.get() otherwise.
                    for handle in self._streams.values():
                        handle.q.put(
                            (self.eos_id, True, "server shutting down")
                        )
                    self._streams.clear()
                    return
            self._drain_inbox()
            if not self.engine.has_work():
                continue
            try:
                events = self.engine.step()
            except Exception:
                logger.exception("engine step failed")
                # Fail every in-flight stream rather than hanging
                # clients, AND drain the engine's queue/slots — leaving
                # the doomed requests in place keeps has_work() true and
                # turns this loop into a hot spin on the failing step.
                for handle in self._streams.values():
                    handle.q.put((self.eos_id, True, "engine step failed"))
                self._streams.clear()
                try:
                    for req in list(self.engine.queue):
                        self.engine.cancel(req.request_id)
                    for req in list(self.engine.slots):
                        if req is not None:
                            self.engine.cancel(req.request_id)
                    # A paged engine's mid-chunked-prefill admission also
                    # keeps has_work() true — cancel it too or the loop
                    # hot-spins re-running the failing chunk.
                    pending = getattr(self.engine, "_pending", None)
                    if pending is not None:
                        self.engine.cancel(pending.req.request_id)
                except Exception:
                    logger.exception("engine drain after failure")
                continue
            for rid, tok, done in events:
                handle = self._streams.get(rid)
                if handle is None:
                    continue
                err = self.engine.pop_error(rid) if done else None
                handle.q.put((tok, done, err))
                if done:
                    del self._streams[rid]


class EngineWorkerHandler(BaseHTTPRequestHandler):
    worker: EngineWorker = None  # bound by serve()

    protocol_version = "HTTP/1.1"

    def setup(self):
        super().setup()
        # A stalled client must error its own stream (cancelling its
        # engine request) rather than pin a handler thread forever. No
        # global lock here — other streams are unaffected either way.
        self.connection.settimeout(300.0)

    def log_message(self, fmt, *args):
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
                200, {"status": "ok", "model": self.worker.model_name}
            )
        elif self.path == "/stats":
            self._json(200, self.worker.stats())
        else:
            self._json(404, {"error": "not found"})

    def _stream_chunks(self, params: dict):
        """Yield the response's JSON chunk payloads (bytes, no NUL);
        mirrors Chat.generate_stream_gate's error swallowing."""
        worker = self.worker
        try:
            prep = worker.chat.prepare(params)
        except Exception as e:
            logger.warning("prepare failed: %s", e)
            yield json.dumps(
                {"text": server_error_msg, "error_code": 1}
            ).encode()
            return
        if prep.budget_error is not None:
            yield json.dumps(
                {
                    "text": prep.ori_prompt + prep.budget_error,
                    "error_code": 0,
                }
            ).encode()
            return
        if prep.lora is not None and prep.lora not in worker.engine.lora_ids:
            # Validate here so the client fails before admission; any
            # engine-side admission failure also reaches the client via
            # the done-event's error field below.
            logger.warning("unknown LoRA adapter: %s", prep.lora)
            yield json.dumps(
                {"text": server_error_msg, "error_code": 1}
            ).encode()
            return

        tokenizer = worker.chat.tokenizer
        handle = worker.submit(prep)
        generated: List[int] = []
        try:
            for tok, done, err in handle:
                if err is not None:
                    # Admission/step failure (oversized prompt, pool too
                    # small, device error): an error payload, never a
                    # silently-empty completion.
                    logger.warning("request failed: %s", err)
                    yield json.dumps(
                        {"text": server_error_msg, "error_code": 1}
                    ).encode()
                    return
                if tok == worker.eos_id:
                    # EOS never surfaces as text (generation.generate_stream
                    # breaks before yielding it).
                    return
                generated.append(tok)
                text = tokenizer.decode(
                    generated, skip_special_tokens=True
                )
                if prep.stop_str and text.endswith(prep.stop_str):
                    text = text[: -len(prep.stop_str)]
                    done = True
                    worker.cancel(handle)
                yield json.dumps(
                    {
                        "text": prep.ori_prompt + text,
                        "error_code": 0,
                    }
                ).encode()
                if done:
                    return
        except GeneratorExit:
            # Client went away mid-stream (possibly before admission
            # assigned a request id): free the slot either way.
            worker.cancel(handle)
            raise

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

        gen = self._stream_chunks(params)
        try:
            for chunk in gen:
                send_chunk(chunk + b"\0")
        except OSError:
            gen.close()  # raises GeneratorExit inside -> cancels
        finally:
            try:
                send_chunk(b"")  # chunked-encoding terminator
            except OSError:
                self.close_connection = True


def serve(
    worker: EngineWorker, host: str = "0.0.0.0", port: int = 21002
) -> ThreadingHTTPServer:
    """Build the server (caller runs serve_forever / shutdown)."""
    handler = type(
        "BoundEngineWorkerHandler",
        (EngineWorkerHandler,),
        {"worker": worker},
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
    ap.add_argument("--engine", choices=["paged", "slot"], default="paged")
    ap.add_argument("--max-batch", type=int, default=8)
    ap.add_argument("--max-len", type=int, default=4096)
    ap.add_argument("--page-size", type=int, default=128)
    ap.add_argument("--kv-quant", action="store_true")
    ap.add_argument("--speculative", type=int, default=0)
    ap.add_argument("--sync-every", type=int, default=1)
    ap.add_argument("--prefix-cache", action="store_true")
    ap.add_argument("--chunked-prefill", type=int, default=0)
    ap.add_argument(
        "--lora", action="append", default=[], metavar="NAME=PATH",
        help="serve a PEFT adapter dir under NAME (repeatable);"
        " requests pick one via the 'lora' param",
    )
    args = ap.parse_args()

    lora_adapters = None
    if args.lora:
        from vcoder_tpu.lora import load_lora_adapter_dir

        lora_adapters = {}
        for spec in args.lora:
            name, _, path = spec.partition("=")
            if not path:
                ap.error(f"--lora expects NAME=PATH, got {spec!r}")
            lora_adapters[name] = load_lora_adapter_dir(path)

    engine_kw = dict(
        max_batch=args.max_batch,
        max_len=args.max_len,
        kv_quant=args.kv_quant,
        speculative=args.speculative,
        sync_every=args.sync_every,
        lora_adapters=lora_adapters,
    )
    if args.engine == "paged":
        engine_kw.update(
            page_size=args.page_size,
            prefix_cache=args.prefix_cache,
            chunked_prefill=args.chunked_prefill,
        )
    worker = EngineWorker(
        args.model_path,
        args.model_base,
        load_8bit=args.load_8bit,
        load_4bit=args.load_4bit,
        device=args.device,
        engine=args.engine,
        **engine_kw,
    )
    httpd = serve(worker, args.host, args.port)
    logger.info(
        f"engine worker listening on {args.host}:{args.port}"
        f" model={worker.model_name} engine={args.engine}"
    )
    httpd.serve_forever()


if __name__ == "__main__":
    main()
