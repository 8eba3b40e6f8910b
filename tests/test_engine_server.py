"""Concurrent engine-backed HTTP worker (serve/engine_server.py).

The worker must speak the exact FastChat wire protocol the serialized
worker (serve/server.py) speaks, while multiplexing concurrent clients
onto one continuous-batching engine — and a client that stops early
(stop string / disconnect) must free its slot via engine.cancel."""

import base64
import json
import threading
import time
import urllib.request
from io import BytesIO

import jax
import numpy as np
import pytest

from vcoder_tpu.checkpoint import save_pretrained
from vcoder_tpu.config import VCoderConfig
from vcoder_tpu.models import vcoder as model_mod
from vcoder_tpu.simple_tokenizer import SimpleTokenizer

PIL = pytest.importorskip("PIL.Image")

ENGINE_KW = dict(
    max_batch=2, max_len=256, page_size=8, attn_impl="xla"
)


@pytest.fixture(scope="module")
def worker(tmp_path_factory):
    cfg = VCoderConfig.tiny("vcoder_llava")
    params = model_mod.init_vcoder_params(jax.random.PRNGKey(0), cfg)
    tok = SimpleTokenizer.build_from_texts(
        ["USER: ASSISTANT: what objects are in the image two people a car"]
    )
    ckpt = str(tmp_path_factory.mktemp("ckpt") / "vcoder_llava-tiny")
    save_pretrained(ckpt, params, cfg)
    tok.save_pretrained(ckpt)

    from vcoder_tpu.serve.engine_server import EngineWorker

    w = EngineWorker(ckpt, tokenizer=tok, **ENGINE_KW)
    yield w
    w.shutdown()


@pytest.fixture(scope="module")
def server(worker):
    from vcoder_tpu.serve.engine_server import serve

    httpd = serve(worker, host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    httpd.shutdown()


def _b64_image(seed=1):
    img = PIL.fromarray(
        np.random.RandomState(seed).randint(0, 255, (32, 40, 3), np.uint8)
    )
    buf = BytesIO()
    img.save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def _post(base, params, timeout=600):
    req = urllib.request.Request(
        f"{base}/worker_generate_stream",
        data=json.dumps(params).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        raw = r.read()
    chunks = [c for c in raw.split(b"\0") if c.strip()]
    return [json.loads(c.decode()) for c in chunks]


def _post_streaming(base, params, on_chunk, timeout=600):
    """POST and invoke on_chunk(payload) as each NUL-delimited chunk
    arrives (urlopen.read(1) keeps it unbuffered enough for tests)."""
    req = urllib.request.Request(
        f"{base}/worker_generate_stream",
        data=json.dumps(params).encode(),
        headers={"Content-Type": "application/json"},
    )
    payloads = []
    with urllib.request.urlopen(req, timeout=timeout) as r:
        buf = b""
        while True:
            b = r.read(1)
            if not b:
                break
            if b == b"\0":
                p = json.loads(buf.decode())
                payloads.append(p)
                on_chunk(p)
                buf = b""
            else:
                buf += b
    return payloads


def test_health_and_stats(server):
    with urllib.request.urlopen(f"{server}/health", timeout=30) as r:
        health = json.loads(r.read())
    assert health["status"] == "ok"
    with urllib.request.urlopen(f"{server}/stats", timeout=30) as r:
        stats = json.loads(r.read())
    assert "active_slots" in stats and "timers" in stats


def test_stream_matches_serialized_worker(server, worker):
    """Same request through the engine worker and through the serialized
    Chat path must yield the same final text (greedy)."""
    b64 = _b64_image()
    params = {
        "prompt": "USER: <seg>\n<image>\nwhat objects ASSISTANT:",
        "images": [b64],
        "segs": [b64],
        "temperature": 0.0,
        "max_new_tokens": 4,
        "stop": "</s>",
    }
    payloads = _post(server, params)
    assert payloads and all(p["error_code"] == 0 for p in payloads)
    assert payloads[-1]["text"].startswith(params["prompt"])

    serialized = [
        json.loads(c.decode().rstrip("\0"))
        for c in worker.chat.generate_stream_gate(dict(params))
    ]
    assert payloads[-1]["text"] == serialized[-1]["text"]


def test_concurrent_streams_interleave(server):
    """Two clients stream at once: the second's first token arrives
    BEFORE the first finishes — continuous batching, not serialization."""
    b64 = _b64_image()

    def mk(max_new):
        return {
            "prompt": "USER: <seg>\n<image>\nwhat objects ASSISTANT:",
            "images": [b64],
            "segs": [b64],
            "temperature": 0.0,
            "max_new_tokens": max_new,
        }

    events = []  # (stream_name, time)
    lock = threading.Lock()

    def record(name):
        def cb(_):
            with lock:
                events.append((name, time.monotonic()))
        return cb

    a_first = threading.Event()

    def run_a():
        _post_streaming(
            server, mk(24),
            lambda p: (record("a")(p), a_first.set()),
        )

    ta = threading.Thread(target=run_a)
    ta.start()
    assert a_first.wait(timeout=600)
    payloads_b = _post_streaming(server, mk(4), record("b"))
    ta.join(timeout=600)
    assert not ta.is_alive()
    assert payloads_b

    names = [n for n, _ in events]
    last_b = max(i for i, n in enumerate(names) if n == "b")
    # "a" keeps streaming after "b" finished -> they overlapped.
    assert "a" in names[last_b + 1 :], (
        f"streams did not interleave: {names}"
    )


def test_sentinel_mismatch_is_gated_error(server):
    payloads = _post(
        server,
        {"prompt": "no sentinel", "images": [_b64_image()],
         "temperature": 0.0},
    )
    assert payloads[-1]["error_code"] == 1


def test_budget_error_message(server):
    b64 = _b64_image()
    payloads = _post(
        server,
        {
            "prompt": "USER: <seg>\n<image>\n"
            + "word " * 3000
            + "ASSISTANT:",
            "images": [b64],
            "segs": [b64],
            "temperature": 0.0,
        },
    )
    assert payloads[-1]["error_code"] == 0
    assert "Exceeds max token length" in payloads[-1]["text"]


def test_stop_string_cancels_engine_request(server, worker):
    """A stop string hit mid-stream truncates the text AND frees the
    engine slot (cancel), so capacity returns immediately."""
    b64 = _b64_image()
    base_params = {
        "prompt": "USER: <seg>\n<image>\nwhat objects ASSISTANT:",
        "images": [b64],
        "segs": [b64],
        "temperature": 0.0,
        "max_new_tokens": 8,
    }
    full = _post(server, dict(base_params))
    # Use the text generated after ~2 tokens as the stop string: greedy
    # decoding reproduces it, so the stream must stop there.
    prefix = full[1]["text"][len(base_params["prompt"]):]
    assert prefix
    stopped = _post(server, dict(base_params, stop=prefix))
    assert stopped[-1]["error_code"] == 0
    assert stopped[-1]["text"] == base_params["prompt"]
    assert len(stopped) < len(full)
    # The cancel drained through the loop; no slots stay pinned.
    deadline = time.monotonic() + 60
    while time.monotonic() < deadline:
        if sum(worker.engine.active) == 0 and not worker.engine.queue:
            break
        time.sleep(0.2)
    assert sum(worker.engine.active) == 0


def test_admission_error_reaches_client(server):
    """A prompt that passes Chat's model-context budget but exceeds the
    ENGINE's max_len fails at admission; the client must receive an
    error payload, not an empty successful stream."""
    payloads = _post(
        server,
        {
            # ~300 tokens: < model ctx (512) but > engine max_len (256).
            "prompt": "USER: " + "word " * 300 + "ASSISTANT:",
            "temperature": 0.0,
            "max_new_tokens": 4,
        },
    )
    assert payloads, "admission failure produced an empty stream"
    assert payloads[-1]["error_code"] == 1


def test_cancel_before_admission(worker):
    """A cancel that lands before the loop thread admits the request
    (request_id still None) must still prevent any decoding."""
    from vcoder_tpu.serve.engine_server import TokenStream

    prep = worker.chat.prepare(
        {"prompt": "USER: hi ASSISTANT:", "temperature": 0.0,
         "max_new_tokens": 32}
    )
    assert prep.budget_error is None
    handle = TokenStream()
    # Hold the worker's lock so the loop thread cannot drain between the
    # submission and the cancel — the racy window, made deterministic.
    with worker._cond:
        worker._submissions.append((prep, handle))
        handle.cancelled = True
        worker._cond.notify()
    deadline = time.monotonic() + 60
    while time.monotonic() < deadline:
        with worker._cond:
            pending = bool(worker._submissions)
        if not pending and not worker.engine.has_work():
            break
        time.sleep(0.05)
    assert not worker.engine.has_work()
    assert handle.q.empty()  # nothing was ever decoded for it
    assert handle.request_id not in worker._streams


def test_step_failure_fails_streams_and_drains(server, worker):
    """A persistent engine.step() failure must (a) surface an error chunk
    to the client and (b) drain the engine queue/slots so the loop can
    idle instead of hot-spinning on the failing step."""
    real_step = worker.engine.step

    def boom():
        raise RuntimeError("injected step failure")

    worker.engine.step = boom
    try:
        payloads = _post(
            server,
            {"prompt": "USER: hi ASSISTANT:", "temperature": 0.0,
             "max_new_tokens": 8},
        )
        assert payloads and payloads[-1]["error_code"] == 1
        deadline = time.monotonic() + 60
        while time.monotonic() < deadline:
            if not worker.engine.has_work():
                break
            time.sleep(0.05)
        assert not worker.engine.has_work(), (
            "engine still has work after step failure: hot-spin"
        )
    finally:
        worker.engine.step = real_step
    # The worker still serves after recovery.
    ok = _post(
        server,
        {"prompt": "USER: hi ASSISTANT:", "temperature": 0.0,
         "max_new_tokens": 2},
    )
    assert ok and ok[-1]["error_code"] == 0


def test_engine_cancel_returns_pages():
    """Engine-level cancel: a running request's pages and a pending
    chunked prefill's pages both return to the pool."""
    import dataclasses

    from vcoder_tpu.serve.paged_engine import PagedServingEngine

    base = VCoderConfig.tiny("vcoder_llava")
    cfg = dataclasses.replace(
        base, text=dataclasses.replace(base.text, num_kv_heads=4)
    )
    params = model_mod.init_vcoder_params(jax.random.PRNGKey(0), cfg)
    prompt = [1] + [20 + (j % 50) for j in range(40)] + [5, 9]

    eng = PagedServingEngine(
        cfg, params, max_batch=2, max_len=256, page_size=8,
        attn_impl="xla",
    )
    free0 = len(eng.free_pages[0])
    rid = eng.add_request(prompt, max_new_tokens=32)
    eng.step()
    assert sum(eng.active) == 1
    assert eng.cancel(rid)
    eng.step()  # reclaim pass runs inside _admit
    assert sum(eng.active) == 0
    assert len(eng.free_pages[0]) == free0
    assert not eng.cancel(rid)  # already gone

    # Pending chunked prefill: cancel mid-region. A decode row must be
    # active first — an idle engine runs admission chunks to completion
    # inside one step (the idle fast path), leaving nothing pending.
    eng2 = PagedServingEngine(
        cfg, params, max_batch=2, max_len=256, page_size=8,
        attn_impl="xla", chunked_prefill=8,
    )
    bg = eng2.add_request(prompt[:10], max_new_tokens=64)
    while not any(eng2.active):
        eng2.step()
    free0 = len(eng2.free_pages[0])
    rid = eng2.add_request(prompt, max_new_tokens=8)
    eng2.step()
    assert eng2._pending is not None
    assert eng2.cancel(rid)
    assert eng2._pending is None
    assert len(eng2.free_pages[0]) == free0
    assert eng2.cancel(bg)
