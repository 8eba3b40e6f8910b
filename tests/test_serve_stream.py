"""Streaming generation + chat worker protocol tests."""

import base64
import json
import os
from io import BytesIO

import jax
import numpy as np
import pytest

from vcoder_tpu.checkpoint import save_pretrained
from vcoder_tpu.config import VCoderConfig
from vcoder_tpu.constants import IMAGE_TOKEN_INDEX, SEG_TOKEN_INDEX
from vcoder_tpu.generation import generate, generate_stream
from vcoder_tpu.models import vcoder as model_mod
from vcoder_tpu.simple_tokenizer import SimpleTokenizer

PIL = pytest.importorskip("PIL.Image")


@pytest.fixture(scope="module")
def setup():
    cfg = VCoderConfig.tiny("vcoder_llava")
    params = model_mod.init_vcoder_params(jax.random.PRNGKey(0), cfg)
    hw = cfg.vision.image_size
    px = jax.numpy.asarray(
        np.random.RandomState(0).randn(1, hw, hw, 3), jax.numpy.float32
    )
    tok = SimpleTokenizer.build_from_texts(
        ["USER: ASSISTANT: what objects are in the image two people a car"]
    )
    return cfg, params, px, tok


def test_generate_stream_matches_fused(setup):
    cfg, params, px, tok = setup
    ids = [1, 5, IMAGE_TOKEN_INDEX, SEG_TOKEN_INDEX, 7, 8]
    fused = generate(
        params, cfg, [ids], px, px, max_new_tokens=6, temperature=0.0,
        attn_impl="xla", pad_to=512, tokenizer=tok,
    )
    chunks = list(
        generate_stream(
            params, cfg, [ids], px, px, tokenizer=tok,
            max_new_tokens=6, temperature=0.0, attn_impl="xla",
        )
    )
    # Stream yields accumulated text; final chunk equals the fused text.
    assert chunks, "no stream output"
    assert chunks[-1] == fused.texts[0]
    # Monotone accumulation.
    for a, b in zip(chunks, chunks[1:]):
        assert b.startswith(a[: len(a) // 2]) or len(b) >= len(a)


def test_chat_worker_protocol(setup, tmp_path):
    cfg, params, px, tok = setup
    ckpt = str(tmp_path / "vcoder_llava-tiny")
    save_pretrained(ckpt, params, cfg)
    tok.save_pretrained(ckpt)

    from vcoder_tpu.serve.chat import Chat

    chat = Chat(ckpt, tokenizer=tok)
    assert chat.is_seg and not chat.is_depth

    img = PIL.fromarray(
        np.random.RandomState(1).randint(0, 255, (32, 40, 3), np.uint8)
    )
    buf = BytesIO()
    img.save(buf, format="PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()

    prompt = "USER: <seg>\n<image>\nwhat objects ASSISTANT:"
    chunks = list(
        chat.generate_stream_gate(
            {
                "prompt": prompt,
                "images": [b64],
                "segs": [b64],
                "temperature": 0.0,
                "max_new_tokens": 4,
                "stop": "</s>",
            }
        )
    )
    assert chunks
    payloads = [json.loads(c.decode().rstrip("\0")) for c in chunks]
    assert all(p["error_code"] == 0 for p in payloads)
    assert payloads[-1]["text"].startswith(prompt)

    # Sentinel mismatch -> gated error payload, not an exception.
    bad = list(
        chat.generate_stream_gate(
            {"prompt": "no sentinel", "images": [b64], "temperature": 0.0}
        )
    )
    assert json.loads(bad[-1].decode().rstrip("\0"))["error_code"] == 1
    # Every chunk is NUL-delimited (uniform wire framing).
    assert all(c.endswith(b"\0") for c in chunks + bad)


def test_http_worker_server(setup, tmp_path):
    """The HTTP worker streams the same NUL-delimited JSON chunks as the
    in-process Chat protocol, plus a health endpoint."""
    import threading
    import urllib.request

    cfg, params, px, tok = setup
    ckpt = str(tmp_path / "vcoder_llava-tiny-http")
    save_pretrained(ckpt, params, cfg)
    tok.save_pretrained(ckpt)

    from vcoder_tpu.serve.chat import Chat
    from vcoder_tpu.serve.server import serve

    chat = Chat(ckpt, tokenizer=tok)
    httpd = serve(chat, host="127.0.0.1", port=0)  # ephemeral port
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/health", timeout=30
        ) as r:
            health = json.loads(r.read())
        assert health["status"] == "ok"

        img = PIL.fromarray(
            np.random.RandomState(1).randint(0, 255, (32, 40, 3), np.uint8)
        )
        buf = BytesIO()
        img.save(buf, format="PNG")
        b64 = base64.b64encode(buf.getvalue()).decode()
        prompt = "USER: <seg>\n<image>\nwhat objects ASSISTANT:"
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/worker_generate_stream",
            data=json.dumps(
                {
                    "prompt": prompt,
                    "images": [b64],
                    "segs": [b64],
                    "temperature": 0.0,
                    "max_new_tokens": 4,
                    "stop": "</s>",
                }
            ).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            raw = r.read()
        chunks = [c for c in raw.split(b"\0") if c.strip()]
        payloads = [json.loads(c.decode()) for c in chunks]
        assert payloads and all(p["error_code"] == 0 for p in payloads)
        assert payloads[-1]["text"].startswith(prompt)
    finally:
        httpd.shutdown()


def test_stream_stop_string_mid_chunk(setup):
    """Speculative streaming delivers several tokens per chunk, so the
    stop string routinely lands MID-chunk (accepted tokens after it).
    No yielded text may ever contain the stop string (reference
    semantics: `keyword in outputs`, mm_utils.py:128-151)."""
    cfg, params, px, tok = setup
    # Repetitive prompt so the prompt-lookup drafter fires and chunks
    # carry multiple accepted tokens.
    ids = [1, 5, IMAGE_TOKEN_INDEX, SEG_TOKEN_INDEX, 7, 8, 7, 8, 7, 8]
    base = generate(
        params, cfg, [ids], px, px, max_new_tokens=16, temperature=0.0,
        attn_impl="xla", tokenizer=tok,
    )
    n = int(base.num_generated[0])
    assert n >= 6, "tiny model must generate enough"
    # Stop at the text of a mid-stream generated token.
    target = int(base.sequences[0, 3])
    stop = tok.decode([target], skip_special_tokens=True).strip()
    assert stop, "need a decodable stop token"
    for lookahead in (0, 4):
        chunks = list(
            generate_stream(
                params, cfg, [ids], px, px, tokenizer=tok,
                max_new_tokens=16, temperature=0.0, attn_impl="xla",
                stop_str=stop, lookahead=lookahead,
            )
        )
        assert chunks, f"no stream output (lookahead={lookahead})"
        for c in chunks:
            assert stop not in c, (lookahead, stop, chunks)
