"""Gradio demo wiring smoke tests WITHOUT gradio installed.

The web demo (serve/gradio_app.py; reference:
vcoder_llava/serve/gradio_app.py:91-192) cannot be executed in this
image (no gradio wheel), so these tests install a minimal stub module
into sys.modules and drive the pieces that rot silently: build_demo's
component/callback wiring, add_text's sentinel injection, and http_bot's
streaming protocol over a canned Chat.
"""

import json
import sys
import types

import pytest

from vcoder_tpu.constants import (
    DEFAULT_DEPTH_TOKEN,
    DEFAULT_IMAGE_TOKEN,
    DEFAULT_SEG_TOKEN,
)
from vcoder_tpu.conversation import conv_templates
from vcoder_tpu.utils import server_error_msg


class _Component:
    """Records constructor kwargs and wired callbacks. Every instance
    registers itself so tests can see components that stay local to
    build_demo."""

    created = []

    def __init__(self, *args, **kwargs):
        self.args = args
        self.kwargs = kwargs
        self.callbacks = []
        _Component.created.append(self)

    def _wire(self, fn, inputs=None, outputs=None):
        self.callbacks.append((fn, inputs, outputs))
        return self

    click = submit = change = then = _wire

    # Containers double as context managers (Blocks/Row/Column).
    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


def _make_gradio_stub():
    gr = types.ModuleType("gradio")
    for name in (
        "Blocks", "State", "Markdown", "Row", "Column", "Image", "Radio",
        "Slider", "Chatbot", "Textbox", "Button", "Examples",
    ):
        setattr(gr, name, type(name, (_Component,), {}))
    return gr


@pytest.fixture()
def gradio_stub(monkeypatch):
    stub = _make_gradio_stub()
    monkeypatch.setitem(sys.modules, "gradio", stub)
    _Component.created.clear()
    return stub


def test_build_demo_wires_submit_chain(gradio_stub):
    from vcoder_tpu.serve import gradio_app

    demo = gradio_app.build_demo()
    assert isinstance(demo, gradio_stub.Blocks)

    # The textbox submit chain must wire add_text then http_bot with the
    # argument lists the callbacks expect (8 inputs / 4 inputs).
    textboxes = [
        (fn, inputs)
        for comp in _Component.created
        for (fn, inputs, _) in comp.callbacks
    ]
    fns = [fn for fn, _ in textboxes]
    assert gradio_app.add_text in fns
    assert gradio_app.http_bot in fns
    add_inputs = dict(textboxes)[gradio_app.add_text]
    bot_inputs = dict(textboxes)[gradio_app.http_bot]
    # add_text(state, text, image, image_mode, seg, seg_mode, depth,
    # depth_mode); http_bot(state, temperature, top_p, max_new_tokens).
    assert len(add_inputs) == 8
    assert len(bot_inputs) == 4


def test_build_demo_collects_all_callbacks(gradio_stub):
    """Every interactive control gets a callback: submit chain + 3 vote
    buttons + clear."""
    from vcoder_tpu.serve import gradio_app

    gradio_app.build_demo()
    n_callbacks = sum(len(c.callbacks) for c in _Component.created)
    # textbox.submit -> add_text, .then -> http_bot, upvote/downvote/
    # flag/clear clicks.
    assert n_callbacks >= 6


def test_add_text_injects_sentinels(gradio_stub):
    from vcoder_tpu.serve import gradio_app

    from PIL import Image

    state = conv_templates["llava_v1"].copy()
    img, seg, depth = (
        Image.new("RGB", (8, 8), c) for c in ("red", "green", "blue")
    )
    out = gradio_app.add_text(
        state, "what is here?", img, "Pad", seg, "Pad", depth, "Pad"
    )
    state = out[0]
    assert not state.skip_next
    msg = state.messages[-2][1]  # (text, image, mode, seg, ...) 7-tuple
    assert isinstance(msg, tuple) and len(msg) == 7
    text = msg[0]
    # Reference order (gradio_app.py:103-112): depth, then seg, then
    # image prepended — each only when the payload is present.
    assert text.startswith(
        DEFAULT_DEPTH_TOKEN + "\n" + DEFAULT_SEG_TOKEN + "\n"
        + DEFAULT_IMAGE_TOKEN + "\n"
    )
    # Assistant placeholder appended for http_bot to fill.
    assert state.messages[-1][1] is None


def test_add_text_empty_input_skips(gradio_stub):
    from vcoder_tpu.serve import gradio_app

    state = conv_templates["llava_v1"].copy()
    out = gradio_app.add_text(
        state, "", None, "Pad", None, "Pad", None, "Pad"
    )
    assert out[0].skip_next
    assert out[0].messages == conv_templates["llava_v1"].copy().messages


class _CannedChat:
    """Yields the chat wire protocol: \\0-terminated JSON chunks whose
    text includes the prompt prefix (serve/chat.py contract)."""

    def __init__(self, pieces, error_at=None):
        self.pieces = pieces
        self.error_at = error_at
        self.last_payload = None

    def generate_stream_gate(self, payload):
        self.last_payload = payload
        acc = payload["prompt"]
        for i, piece in enumerate(self.pieces):
            if i == self.error_at:
                raise RuntimeError("backend fell over")
            acc += piece
            yield (
                json.dumps({"text": acc, "error_code": 0}).encode() + b"\0"
            )


def _seeded_state(question="hello"):
    state = conv_templates["llava_v1"].copy()
    state.append_message(state.roles[0], question)
    state.append_message(state.roles[1], None)
    state.skip_next = False
    return state


def test_http_bot_streams_and_strips_cursor(gradio_stub, monkeypatch):
    from vcoder_tpu.serve import gradio_app

    chat = _CannedChat([" a", " b", " c"])
    monkeypatch.setattr(gradio_app, "chat", chat)
    state = _seeded_state()

    frames = list(gradio_app.http_bot(state, 0.2, 0.7, 64))
    # initial cursor frame + one per chunk + final strip frame
    assert len(frames) == 5
    final_state = frames[-1][0]
    assert final_state.messages[-1][-1] == "a b c"
    assert "▌" not in final_state.messages[-1][-1]
    # Payload carries the sampling params through (reference
    # gradio_app.py:139-150).
    assert chat.last_payload["temperature"] == 0.2
    assert chat.last_payload["top_p"] == 0.7
    assert chat.last_payload["max_new_tokens"] == 64


def test_http_bot_error_shows_server_error(gradio_stub, monkeypatch):
    from vcoder_tpu.serve import gradio_app

    chat = _CannedChat([" a", " b"], error_at=1)
    monkeypatch.setattr(gradio_app, "chat", chat)
    state = _seeded_state()

    frames = list(gradio_app.http_bot(state, 0.0, 1.0, 32))
    assert frames[-1][0].messages[-1][-1] == server_error_msg


def test_http_bot_skip_next_passthrough(gradio_stub, monkeypatch):
    from vcoder_tpu.serve import gradio_app

    monkeypatch.setattr(gradio_app, "chat", _CannedChat([]))
    state = _seeded_state()
    state.skip_next = True
    frames = list(gradio_app.http_bot(state, 0.0, 1.0, 32))
    assert len(frames) == 1
