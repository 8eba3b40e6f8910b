"""Conversation prompt-render tests (reference: vcoder_conversation.py)."""

import numpy as np
import pytest

from vcoder_tpu.conversation import (
    SeparatorStyle,
    conv_templates,
    default_conversation,
)

SYSTEM_V1 = (
    "A chat between a curious user and an artificial intelligence "
    "assistant. The assistant gives helpful, detailed, and polite answers "
    "to the user's questions."
)


def test_vicuna_v1_two_style_render():
    conv = conv_templates["vicuna_v1"].copy()
    conv.append_message(conv.roles[0], "<image>\nWhat is in the image?")
    conv.append_message(conv.roles[1], None)
    prompt = conv.get_prompt()
    assert prompt == (
        SYSTEM_V1 + " USER: <image>\nWhat is in the image? ASSISTANT:"
    )


def test_two_style_full_round_uses_sep2():
    conv = conv_templates["vicuna_v1"].copy()
    conv.append_message(conv.roles[0], "hello")
    conv.append_message(conv.roles[1], "hi there")
    prompt = conv.get_prompt()
    assert prompt.endswith("ASSISTANT: hi there</s>")


def test_tuple_message_text_extraction():
    conv = conv_templates["llava_v1"].copy()
    img = np.zeros((8, 8, 3), np.uint8)
    conv.append_message(
        conv.roles[0],
        ("<image>\ndescribe", img, "Pad", None, None, None, None),
    )
    conv.append_message(conv.roles[1], None)
    assert "<image>\ndescribe" in conv.get_prompt()


def test_get_images_segs_depths_slots():
    pytest.importorskip("PIL")
    conv = default_conversation.copy()
    img = np.full((50, 30, 3), 10, np.uint8)
    seg = np.full((50, 30, 3), 20, np.uint8)
    conv.append_message(
        conv.roles[0],
        ("<seg>\n<image>\nq", img, "Pad", seg, "Pad", None, None),
    )
    conv.append_message(conv.roles[1], None)
    imgs = conv.get_images(return_pil=True)
    segs = conv.get_segs(return_pil=True)
    depths = conv.get_depths(return_pil=True)
    assert len(imgs) == 1 and len(segs) == 1 and len(depths) == 0
    # Pad mode -> square
    assert imgs[0].size[0] == imgs[0].size[1]
    # b64 path returns strings
    assert isinstance(conv.get_images()[0], str)


def test_copy_independent():
    conv = default_conversation.copy()
    conv.append_message(conv.roles[0], "x")
    assert len(default_conversation.messages) == 0


def test_plain_style():
    conv = conv_templates["plain"].copy()
    conv.append_message("", "<image>\n")
    conv.append_message("", "a red bus")
    assert conv.get_prompt() == "<image>\n\na red bus\n"
