"""Golden tests for the multimodal tokenizer splice helpers.

Expected values are hand-derived from the reference algorithms
(reference: vcoder_llava/mm_utils.py:43-117), including the separator-slice
quirks that determine sentinel cluster ordering.
"""

import numpy as np

from vcoder_tpu.constants import (
    DEPTH_TOKEN_INDEX as DEP,
    IMAGE_TOKEN_INDEX as IMG,
    SEG_TOKEN_INDEX as SEG,
)
from vcoder_tpu.mm_tokens import (
    KeywordsStoppingCriteria,
    get_model_name_from_path,
    tokenizer_depth_seg_token,
    tokenizer_image_token,
    tokenizer_seg_token,
)


def ids_of(tok, text):
    """Token ids without the leading BOS."""
    return tok(text).input_ids[1:]


def test_image_token_basic(fake_tokenizer):
    tok = fake_tokenizer
    out = tokenizer_image_token("a cat <image> sits", tok)
    expected = [tok.bos_token_id] + ids_of(tok, "a cat") + [IMG] + ids_of(tok, "sits")
    assert out == expected


def test_image_token_leading_sentinel(fake_tokenizer):
    tok = fake_tokenizer
    out = tokenizer_image_token("<image> hello", tok)
    # First chunk is empty -> [BOS]; BOS emitted, then sentinel, then chunk.
    assert out == [tok.bos_token_id, IMG] + ids_of(tok, "hello")


def test_image_token_no_bos():
    from tests.conftest import FakeTokenizer

    tok = FakeTokenizer(add_bos=False)
    out = tokenizer_image_token("a <image> b", tok)
    assert out == ids_of_nobos(tok, "a") + [IMG] + ids_of_nobos(tok, "b")


def ids_of_nobos(tok, text):
    return tok(text).input_ids


def test_seg_token_cluster_order(fake_tokenizer):
    """With BOS, the cluster is [image, seg] — image sentinel FIRST,
    despite <seg> preceding <image> in the text (mm_utils.py:77-81)."""
    tok = fake_tokenizer
    prompt = "describe <seg>\n<image> objects"
    out = tokenizer_seg_token(prompt, tok)
    expected = (
        [tok.bos_token_id]
        + ids_of(tok, "describe")
        + [IMG, SEG]
        + ids_of(tok, "objects")
    )
    assert out == expected


def test_seg_token_no_bos_drops_image_sentinel():
    """offset=0 slices the separator to [seg] only (bug-compatible)."""
    from tests.conftest import FakeTokenizer

    tok = FakeTokenizer(add_bos=False)
    out = tokenizer_seg_token("a <seg>\n<image> b", tok)
    assert out == ids_of_nobos(tok, "a") + [SEG] + ids_of_nobos(tok, "b")


def test_depth_seg_token_cluster_order(fake_tokenizer):
    """Cluster is [image, depth, seg] regardless of offset
    (mm_utils.py:101-103)."""
    tok = fake_tokenizer
    prompt = "q <depth>\n<seg>\n<image> objects"
    out = tokenizer_depth_seg_token(prompt, tok)
    expected = (
        [tok.bos_token_id]
        + ids_of(tok, "q")
        + [IMG, DEP, SEG]
        + ids_of(tok, "objects")
    )
    assert out == expected


def test_depth_seg_dispatch_without_depth(fake_tokenizer):
    tok = fake_tokenizer
    p = "x <seg>\n<image> y"
    assert tokenizer_depth_seg_token(p, tok) == tokenizer_seg_token(p, tok)


def test_return_tensors_np(fake_tokenizer):
    out = tokenizer_image_token("a <image> b", fake_tokenizer, return_tensors="np")
    assert isinstance(out, np.ndarray) and out.dtype == np.int64


def test_get_model_name_from_path():
    assert get_model_name_from_path("/a/b/vcoder_llava-v1.5-7b/") == (
        "vcoder_llava-v1.5-7b"
    )
    assert get_model_name_from_path("/a/model-x/checkpoint-100") == (
        "model-x_checkpoint-100"
    )


def test_keywords_stopping_criteria(fake_tokenizer):
    tok = fake_tokenizer
    stop = KeywordsStoppingCriteria(["</s>"], tok, input_len=3)
    seq = tok("hello world").input_ids  # [1, h, w]
    assert not stop(seq)
    assert stop(seq + [tok("</s>").input_ids[-1]])
