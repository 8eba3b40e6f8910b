"""Prompt-lookup speculative decoding: exactness vs sequential greedy.

Speculative decoding must be a pure latency optimization — the emitted
tokens are required to be bit-identical to one-token-at-a-time greedy
decoding (the reference's eval setting, scripts/v1_5/eval/cost.sh
``--temperature 0``). These tests compare against the public
``generate`` API on tiny random models for all prompt shapes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vcoder_tpu.config import VCoderConfig
from vcoder_tpu.constants import (
    DEPTH_TOKEN_INDEX as DEP,
    IMAGE_TOKEN_INDEX as IMG,
    SEG_TOKEN_INDEX as SEG,
)
from vcoder_tpu.generation import generate
from vcoder_tpu.models import vcoder as model_mod
from vcoder_tpu.speculative import (
    build_history,
    generate_speculative,
    ngram_draft,
)


def _tiny(model_type, seed=0):
    cfg = VCoderConfig.tiny(model_type)
    params = model_mod.init_vcoder_params(jax.random.PRNGKey(seed), cfg)
    return cfg, params


def _pixels(cfg, batch, seed):
    rng = np.random.default_rng(seed)
    s = cfg.vision.image_size
    return jnp.asarray(
        rng.standard_normal((batch, s, s, 3)).astype(np.float32)
    )


# ---------------------------------------------------------------------------
# Draft lookup
# ---------------------------------------------------------------------------


def test_ngram_draft_two_gram_match():
    # trailing 2-gram (7, 8) occurred at index 1 -> continuation 9, 5.
    hist = jnp.asarray([[3, 7, 8, 9, 5, 7, 8, 0, 0, 0]], jnp.int32)
    draft = ngram_draft(hist, jnp.asarray([7]), num_draft=2)
    np.testing.assert_array_equal(np.asarray(draft), [[9, 5]])


def test_ngram_draft_prefers_three_gram():
    # Trailing 3-gram (5, 7, 8) matches at 0 (-> 6); the later 2-gram
    # (7, 8) at 4 (-> 1) must lose to the more specific match.
    hist = jnp.asarray([[5, 7, 8, 6, 7, 8, 1, 5, 7, 8, 0, 0]], jnp.int32)
    draft = ngram_draft(hist, jnp.asarray([10]), num_draft=1)
    np.testing.assert_array_equal(np.asarray(draft), [[6]])


def test_ngram_draft_most_recent_match_wins():
    # 2-gram (4, 5) occurs at 0 (-> 9) and at 3 (-> 2): latest wins.
    hist = jnp.asarray([[4, 5, 9, 4, 5, 2, 8, 4, 5, 0]], jnp.int32)
    draft = ngram_draft(hist, jnp.asarray([9]), num_draft=1)
    np.testing.assert_array_equal(np.asarray(draft), [[2]])


def test_ngram_draft_no_match_is_zero():
    hist = jnp.asarray([[1, 2, 3, 4, 5, 6, 0, 0]], jnp.int32)
    draft = ngram_draft(hist, jnp.asarray([6]), num_draft=3)
    np.testing.assert_array_equal(np.asarray(draft), [[0, 0, 0]])


def test_ngram_draft_sentinels_never_match():
    # Sentinel ids (< 0) in the prompt must not produce matches against
    # generated tokens (>= 0).
    hist = jnp.asarray([[1, -200, -300, 4, -200, -300, 0, 0]], jnp.int32)
    draft = ngram_draft(hist, jnp.asarray([6]), num_draft=2)
    np.testing.assert_array_equal(np.asarray(draft), [[4, -200]])


def test_ngram_draft_full_buffer_matches_host_twin():
    """With hist_len == H (exactly-full buffer) the continuation runs
    off the end: the device draft must zero those positions like the
    host twin, not repeat history[H-1] through index clipping."""
    from vcoder_tpu.speculative import ngram_draft_np

    hist = np.asarray([[1, 2, 3, 4, 4, 4]], np.int32)
    lens = np.asarray([6])
    dev = np.asarray(ngram_draft(jnp.asarray(hist), jnp.asarray(lens), 3))
    host = ngram_draft_np(hist, lens, 3)
    np.testing.assert_array_equal(dev, host)
    np.testing.assert_array_equal(dev, [[4, 0, 0]])


def test_build_history_pads_and_lens():
    hist, lens = build_history([[1, 2, 3], [4, 5]], 4, 3)
    assert hist.shape == (2, 3 + 4 + 3)
    np.testing.assert_array_equal(lens, [3, 2])
    np.testing.assert_array_equal(hist[1, :3], [4, 5, -1])


# ---------------------------------------------------------------------------
# Exactness vs sequential greedy
# ---------------------------------------------------------------------------


def _assert_matches_greedy(
    cfg, params, input_ids, images=None, segs=None, depths=None, **kw
):
    max_new = kw.pop("max_new_tokens", 24)
    ref = generate(
        params, cfg, input_ids, images, segs, depths,
        max_new_tokens=max_new, temperature=0.0, attn_impl="xla",
        is_depth_zero=kw.pop("is_depth_zero", None),
    )
    seqs, num_gen, iters = generate_speculative(
        params, cfg, input_ids, images, segs, depths,
        max_new_tokens=max_new, attn_impl="xla", **kw,
    )
    np.testing.assert_array_equal(num_gen, ref.num_generated)
    for b in range(len(input_ids)):
        n = int(ref.num_generated[b])
        np.testing.assert_array_equal(
            seqs[b, :n], ref.sequences[b, :n],
            err_msg=f"row {b} diverged from sequential greedy",
        )
    assert iters >= 1
    return num_gen, iters


def test_spec_text_only_matches_greedy():
    cfg, params = _tiny("llava")
    _assert_matches_greedy(
        cfg, params, [[cfg.text.bos_token_id, 5, 9, 12, 5, 9]]
    )


def test_spec_multimodal_ds_matches_greedy():
    cfg, params = _tiny("vcoder_ds_llava")
    ids = [[cfg.text.bos_token_id, 7, IMG, DEP, SEG, 9, 14, 3]]
    _assert_matches_greedy(
        cfg, params, ids,
        images=_pixels(cfg, 1, 1),
        segs=_pixels(cfg, 1, 2),
        depths=_pixels(cfg, 1, 3),
        is_depth_zero=[False],
    )


def test_spec_batched_ragged_matches_greedy():
    cfg, params = _tiny("vcoder_llava", seed=3)
    ids = [
        [cfg.text.bos_token_id, 7, IMG, SEG, 9, 14, 3, 8, 8, 3],
        [cfg.text.bos_token_id, 4, IMG, SEG, 11],
    ]
    _assert_matches_greedy(
        cfg, params, ids,
        images=_pixels(cfg, 2, 4),
        segs=_pixels(cfg, 2, 5),
    )


@pytest.mark.parametrize("lookahead", [2, 4, 8])
def test_spec_lookahead_sizes(lookahead):
    cfg, params = _tiny("llava", seed=7)
    _assert_matches_greedy(
        cfg, params, [[cfg.text.bos_token_id, 6, 6, 6, 6, 6]],
        lookahead=lookahead,
    )


def test_spec_budget_cap():
    cfg, params = _tiny("llava", seed=2)
    seqs, num_gen, _ = generate_speculative(
        params, cfg, [[cfg.text.bos_token_id, 5, 9]],
        max_new_tokens=5, attn_impl="xla",
    )
    assert seqs.shape[1] == 5
    assert num_gen[0] <= 5


def test_spec_streaming_callback_matches_result():
    cfg, params = _tiny("llava", seed=5)
    got = []
    seqs, num_gen, _ = generate_speculative(
        params, cfg, [[cfg.text.bos_token_id, 5, 9, 4]],
        max_new_tokens=16, attn_impl="xla",
        on_tokens=lambda b, toks: got.extend(toks),
    )
    n = int(num_gen[0])
    np.testing.assert_array_equal(np.asarray(got[:n]), seqs[0, :n])
    assert len(got) >= n


def test_spec_streaming_abort():
    cfg, params = _tiny("llava", seed=5)
    got = []

    def cb(b, toks):
        got.extend(toks)
        return len(got) < 3  # stop after 3 streamed tokens

    seqs, num_gen, iters = generate_speculative(
        params, cfg, [[cfg.text.bos_token_id, 5, 9, 4]],
        max_new_tokens=32, attn_impl="xla", on_tokens=cb,
    )
    assert 3 <= len(got) <= 4  # aborts within the current poll window


def test_generate_stream_speculative_matches_plain():
    from tests.conftest import FakeTokenizer
    from vcoder_tpu.generation import generate_stream

    cfg, params = _tiny("llava", seed=5)
    tok = FakeTokenizer()
    ids = [[cfg.text.bos_token_id, 5, 9, 4]]
    outs = {}
    for name, k in (("plain", 0), ("spec", 8)):
        texts = list(
            generate_stream(
                params, cfg, ids, tokenizer=tok, max_new_tokens=12,
                temperature=0.0, attn_impl="xla", lookahead=k,
            )
        )
        outs[name] = texts[-1] if texts else ""
    assert outs["spec"] == outs["plain"]


def test_spec_accepts_on_cyclic_output():
    # Tiny random models greedily decode into short cycles; once the
    # history contains one full period, prompt-lookup drafts the cycle
    # and the dispatch count drops well below the token count. Scan a few
    # seeds so the test is robust to any one model not cycling early.
    best = None
    for seed in range(6):
        cfg, params = _tiny("llava", seed=seed)
        seqs, num_gen, iters = generate_speculative(
            params, cfg, [[cfg.text.bos_token_id, 5, 9, 4]],
            max_new_tokens=48, attn_impl="xla",
        )
        if int(num_gen[0]) >= 32:
            best = (int(num_gen[0]), iters)
            if iters < int(num_gen[0]) // 2:
                break
    assert best is not None, "no seed generated >= 32 tokens"
    n, iters = best
    assert iters < n, f"no speculation benefit: {iters} dispatches for {n} tokens"
