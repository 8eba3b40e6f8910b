"""End-to-end generation tests on tiny random models (all variants).

The oracle: greedily generated tokens must equal the argmax chain obtained
by re-running the *full* spliced sequence through the decoder without a KV
cache — validating prefill/decode/cache consistency through the public
``generate`` API (the reference's quality gate is greedy COST eval,
SURVEY.md §4).
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
from vcoder_tpu.models import llama as llama_mod
from vcoder_tpu.models import vcoder as model_mod
from vcoder_tpu.multimodal import build_splice_plan


def _tiny(model_type):
    cfg = VCoderConfig.tiny(model_type)
    params = model_mod.init_vcoder_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _pixels(cfg, batch, seed):
    rng = np.random.default_rng(seed)
    s = cfg.vision.image_size
    return jnp.asarray(
        rng.standard_normal((batch, s, s, 3)).astype(np.float32)
    )


def _oracle_chain(cfg, params, input_ids, images, segs, depths, n_steps):
    """Greedy chain via full forward (no cache) re-run each step."""
    ds_mode = cfg.model_type == "vcoder_ds_llava"
    ids = list(input_ids[0])
    generated = []
    for _ in range(n_steps):
        plan = build_splice_plan(
            [ids],
            num_patches=cfg.vision.num_patches,
            has_seg=segs is not None,
            has_depth=depths is not None,
            ds_mode=ds_mode,
            is_depth_zero=[False] if depths is not None else None,
            pad_multiple=8,
        )
        pa = model_mod.plan_to_arrays(plan)
        vis = None
        if images is not None:
            vis = model_mod.encode_vision(
                params, cfg, images, segs, depths, attn_impl="xla"
            )
        embeds = model_mod.assemble_embeddings(
            params,
            cfg,
            pa["safe_ids"],
            pa["is_text"],
            pa["vis_idx"],
            vis,
            use_vcoder_emb=plan.use_vcoder_emb and cfg.use_vcoder_lm_emb,
        )
        hidden, _ = llama_mod.llama_forward(
            params["lm"],
            cfg.text,
            embeds,
            attn_mask=pa["attn_mask"],
            position_ids=pa["position_ids"],
            attn_impl="xla",
        )
        last = int(plan.seq_lens[0]) - 1
        logits = llama_mod.lm_head(params["lm"], hidden[:, last : last + 1])
        tok = int(jnp.argmax(logits[0, 0]))
        generated.append(tok)
        # Feed the sampled token back as a *text* token. Sentinel splice
        # keeps vision features in the same positions, so appending to the
        # raw id list reproduces the full spliced sequence.
        ids = ids + [tok]
    return generated


@pytest.mark.parametrize(
    "model_type,with_seg,with_depth",
    [
        ("llava", False, False),
        ("vcoder_llava", True, False),
        ("vcoder_ds_llava", True, True),
        ("vcoder_it_llava", True, False),
    ],
)
def test_greedy_generate_matches_full_forward(model_type, with_seg, with_depth):
    cfg, params = _tiny(model_type)
    images = _pixels(cfg, 1, 0)
    segs = _pixels(cfg, 1, 1) if with_seg else None
    depths = _pixels(cfg, 1, 2) if with_depth else None

    ids = [5, 6, 7, IMG]
    if with_seg:
        ids = [5, 6, 7, IMG, SEG]
    if with_depth:
        ids = [5, 6, 7, IMG, DEP, SEG]
    ids = ids + [8, 9]
    input_ids = [ids]

    n = 4
    result = generate(
        params,
        cfg,
        input_ids,
        images,
        segs,
        depths,
        max_new_tokens=n,
        temperature=0.0,
        attn_impl="xla",
        is_depth_zero=[False] if with_depth else None,
    )
    oracle = _oracle_chain(cfg, params, input_ids, images, segs, depths, n)
    got = result.sequences[0, : result.num_generated[0]].tolist()
    # Trim oracle at EOS the same way generate does.
    if cfg.text.eos_token_id in oracle:
        oracle = oracle[: oracle.index(cfg.text.eos_token_id)]
    assert got == oracle[: len(got)] and len(got) > 0


def test_multi_image_generate_and_mismatch_guard():
    """Two <image> sentinels with a [B, 2, H, W, C] stack: generation runs
    through the cached path and matches the no-cache oracle; swapping the
    two images changes the features each sentinel receives; and a
    mismatched stack count fails loudly."""
    cfg, params = _tiny("llava")
    rng = np.random.default_rng(11)
    s = cfg.vision.image_size
    imgs = jnp.asarray(
        rng.standard_normal((1, 2, s, s, 3)).astype(np.float32)
    )
    rows = [[5, 6, IMG, 7, IMG, 8]]

    n = 3
    result = generate(
        params, cfg, rows, imgs, max_new_tokens=n, temperature=0.0,
        attn_impl="xla",
    )
    oracle = _oracle_chain(cfg, params, rows, imgs, None, None, n)
    got = result.sequences[0, : result.num_generated[0]].tolist()
    if cfg.text.eos_token_id in oracle:
        oracle = oracle[: oracle.index(cfg.text.eos_token_id)]
    assert got == oracle[: len(got)] and len(got) > 0

    # Occurrence order matters: swapped images -> different prefill logits.
    from vcoder_tpu.models.vcoder import plan_to_arrays, prefill
    from vcoder_tpu.multimodal import build_splice_plan

    plan = build_splice_plan(
        rows, num_patches=cfg.vision.num_patches, pad_multiple=8
    )
    pa = plan_to_arrays(plan)
    l_fwd, _ = prefill(params, cfg, pa, imgs, attn_impl="xla")
    l_swp, _ = prefill(params, cfg, pa, imgs[:, ::-1], attn_impl="xla")
    assert not np.allclose(np.asarray(l_fwd), np.asarray(l_swp))

    # One stack for a two-sentinel prompt is an error, not a wrong answer.
    with pytest.raises(ValueError, match="feature stack"):
        generate(
            params, cfg, rows, imgs[:, 0], max_new_tokens=1,
            temperature=0.0, attn_impl="xla",
        )


def test_batch_generation_ragged():
    """Two rows with different lengths generate independently."""
    cfg, params = _tiny("llava")
    images = _pixels(cfg, 2, 3)
    rows = [[5, 6, 7, IMG, 8], [5, IMG, 9]]
    result = generate(
        params, cfg, rows, images, max_new_tokens=3, temperature=0.0,
        attn_impl="xla",
    )
    # Each row must match its own single-row generation.
    for b, row in enumerate(rows):
        solo = generate(
            params,
            cfg,
            [row],
            images[b : b + 1],
            max_new_tokens=3,
            temperature=0.0,
            attn_impl="xla",
        )
        np.testing.assert_array_equal(
            result.sequences[b, : result.num_generated[b]],
            solo.sequences[0, : solo.num_generated[0]],
        )


def test_sampling_seeds_differ():
    cfg, params = _tiny("llava")
    images = _pixels(cfg, 1, 4)
    ids = [[5, IMG, 8]]
    r1 = generate(
        params, cfg, ids, images, max_new_tokens=8, temperature=1.0,
        seed=0, attn_impl="xla",
    )
    r2 = generate(
        params, cfg, ids, images, max_new_tokens=8, temperature=1.0,
        seed=1, attn_impl="xla",
    )
    assert not np.array_equal(r1.sequences, r2.sequences)


def test_stop_string_halts_generation_early():
    """A stop keyword firing mid-budget must halt decode within one window
    (reference KeywordsStoppingCriteria semantics, mm_utils.py:128-151),
    not merely be stripped from the final text."""
    from vcoder_tpu.mm_tokens import KeywordsStoppingCriteria
    from vcoder_tpu.simple_tokenizer import SimpleTokenizer

    cfg, params = _tiny("llava")
    images = _pixels(cfg, 1, 7)
    ids = [[5, 6, IMG, 8, 9]]
    n = 24

    baseline = generate(
        params, cfg, ids, images, max_new_tokens=n, temperature=0.0,
        attn_impl="xla",
    )
    base_toks = baseline.sequences[0, : baseline.num_generated[0]].tolist()
    assert len(base_toks) >= 6, "tiny model must generate enough to stop in"

    # Word-level tokenizer whose vocab covers every generated id, so the
    # keyword decodes to exactly one generated token's text.
    vocab = {"<pad>": 0, "<s>": 1, "</s>": 2, "<unk>": 3}
    vocab.update({f"w{i}": i for i in range(4, cfg.text.vocab_size)})
    tok = SimpleTokenizer(vocab=vocab)
    target = base_toks[4]
    k = base_toks.index(target)  # first occurrence fires the criteria
    keyword = f"w{target}"
    criteria = KeywordsStoppingCriteria([keyword], tok, input_len=len(ids[0]))

    result = generate(
        params, cfg, ids, images, max_new_tokens=n, temperature=0.0,
        attn_impl="xla", tokenizer=tok, stopping_criteria=criteria,
    )
    got = int(result.num_generated[0])
    # Stops exactly at the keyword (inclusive), well before the budget.
    assert got == k + 1 < len(base_toks)
    assert result.sequences[0, :got].tolist() == base_toks[: k + 1]
    # Everything after the stop is EOS fill — decode really halted.
    eos = cfg.text.eos_token_id
    assert (result.sequences[0, got:] == eos).all()
    # The stop string is stripped from the text like the reference does.
    assert not result.texts[0].endswith(keyword)


def test_train_forward_loss_finite():
    cfg, params = _tiny("vcoder_llava")
    images = _pixels(cfg, 2, 5)
    segs = _pixels(cfg, 2, 6)
    ids = [[1, 5, IMG, SEG, 8, 9], [1, 6, IMG, SEG, 10, 11]]
    labels = [[-100, -100, -100, -100, 8, 9], [-100, -100, -100, -100, 10, 11]]
    plan = build_splice_plan(
        ids,
        num_patches=cfg.vision.num_patches,
        has_seg=True,
        labels=labels,
        pad_multiple=8,
    )
    pa = model_mod.plan_to_arrays(plan, include_labels=True)
    loss = model_mod.train_forward(
        params, cfg, pa, images, segs,
        use_vcoder_emb=True, attn_impl="xla", remat=False,
    )
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_seg_only_prompt_encodes_features():
    """images=None with segs present must encode and splice real seg
    features — different seg pixels must steer generation differently.
    (A gate on `images is not None` alone silently spliced pad-token
    embeddings into all feature positions.)

    Uses the DS arch: its passthrough rule is no-image AND no-seg
    (vcoder_ds_llava_arch.py:181), so a seg-only prompt DOES splice.
    The plain vcoder arch passthroughs seg-only prompts to text
    (vcoder_llava_arch.py:187) — that reference quirk stays."""
    cfg, params = _tiny("vcoder_ds_llava")
    rows = [[1, SEG, 9, 10, 11]]
    a = generate(
        params, cfg, rows, segs=_pixels(cfg, 1, 0), max_new_tokens=8,
        attn_impl="xla",
    )
    b = generate(
        params, cfg, rows, segs=_pixels(cfg, 1, 1), max_new_tokens=8,
        attn_impl="xla",
    )
    assert not np.array_equal(a.sequences, b.sequences)


def test_top_p_zero_degenerates_to_greedy():
    """top_p=0 (reachable from the gradio slider / wire params) must keep
    the top token (HF min_tokens_to_keep=1), not mask the whole
    vocabulary and emit token id 0 forever."""
    cfg, params = _tiny("llava")
    rows = [[1, 5, 6, 7]]
    g = generate(params, cfg, rows, max_new_tokens=8, attn_impl="xla")
    s = generate(
        params, cfg, rows, max_new_tokens=8, temperature=0.7, top_p=0.0,
        seed=3, attn_impl="xla",
    )
    np.testing.assert_array_equal(s.sequences, g.sequences)


def test_fused_path_eos_fills_after_early_finish():
    """When every row finishes before the budget, the fused decode loop
    exits early; the remaining buffer must be EOS (the documented 'pad
    after EOS' contract), not zero-fill."""
    import dataclasses as _dc

    cfg, params = _tiny("llava")
    rows = [[1, 5, 6, 7], [2, 8, 9, 10]]
    probe = generate(params, cfg, rows, max_new_tokens=10, attn_impl="xla")
    eos = int(probe.sequences[0, 2])
    cfg2 = _dc.replace(
        cfg, text=_dc.replace(cfg.text, eos_token_id=eos)
    )
    out = generate(params, cfg2, rows, max_new_tokens=10, attn_impl="xla")
    for b in range(2):
        row = out.sequences[b].tolist()
        assert eos in row
        i = row.index(eos)
        assert all(t == eos for t in row[i:]), row


def test_stop_criteria_without_tokenizer_still_stops():
    """The criteria carries its own tokenizer; generate(tokenizer=None)
    must still honor it (raw-ids callers used to silently get overlong
    sequences)."""
    from vcoder_tpu.mm_tokens import KeywordsStoppingCriteria
    from vcoder_tpu.simple_tokenizer import SimpleTokenizer

    cfg, params = _tiny("llava")
    ids = [[5, 6, 8, 9]]
    baseline = generate(
        params, cfg, ids, max_new_tokens=24, attn_impl="xla"
    )
    base_toks = baseline.sequences[0, : baseline.num_generated[0]].tolist()
    vocab = {"<pad>": 0, "<s>": 1, "</s>": 2, "<unk>": 3}
    vocab.update({f"w{i}": i for i in range(4, cfg.text.vocab_size)})
    tok = SimpleTokenizer(vocab=vocab)
    target = base_toks[4]
    criteria = KeywordsStoppingCriteria(
        [f"w{target}"], tok, input_len=len(ids[0])
    )
    result = generate(
        params, cfg, ids, max_new_tokens=24, attn_impl="xla",
        stopping_criteria=criteria,  # note: no tokenizer=
    )
    assert int(result.num_generated[0]) < len(base_toks)


def test_stop_criteria_internal_error_propagates():
    """A compatible criteria that raises INSIDE its __call__ must
    propagate, not be silently treated as 'unsupported signature' (which
    disabled stop strings for the whole generation)."""
    cfg, params = _tiny("llava")

    class Boom:
        keywords = ["x"]

        def __call__(self, output_ids):
            raise TypeError("boom")

    with pytest.raises(TypeError, match="boom"):
        generate(
            params, cfg, [[5, 6, 8, 9]], max_new_tokens=8,
            attn_impl="xla", stopping_criteria=Boom(),
        )


def test_hf_style_criteria_skipped():
    """An HF-signature criteria ((input_ids, scores)) is detected by
    signature and skipped without error."""
    cfg, params = _tiny("llava")

    class HFStyle:
        keywords = ["x"]

        def __call__(self, input_ids, scores):
            raise AssertionError("must not be called host-side")

    out = generate(
        params, cfg, [[5, 6, 8, 9]], max_new_tokens=6,
        attn_impl="xla", stopping_criteria=HFStyle(),
    )
    assert out.sequences.shape == (1, 6)
