"""Automatic prefix caching (serve/prefix_cache.py + paged engine).

The cached path must be invisible in outputs: a prefix-cache engine's
tokens match a cache-less engine token-for-token, while its page
accounting shows real reuse. The reference has no analogue (it
re-prefills the full history every chat turn,
vcoder_llava/serve/chat.py:141-150)."""

import dataclasses

import jax
import numpy as np
import pytest

from vcoder_tpu.config import VCoderConfig
from vcoder_tpu.constants import IMAGE_TOKEN_INDEX, SEG_TOKEN_INDEX
from vcoder_tpu.models import vcoder as model_mod
from vcoder_tpu.serve.paged_engine import PagedServingEngine
from vcoder_tpu.serve.prefix_cache import (
    PrefixIndex,
    chain_hashes,
    content_key_ids,
)


@pytest.fixture(scope="module")
def setup():
    base = VCoderConfig.tiny("vcoder_llava")
    cfg = dataclasses.replace(
        base, text=dataclasses.replace(base.text, num_kv_heads=4)
    )
    params = model_mod.init_vcoder_params(jax.random.PRNGKey(0), cfg)
    hw = cfg.vision.image_size
    px = np.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (1, hw, hw, 3))
    )
    px2 = np.asarray(
        jax.random.normal(jax.random.PRNGKey(2), (1, hw, hw, 3))
    )
    return cfg, params, px, px2


def _text_prompt(tail, n=40):
    """Long shared text prefix (spans several 8-token pages) + tail."""
    return [1] + [20 + (j % 50) for j in range(n)] + list(tail)


def _mm_prompt(tail, n=24):
    return (
        [1]
        + [20 + (j % 50) for j in range(n)]
        + [IMAGE_TOKEN_INDEX, SEG_TOKEN_INDEX]
        + list(tail)
    )


def _engine(cfg, params, **kw):
    kw.setdefault("max_batch", 2)
    kw.setdefault("max_len", 256)
    kw.setdefault("page_size", 8)
    kw.setdefault("attn_impl", "xla")
    return PagedServingEngine(cfg, params, **kw)


def _serve(eng, prompts, px_list=None, max_new=5):
    rids = []
    for i, p in enumerate(prompts):
        im = px_list[i] if px_list else None
        rids.append(
            eng.add_request(
                p, images=im, segs=im, max_new_tokens=max_new
            )
        )
    res = eng.run()
    return [res[r] for r in rids]


# ---------------------------------------------------------------------------
# module-level units
# ---------------------------------------------------------------------------


def test_chain_hashes_are_chained():
    ids = np.arange(32, dtype=np.int64)
    h = chain_hashes(ids, 8)
    assert len(h) == 4
    # Changing block 0 re-keys EVERY later block (causal chain).
    ids2 = ids.copy()
    ids2[0] = 999
    h2 = chain_hashes(ids2, 8)
    assert all(a != b for a, b in zip(h, h2))
    # Changing the tail only re-keys the tail.
    ids3 = ids.copy()
    ids3[-1] = 999
    h3 = chain_hashes(ids3, 8)
    assert h3[:3] == h[:3] and h3[3] != h[3]
    # Partial blocks never hash.
    assert len(chain_hashes(ids[:15], 8)) == 1


def test_content_keys_cover_pixels(setup):
    cfg, params, px, px2 = setup
    from vcoder_tpu.multimodal import build_splice_plan
    from vcoder_tpu.serve.engine import Request

    prompt = _mm_prompt([7, 8])
    plan = build_splice_plan(
        [prompt], num_patches=cfg.vision.num_patches,
        has_image=True, has_seg=True, pad_multiple=8,
    )
    r1 = Request(0, prompt, images=px, segs=px)
    r2 = Request(1, prompt, images=px2, segs=px2)
    k1, k2 = content_key_ids(plan, r1), content_key_ids(plan, r2)
    is_text = plan.is_text[0, : len(k1)]
    assert (k1[is_text] == k2[is_text]).all()  # text keys: token ids
    assert (k1[~is_text] != k2[~is_text]).all()  # pixels re-key vision
    assert (k1[~is_text] < 0).all()  # surrogates can't alias token ids
    assert (content_key_ids(plan, r1) == k1).all()  # deterministic


def test_index_refcounts_and_eviction():
    idx = PrefixIndex()
    assert idx.register(b"h0", 10) and idx.register(b"h1", 11)
    assert not idx.register(b"h0", 12)  # hash already served
    assert idx.match([b"h0", b"h1", b"hX"]) == [10, 11]  # longest prefix
    # owner + one reuse: two releases to become evictable
    idx.release(10)
    assert idx.evict(5) == []
    idx.release(10)
    assert idx.evict(5) == [10]
    assert idx.match([b"h0"]) == []  # evicted == forgotten
    s = idx.stats()
    assert s["evicted"] == 1 and s["cached_pages"] == 1


# ---------------------------------------------------------------------------
# engine behavior
# ---------------------------------------------------------------------------


def test_text_prefix_hit_matches_uncached(setup):
    cfg, params, px, _ = setup
    prompts = [
        _text_prompt([5, 9]),
        _text_prompt([5, 9]),      # identical -> full-prefix hit
        _text_prompt([5, 9, 77]),  # turn-2 style extension -> hit
    ]
    plain = _serve(_engine(cfg, params), prompts)
    eng = _engine(cfg, params, prefix_cache=True, prefix_chunk=16)
    cached = _serve(eng, prompts)
    assert cached == plain
    s = eng.prefix_stats()
    assert s["hits"] >= 2 and s["reused_pages"] > 0


def test_vision_in_suffix_matches_uncached(setup):
    """Shared text pages + differing images: the match stops before the
    vision span, so the suffix prefill runs the full embedding path."""
    cfg, params, px, px2 = setup
    prompts = [_mm_prompt([7, 8]), _mm_prompt([7, 8])]
    px_list = [px, px2]
    plain = _serve(_engine(cfg, params), prompts, px_list)
    eng = _engine(cfg, params, prefix_cache=True, prefix_chunk=16)
    cached = _serve(eng, prompts, px_list)
    assert cached == plain
    s = eng.prefix_stats()
    assert s["hits"] >= 1 and s["reused_pages"] > 0


def test_vision_in_prefix_full_hit(setup):
    """Identical multimodal prompt twice: the whole prompt (vision
    included) rides cached pages; the suffix is text-only."""
    cfg, params, px, _ = setup
    prompts = [_mm_prompt([7, 8]), _mm_prompt([7, 8])]
    px_list = [px, px]
    plain = _serve(_engine(cfg, params), prompts, px_list)
    eng = _engine(cfg, params, prefix_cache=True, prefix_chunk=16)
    cached = _serve(eng, prompts, px_list)
    assert cached == plain
    assert eng.prefix_stats()["reused_pages"] >= 3


def test_q8_pools_prefix_hit(setup):
    cfg, params, px, _ = setup
    prompts = [_text_prompt([5, 9]), _text_prompt([5, 9, 77])]
    plain = _serve(_engine(cfg, params, kv_quant=True), prompts)
    eng = _engine(
        cfg, params, kv_quant=True, prefix_cache=True, prefix_chunk=16
    )
    cached = _serve(eng, prompts)
    assert cached == plain
    assert eng.prefix_stats()["hits"] >= 1


def test_embedding_route_partitions_cache(setup):
    """A text-only request embeds text via embed_tokens; a seg-carrying
    request embeds the SAME leading text via vcoder_lm_emb
    (multimodal.build_splice_plan use_vcoder_emb=has_seg). Identical
    leading tokens therefore produce different KV and must never share
    cached pages — the salt partitions on the route."""
    cfg, params, px, _ = setup
    # At init vcoder_lm_emb == embed_tokens; perturb it so the two
    # embedding routes produce visibly different logits.
    params = dict(params)
    params["vcoder_lm_emb"] = params["vcoder_lm_emb"] + 0.05
    lead = [1] + [20 + (j % 50) for j in range(40)]
    text_prompt = lead + [5, 9]
    mm_prompt = lead + [IMAGE_TOKEN_INDEX, SEG_TOKEN_INDEX, 7, 8]

    def serve_mixed(eng):
        r1 = eng.add_request(text_prompt, max_new_tokens=5)
        out1 = dict(eng.run())
        r2 = eng.add_request(
            mm_prompt, images=px, segs=px, max_new_tokens=5
        )
        out2 = dict(eng.run())
        return out1[r1], out2[r2]

    plain = serve_mixed(_engine(cfg, params))
    eng = _engine(cfg, params, prefix_cache=True, prefix_chunk=16)
    cached = serve_mixed(eng)
    assert cached == plain
    # The seg request must not have reused the text request's pages
    # (its own pages can still register for future seg requests).
    assert eng.prefix_stats()["hits"] == 0


def test_page_accounting_and_eviction(setup):
    """Distinct prompts under a tight pool: cached pages are evicted to
    satisfy allocations, and no page ever leaks — free + cached always
    rebuilds the full pool once rows drain."""
    cfg, params, px, _ = setup
    eng = _engine(
        cfg, params, max_batch=1, prefix_cache=True, prefix_chunk=16,
        total_pages=24,
    )
    capacity = eng.pages_per_shard - 2  # sentinel + scratch

    def distinct(i):
        # Leading token differs -> the chained hashes share NOTHING.
        return [1 + i] + [20 + (j % 50) for j in range(48)] + [5, 9]

    for i in range(6):
        out = _serve(eng, [distinct(i)])
        assert len(out[0]) > 0
    assert all(not p for p in eng.row_pages)
    s = eng.prefix_stats()
    assert s["evicted"] > 0
    assert len(eng.free_pages[0]) + s["cached_pages"] == capacity
    # The most recent prompt survived LRU churn: re-serving it hits.
    _serve(eng, [distinct(5)])
    assert eng.prefix_stats()["hits"] >= 1


def test_prefix_cache_rejects_mesh(setup):
    cfg, params, px, _ = setup
    from vcoder_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    mesh = make_mesh(data=2, fsdp=1, model=1)
    with pytest.raises(ValueError, match="single-device"):
        _engine(cfg, params, prefix_cache=True, mesh=mesh, max_batch=2)
