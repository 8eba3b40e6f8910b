"""Chunked prefill (paged engine prefill/decode interleaving).

A `chunked_prefill=N` engine runs at most one N-token prefill chunk per
step() while rows are decoding, so admissions never stall in-flight
decodes for longer than one chunk — and runs chunks to completion when
the engine is idle (nothing to interleave against) — while emitting
token-for-token the same outputs as the fused dense-prefill engine. The
reference blocks its whole generate loop on each admission (HF
GenerationMixin is strictly sequential,
vcoder_llava/serve/chat.py:141-150); vLLM-style chunked prefill is a
TPU-rebuild addition."""

import dataclasses

import jax
import numpy as np
import pytest

from vcoder_tpu.config import VCoderConfig
from vcoder_tpu.constants import IMAGE_TOKEN_INDEX, SEG_TOKEN_INDEX
from vcoder_tpu.models import vcoder as model_mod
from vcoder_tpu.serve.paged_engine import PagedServingEngine


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
    return cfg, params, px


def _text_prompt(tail, n=40):
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
            eng.add_request(p, images=im, segs=im, max_new_tokens=max_new)
        )
    res = eng.run()
    return [res[r] for r in rids]


def test_text_parity_with_dense_prefill(setup):
    cfg, params, px = setup
    prompts = [_text_prompt([5, 9]), _text_prompt([7, 3, 11], n=33)]
    plain = _serve(_engine(cfg, params), prompts)
    chunked = _serve(
        _engine(cfg, params, chunked_prefill=16), prompts
    )
    assert chunked == plain


def test_multimodal_parity(setup):
    cfg, params, px = setup
    prompts = [_mm_prompt([7, 8]), _mm_prompt([9, 4, 2])]
    plain = _serve(_engine(cfg, params), prompts, [px, px])
    chunked = _serve(
        _engine(cfg, params, chunked_prefill=16), prompts, [px, px]
    )
    assert chunked == plain


def test_q8_pool_parity(setup):
    cfg, params, px = setup
    prompts = [_text_prompt([5, 9]), _text_prompt([2, 6], n=29)]
    plain = _serve(_engine(cfg, params, kv_quant=True), prompts)
    chunked = _serve(
        _engine(cfg, params, kv_quant=True, chunked_prefill=16), prompts
    )
    assert chunked == plain


def test_composes_with_prefix_cache(setup):
    """Chunked admission still reuses cached prefix pages (and still
    publishes its own), so the second identical prompt prefills only its
    final partial page."""
    cfg, params, px = setup
    prompts = [_text_prompt([5, 9]), _text_prompt([5, 9])]
    plain = _serve(_engine(cfg, params), prompts)
    eng = _engine(
        cfg, params, chunked_prefill=16, prefix_cache=True,
        prefix_chunk=16,
    )
    chunked = _serve(eng, prompts)
    assert chunked == plain
    s = eng.prefix_stats()
    assert s["hits"] >= 1 and s["reused_pages"] > 0


def test_speculative_parity(setup):
    cfg, params, px = setup
    prompts = [_text_prompt([5, 9, 5, 9, 5]), _text_prompt([2, 6], n=29)]
    plain = _serve(_engine(cfg, params, speculative=4), prompts, max_new=8)
    chunked = _serve(
        _engine(cfg, params, speculative=4, chunked_prefill=16),
        prompts,
        max_new=8,
    )
    assert chunked == plain


def test_decode_interleaves_with_admission(setup):
    """While a long prompt prefills chunk-by-chunk, the already-running
    request keeps emitting tokens every step — the interleaving that is
    the point of the feature."""
    cfg, params, px = setup
    eng = _engine(cfg, params, chunked_prefill=8, max_len=512)
    r0 = eng.add_request(_text_prompt([5, 9]), max_new_tokens=64)
    # Admit r0 fully first.
    while not any(eng.active):
        eng.step()
    long_prompt = _text_prompt(list(range(30, 80)), n=90)  # many chunks
    r1 = eng.add_request(long_prompt, max_new_tokens=4)
    saw_r0_during_pending = 0
    pending_steps = 0
    for _ in range(300):
        events = eng.step()
        if eng._pending is not None:
            pending_steps += 1
            saw_r0_during_pending += sum(
                1 for rid, _, _ in events if rid == r0
            )
        if any(rid == r1 for rid, _, _ in events):
            break
    else:
        pytest.fail("admission never completed")
    # The long prompt needed several chunked steps, and r0 decoded
    # through them.
    assert pending_steps >= 2
    assert saw_r0_during_pending >= pending_steps


def test_idle_admission_runs_all_chunks_in_one_step(setup):
    """With no rows decoding there is nothing to interleave against, so
    a cold chunked admission must complete inside ONE step() instead of
    paying the one-chunk-per-step tax (the vLLM token-budget rule)."""
    cfg, params, px = setup
    eng = _engine(cfg, params, chunked_prefill=8, max_len=512)
    long_prompt = _text_prompt(list(range(30, 80)), n=90)  # many chunks
    rid = eng.add_request(long_prompt, max_new_tokens=4)
    events = eng.step()
    assert eng._pending is None
    assert any(r == rid for r, _, _ in events)  # first token emitted
    # And under load the one-chunk-per-step contract still holds
    # (test_decode_interleaves_with_admission).


def test_pool_exhaustion_defers_chunked_admission(setup):
    """With the pool sized for ~one request, the second request waits
    (DeferAdmission) and is served after the first completes."""
    cfg, params, px = setup
    eng = _engine(
        cfg, params, max_batch=2, chunked_prefill=16, total_pages=16,
        max_len=64,
    )
    prompts = [_text_prompt([5, 9]), _text_prompt([7, 3], n=38)]
    out = _serve(eng, prompts, max_new=3)
    assert all(len(o) == 3 for o in out)
    assert all(not p for p in eng.row_pages)


def test_chunked_prefill_rejects_mesh(setup):
    cfg, params, px = setup
    from vcoder_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    mesh = make_mesh(data=2, fsdp=1, model=1)
    with pytest.raises(ValueError, match="single-device"):
        _engine(cfg, params, chunked_prefill=16, mesh=mesh, max_batch=2)


def test_concurrent_admissions_batch_into_one_group(setup):
    """Same-shape requests queued together stage into ONE lockstep
    group (one [G, kc] chunk dispatch per step instead of G), and emit
    token-for-token what the sequential dense-prefill engine emits."""
    cfg, params, px = setup
    prompts = [
        _text_prompt([5, 9]),
        _text_prompt([7, 3]),
        _text_prompt([11, 2]),
    ]
    plain = _serve(_engine(cfg, params, max_batch=4), prompts)
    eng = _engine(cfg, params, max_batch=4, chunked_prefill=16)
    grouped = _serve(eng, prompts)
    assert grouped == plain
    assert max(eng.admit_group_sizes) == 3, eng.admit_group_sizes


def test_concurrent_mm_admissions_batch_vision(setup):
    """Multimodal concurrent admissions share one batched vision encode
    (one group) and match the sequential engine."""
    cfg, params, px = setup
    prompts = [_mm_prompt([7, 8]), _mm_prompt([9, 4])]
    plain = _serve(_engine(cfg, params, max_batch=4), prompts, [px, px])
    eng = _engine(cfg, params, max_batch=4, chunked_prefill=16)
    grouped = _serve(eng, prompts, [px, px])
    assert grouped == plain
    assert max(eng.admit_group_sizes) == 2, eng.admit_group_sizes


def test_mixed_shape_admissions_split_groups(setup):
    """Different padded lengths / modality signatures degrade to
    separate groups — never an error, still exact parity."""
    cfg, params, px = setup
    prompts = [
        _text_prompt([5, 9]),          # text, short
        _mm_prompt([7, 8]),            # multimodal
        _text_prompt(list(range(30, 60)), n=80),  # text, long
    ]
    pxs = [None, px, None]
    plain = _serve(_engine(cfg, params, max_batch=4), prompts, pxs)
    eng = _engine(cfg, params, max_batch=4, chunked_prefill=16)
    grouped = _serve(eng, prompts, pxs)
    assert grouped == plain
    # The multimodal request cannot share the text requests' group (its
    # modality signature differs), so at least two groups formed; the two
    # text prompts MAY share one if they pad to the same bucket.
    assert sum(eng.admit_group_sizes) == 3
    assert len(eng.admit_group_sizes) >= 2, eng.admit_group_sizes


def test_identical_concurrent_prompts_wait_for_publish(setup):
    """A queued prompt whose pages are being prefilled RIGHT NOW by an
    in-flight admission waits for their publication (no redundant
    parallel re-prefill) and then admits as a prefix hit."""
    cfg, params, px = setup
    prompts = [_text_prompt([5, 9]), _text_prompt([5, 9])]
    plain = _serve(_engine(cfg, params, max_batch=4), prompts)
    eng = _engine(
        cfg, params, max_batch=4, chunked_prefill=16,
        prefix_cache=True, prefix_chunk=16,
    )
    out = _serve(eng, prompts)
    assert out == plain
    s = eng.prefix_stats()
    assert s["hits"] >= 1 and s["reused_pages"] > 0
    # Both admitted as singleton groups: the second WAITED instead of
    # staging concurrently (its pages were all in flight).
    assert eng.admit_group_sizes == [1, 1], eng.admit_group_sizes


def test_cancel_one_row_mid_group(setup):
    """Cancelling one request of an in-flight group returns its pages
    and leaves the surviving rows' outputs untouched."""
    cfg, params, px = setup
    solo = _serve(_engine(cfg, params, max_batch=4),
                  [_text_prompt([7, 3])])
    eng = _engine(cfg, params, max_batch=4, chunked_prefill=8,
                  max_len=128)
    free0 = sum(len(f) for f in eng.free_pages)
    # A decode row must be active first or the idle fast path drains the
    # whole group inside one step.
    bg = eng.add_request(_text_prompt([2, 6], n=8), max_new_tokens=48)
    while not any(eng.active):
        eng.step()
    ra = eng.add_request(
        _text_prompt(list(range(30, 70)), n=70), max_new_tokens=4
    )
    rb = eng.add_request(_text_prompt([7, 3]), max_new_tokens=5)
    eng.step()  # stage both; at most one chunk ran
    assert eng._pending is not None
    assert eng.cancel(ra)
    outputs: dict = {}
    steps = 0
    while eng.has_work():
        for rid, tok, _d in eng.step():
            outputs.setdefault(rid, []).append(int(tok))
        steps += 1
        assert steps < 500
    assert ra not in outputs
    assert outputs[rb] == solo[0]
    assert sum(len(f) for f in eng.free_pages) == free0 - sum(
        len(p) for p in eng.row_pages
    )
