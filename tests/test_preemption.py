"""Preemption by recompute in the paged engine.

When the page pool runs dry mid-decode, the engine must requeue the
starved row (folding its generated tokens into the prompt) instead of
killing it — vLLM-style recompute. The contract: outputs are identical
to an engine with a roomy pool (greedy recompute continues exactly
where decode stopped), no pages leak, and the client stream never sees
the preemption. The reference has no analogue (one HF generate at a
time, vcoder_llava/serve/chat.py:141-150)."""

import dataclasses

import jax
import pytest

from vcoder_tpu.config import VCoderConfig
from vcoder_tpu.models import vcoder as model_mod
from vcoder_tpu.serve.paged_engine import PagedServingEngine


@pytest.fixture(scope="module")
def setup():
    base = VCoderConfig.tiny("vcoder_llava")
    cfg = dataclasses.replace(
        base, text=dataclasses.replace(base.text, num_kv_heads=4)
    )
    params = model_mod.init_vcoder_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _prompt(i, n=34):
    return [1 + i] + [20 + ((i * 7 + j) % 50) for j in range(n - 1)]


def _serve(eng, prompts, max_new=24):
    rids = [eng.add_request(p, max_new_tokens=max_new) for p in prompts]
    res = eng.run()
    return [res[r] for r in rids]


def _engine(cfg, params, **kw):
    kw.setdefault("max_batch", 2)
    kw.setdefault("max_len", 256)
    kw.setdefault("page_size", 8)
    kw.setdefault("attn_impl", "xla")
    return PagedServingEngine(cfg, params, **kw)


def test_preemption_matches_roomy_pool(setup):
    cfg, params = setup
    prompts = [_prompt(0), _prompt(1)]
    expected = _serve(_engine(cfg, params), prompts)
    assert all(len(o) > 0 for o in expected)

    tight = _engine(cfg, params, total_pages=14)
    capacity = len(tight.free_pages[0])
    out = _serve(tight, prompts)
    assert tight.preemptions >= 1, "pool never ran dry; tighten the test"
    assert out == expected
    # Every page returned to the pool.
    assert len(tight.free_pages[0]) == capacity
    assert not tight.has_work()


def test_preemption_with_prefix_cache(setup):
    """Recompute re-prefills the folded prompt; with the prefix cache on
    the original prompt's pages are still cached, so the recompute hits
    instead of recomputing from scratch — and outputs stay identical."""
    cfg, params = setup
    prompts = [_prompt(0), _prompt(1)]
    expected = _serve(_engine(cfg, params), prompts)

    tight = _engine(
        cfg, params, total_pages=14, prefix_cache=True, prefix_chunk=16
    )
    out = _serve(tight, prompts)
    assert tight.preemptions >= 1, "pool never ran dry; tighten the test"
    assert out == expected
    assert tight.prefix_stats()["hits"] >= 1


def test_preemption_speculative(setup):
    """The speculative window path preempts too (horizon = spec_k); the
    recomputed row's accepted tokens match the roomy engine."""
    cfg, params = setup
    prompts = [_prompt(0), _prompt(1)]
    expected = _serve(_engine(cfg, params, speculative=2), prompts)

    tight = _engine(cfg, params, total_pages=14, speculative=2)
    out = _serve(tight, prompts)
    assert tight.preemptions >= 1, "pool never ran dry; tighten the test"
    assert out == expected


def test_sole_decoder_starved_by_pending_prefill_requeues(setup):
    """A lone decoding row starved while a chunked prefill holds region
    pages must REQUEUE (the pending request will free pages), not die:
    sum(active)==1 does not mean nothing can free pages when
    self._pending exists."""
    cfg, params = setup
    a_prompt = _prompt(0, n=15)  # 3 pages once decoding
    # 16 pages of region, chunk-prefilled over 16 steps — A starves
    # squarely inside that window (verified: preempt fires with
    # _pending held and exactly one active row).
    b_prompt = _prompt(1, n=128)

    roomy = _engine(cfg, params, chunked_prefill=8)
    ra = roomy.add_request(a_prompt, max_new_tokens=20)
    rb = roomy.add_request(b_prompt, max_new_tokens=4)
    expected = roomy.run()

    eng = _engine(cfg, params, total_pages=21, chunked_prefill=8)
    outputs: dict = {}
    rid_a = eng.add_request(a_prompt, max_new_tokens=20)
    # Let A prefill + decode its first token before B arrives.
    for _ in range(2):
        for rid, tok, _d in eng.step():
            outputs.setdefault(rid, []).append(int(tok))
    rid_b = eng.add_request(b_prompt, max_new_tokens=4)
    steps = 0
    while eng.has_work():
        for rid, tok, _d in eng.step():
            outputs.setdefault(rid, []).append(int(tok))
        steps += 1
        assert steps < 500, "failed to converge"
    assert eng.preemptions >= 1, "A never starved mid-pending; retune"
    assert eng.pop_error(rid_a) is None
    assert eng.pop_error(rid_b) is None
    assert outputs[rid_a] == expected[ra]
    assert outputs[rid_b] == expected[rb]


def test_sole_request_too_big_still_fails(setup):
    """With nothing else running (and nothing queued that could free
    pages), exhaustion means the pool genuinely cannot hold the request:
    it must end (with an error recorded), not requeue forever."""
    cfg, params = setup
    eng = _engine(cfg, params, max_batch=1, total_pages=7)
    rid = eng.add_request(_prompt(0), max_new_tokens=64)
    res = eng.run()
    assert rid in res
    assert eng.preemptions == 0
    assert not eng.has_work()
    # The reason must surface to front-ends — a silent truncation would
    # look like a clean (short) completion to the client.
    assert "pool exhausted" in (eng.pop_error(rid) or "")
