"""Randomized cross-feature soak of the paged serving engine.

Prefix caching, chunked prefill, speculative decoding, multi-LoRA,
preemption-by-recompute, and cancellation each have their own parity
tests; this drives them all AT ONCE on a page-starved engine under a
seeded random schedule of admissions and cancels, and asserts the
invariants that must survive any interleaving:

* every surviving greedy request emits token-for-token what a roomy
  plain engine emits (and a canceled one, a strict prefix of it);
* no page leaks: free + prefix-cached pages return to pool capacity;
* the stress actually happened (preemptions and prefix hits fired).

The reference serializes one HF generate at a time
(vcoder_llava/serve/chat.py:141-150) and has no analogue.
"""

import dataclasses

import jax
import numpy as np
import pytest

from vcoder_tpu.config import VCoderConfig
from vcoder_tpu.models import vcoder as model_mod
from vcoder_tpu.serve.paged_engine import PagedServingEngine

TARGETS = ["lm/layers/q_proj", "lm/layers/v_proj"]


@pytest.fixture(scope="module")
def setup():
    base = VCoderConfig.tiny("vcoder_llava")
    cfg = dataclasses.replace(
        base, text=dataclasses.replace(base.text, num_kv_heads=4)
    )
    params = model_mod.init_vcoder_params(jax.random.PRNGKey(0), cfg)

    def mk_adapter(seed, rank, alpha):
        tree = {}
        key = jax.random.PRNGKey(seed)
        for i, path in enumerate(TARGETS):
            leaf = params
            for part in path.split("/"):
                leaf = leaf[part]
            L, in_dim, out_dim = leaf.shape
            k1, k2 = jax.random.split(jax.random.fold_in(key, i))
            a = jax.random.normal(k1, (L, in_dim, rank)) * 0.1
            b = jax.random.normal(k2, (L, rank, out_dim)) * 0.1
            tree[path] = (a, b, float(alpha) / rank)
        return tree

    return cfg, params, {"x": mk_adapter(1, 4, 8.0)}


def _jobs(rng, n=10):
    """Greedy request specs with shared prefixes (prefix-cache bait),
    ragged lengths, and a sprinkle of LoRA routing."""
    shared = [1] + [20 + (j % 50) for j in range(23)]
    jobs = []
    for i in range(n):
        if rng.random() < 0.6:
            prompt = shared + [60 + i, 61 + (i * 3) % 20]
        else:
            prompt = [1 + i] + [
                30 + ((i * 7 + j) % 40) for j in range(10 + (i % 9))
            ]
        jobs.append(
            dict(
                input_ids=prompt,
                max_new_tokens=int(rng.integers(8, 22)),
                lora="x" if i % 4 == 3 else None,
            )
        )
    return jobs


def _collect(events, store):
    for rid, tok, done in events:
        store.setdefault(rid, []).append(int(tok))


def test_soak_invariants(setup):
    cfg, params, adapters = setup
    rng = np.random.default_rng(0)
    jobs = _jobs(rng)

    # Oracle: roomy pool, no features beyond the adapters.
    roomy = PagedServingEngine(
        cfg, params, max_batch=3, max_len=128, page_size=8,
        attn_impl="xla", lora_adapters=adapters,
    )
    rids = [roomy.add_request(**j) for j in jobs]
    res = roomy.run()
    oracle = [res[r] for r in rids]
    assert all(len(o) > 0 for o in oracle)

    # Stressed engine: page-starved + every serving feature at once.
    eng = PagedServingEngine(
        cfg, params, max_batch=3, max_len=128, page_size=8,
        attn_impl="xla", total_pages=14, prefix_cache=True,
        prefix_chunk=8, chunked_prefill=16, speculative=2,
        lora_adapters=adapters,
    )
    capacity = sum(len(f) for f in eng.free_pages)

    outputs: dict = {}
    canceled: set = set()
    pending = list(enumerate(jobs))
    rid_of: dict = {}
    live_rids: list = []
    steps = 0
    while pending or eng.has_work():
        # Seeded schedule: usually admit the next job, occasionally
        # cancel a random in-flight request mid-decode.
        if pending and rng.random() < 0.7:
            i, j = pending.pop(0)
            rid_of[i] = eng.add_request(**j)
            live_rids.append(rid_of[i])
        if live_rids and rng.random() < 0.08:
            victim = live_rids[int(rng.integers(len(live_rids)))]
            if eng.cancel(victim):
                canceled.add(victim)
            live_rids.remove(victim)
        _collect(eng.step(), outputs)
        steps += 1
        assert steps < 3000, "soak failed to converge"
    assert not eng.has_work()

    # Token parity against the oracle (prefix for canceled requests).
    for i, expect in enumerate(oracle):
        rid = rid_of[i]
        assert eng.pop_error(rid) is None, f"request {i} errored"
        got = outputs.get(rid, [])
        if rid in canceled:
            assert got == expect[: len(got)], f"req {i} not a prefix"
        else:
            assert got == expect, f"req {i} diverged"

    # No page leaks: everything is back in the free list or parked in
    # the prefix cache (refcount-0 pages awaiting reuse/LRU eviction).
    stats = eng.prefix_stats()
    free_now = sum(len(f) for f in eng.free_pages)
    assert free_now + stats["cached_pages"] == capacity
    assert all(not pages for pages in eng.row_pages)

    # The stress must actually have exercised the interactions.
    assert eng.preemptions >= 1, "pool never starved; tighten the test"
    assert stats["hits"] >= 1, "prefix cache never hit; tighten the test"
