"""Continuous-batching engine tests: equivalence with the fused generate
loop, slot reuse, mixed-modality admission, per-request temperature."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vcoder_tpu.config import VCoderConfig
from vcoder_tpu.constants import (
    DEPTH_TOKEN_INDEX,
    IMAGE_TOKEN_INDEX,
    SEG_TOKEN_INDEX,
)
from vcoder_tpu.generation import generate
from vcoder_tpu.models import vcoder as model_mod
from vcoder_tpu.serve.engine import ServingEngine


@pytest.fixture(scope="module")
def setup():
    cfg = VCoderConfig.tiny("vcoder_ds_llava")
    params = model_mod.init_vcoder_params(jax.random.PRNGKey(0), cfg)
    hw = cfg.vision.image_size
    px = np.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (1, hw, hw, 3))
    )
    return cfg, params, px


def _prompt(i, with_depth=True):
    base = [1, 10 + i, 11, IMAGE_TOKEN_INDEX]
    if with_depth:
        base += [DEPTH_TOKEN_INDEX, SEG_TOKEN_INDEX]
    else:
        base += [SEG_TOKEN_INDEX]
    return base + [12, 13 + i]


def test_engine_matches_fused_generate(setup):
    cfg, params, px = setup
    ids = _prompt(0)
    ref = generate(
        params, cfg, [ids], jnp.asarray(px), jnp.asarray(px),
        jnp.asarray(px), max_new_tokens=6, temperature=0.0,
        attn_impl="xla", pad_to=512,
    )
    ref_tokens = [
        int(t) for t in ref.sequences[0][: int(ref.num_generated[0])]
    ]

    eng = ServingEngine(
        cfg, params, max_batch=2, max_len=768, attn_impl="xla"
    )
    rid = eng.add_request(
        ids, images=px, segs=px, depths=px, max_new_tokens=6
    )
    out = eng.run()
    assert out[rid] == ref_tokens


def test_engine_concurrent_requests_and_slot_reuse(setup):
    cfg, params, px = setup
    eng = ServingEngine(
        cfg, params, max_batch=2, max_len=768, attn_impl="xla"
    )
    # 4 requests through 2 slots: forces queueing + slot reuse.
    rids = [
        eng.add_request(
            _prompt(i), images=px, segs=px, depths=px, max_new_tokens=4
        )
        for i in range(4)
    ]
    out = eng.run()
    assert set(out.keys()) == set(rids)
    for rid in rids:
        assert 1 <= len(out[rid]) <= 4

    # Each request's output equals its solo fused-generate run (batch
    # interference would break this).
    for i, rid in enumerate(rids):
        ref = generate(
            params, cfg, [_prompt(i)], jnp.asarray(px), jnp.asarray(px),
            jnp.asarray(px), max_new_tokens=4, temperature=0.0,
            attn_impl="xla", pad_to=512,
        )
        ref_tokens = [
            int(t) for t in ref.sequences[0][: int(ref.num_generated[0])]
        ]
        assert out[rid] == ref_tokens, f"request {i}"


def test_int4_engine_matches_fused_generate(setup):
    """--load-4bit serving end to end: both engines over packed-int4
    weights must emit the fused generate loop's tokens (round 4: int4
    previously compiled on CPU and crashed on TPU — jnp.int4 entry args;
    now nibble-packed int8 storage, ops/quant.py)."""
    from vcoder_tpu.quant import quantize_params
    from vcoder_tpu.serve.paged_engine import PagedServingEngine

    cfg, params, px = setup
    q4 = quantize_params(params, bits=4, destroy=False)
    ids = _prompt(3)
    ref = generate(
        q4, cfg, [ids], jnp.asarray(px), jnp.asarray(px), jnp.asarray(px),
        max_new_tokens=5, temperature=0.0, attn_impl="xla", pad_to=512,
    )
    ref_tokens = [
        int(t) for t in ref.sequences[0][: int(ref.num_generated[0])]
    ]
    for eng in (
        ServingEngine(cfg, q4, max_batch=2, max_len=768, attn_impl="xla"),
        PagedServingEngine(
            cfg, q4, max_batch=2, max_len=768, page_size=16,
            attn_impl="xla",
        ),
    ):
        rid = eng.add_request(
            ids, images=px, segs=px, depths=px, max_new_tokens=5
        )
        out = eng.run()
        assert out[rid] == ref_tokens, type(eng).__name__


def test_engine_mixed_modalities(setup):
    cfg, params, px = setup
    eng = ServingEngine(
        cfg, params, max_batch=2, max_len=768, attn_impl="xla"
    )
    r1 = eng.add_request(
        _prompt(0), images=px, segs=px, depths=px, max_new_tokens=3
    )
    r2 = eng.add_request(
        _prompt(1, with_depth=False), images=px, segs=px, max_new_tokens=3
    )
    r3 = eng.add_request([1, 5, 6, 7], max_new_tokens=3)  # text-only
    out = eng.run()
    assert set(out.keys()) == {r1, r2, r3}


def test_engine_temperature_sampling(setup):
    cfg, params, px = setup
    eng = ServingEngine(
        cfg, params, max_batch=2, max_len=768, attn_impl="xla", seed=7
    )
    rid = eng.add_request(
        _prompt(0), images=px, segs=px, depths=px,
        max_new_tokens=8, temperature=1.5,
    )
    out = eng.run()
    assert len(out[rid]) >= 1


@pytest.mark.slow
def test_slot_engine_multichip_matches_single(setup):
    """ServingEngine over the 8-device CPU mesh (sharded params, cache rows
    over data x fsdp + heads over model) decodes token-for-token like the
    single-device engine."""
    from vcoder_tpu.parallel.mesh import make_mesh
    from vcoder_tpu.parallel.sharding import shard_params

    cfg, params, px = setup
    mesh = make_mesh(jax.devices()[:8], data=2, fsdp=2, model=2)

    single = ServingEngine(
        cfg, params, max_batch=4, max_len=768, attn_impl="xla"
    )
    multi = ServingEngine(
        cfg, shard_params(params, mesh), max_batch=4, max_len=768,
        attn_impl="xla", mesh=mesh,
    )
    outs = {}
    for name, eng in (("single", single), ("multi", multi)):
        rids = [
            eng.add_request(
                _prompt(i), images=px, segs=px, depths=px,
                max_new_tokens=4,
            )
            for i in range(5)
        ]
        res = eng.run()
        outs[name] = [res[r] for r in rids]
    assert outs["multi"] == outs["single"]


# ---- speculative continuous batching -------------------------------------


def test_spec_engine_matches_plain_greedy(setup):
    """speculative=k must emit token-for-token what the plain engine does
    for greedy requests (drafting/verification is a pure latency
    optimization)."""
    cfg, params, px = setup
    plain = ServingEngine(
        cfg, params, max_batch=2, max_len=768, attn_impl="xla"
    )
    spec = ServingEngine(
        cfg, params, max_batch=2, max_len=768, attn_impl="xla",
        speculative=6,
    )
    assert spec.cache.k.shape[2] == 768 + 6  # lookahead slack
    outs = {}
    for name, eng in (("plain", plain), ("spec", spec)):
        rids = [
            eng.add_request(
                _prompt(i), images=px, segs=px, depths=px,
                max_new_tokens=7,
            )
            for i in range(3)  # 3 requests through 2 slots: slot reuse
        ]
        res = eng.run()
        outs[name] = [res[r] for r in rids]
    assert outs["spec"] == outs["plain"]


def test_spec_engine_accepts_on_cyclic_output(setup):
    """Tiny models greedily loop; once the generated history holds a full
    period the drafts verify and a dispatch emits >1 token — so decode
    dispatches must undercut the token count."""
    cfg, params, px = setup
    spec = ServingEngine(
        cfg, params, max_batch=1, max_len=768, attn_impl="xla",
        speculative=8,
    )
    rid = spec.add_request(
        _prompt(0), images=px, segs=px, depths=px, max_new_tokens=48
    )
    dispatches = 0
    events = []
    while spec.has_work():
        before = len(events)
        events.extend(spec.step())
        if len(events) > before or any(spec.active):
            dispatches += 1
    n_tokens = len([e for e in events])
    assert n_tokens >= 8
    if n_tokens >= 32:  # only meaningful when the row ran long enough
        assert dispatches < n_tokens, (
            f"{dispatches} dispatches for {n_tokens} tokens - no benefit"
        )


def test_spec_engine_mixed_temperature(setup):
    """Sampling rows ride the same verify dispatch but emit exactly one
    token; the run completes and greedy rows still match the plain
    engine."""
    cfg, params, px = setup
    plain = ServingEngine(
        cfg, params, max_batch=2, max_len=768, attn_impl="xla", seed=7
    )
    spec = ServingEngine(
        cfg, params, max_batch=2, max_len=768, attn_impl="xla", seed=7,
        speculative=4,
    )
    outs = {}
    for name, eng in (("plain", plain), ("spec", spec)):
        greedy = eng.add_request(
            _prompt(0), images=px, segs=px, depths=px, max_new_tokens=6,
            temperature=0.0,
        )
        sampled = eng.add_request(
            _prompt(1), images=px, segs=px, depths=px, max_new_tokens=6,
            temperature=0.8,
        )
        res = eng.run()
        outs[name] = (res[greedy], len(res[sampled]))
    # Greedy row must match exactly; the sampling row generates the same
    # count (rng streams differ between engines' dispatch shapes, so
    # token values may differ).
    assert outs["spec"][0] == outs["plain"][0]
    assert outs["spec"][1] >= 1


@pytest.mark.slow
def test_spec_engine_multichip_matches_single(setup):
    """Speculative engine under the 8-device mesh: the multi-token verify
    partitions via GSPMD exactly like the plain decode, so sharded spec
    serving must match single-device spec serving token-for-token."""
    from vcoder_tpu.parallel.mesh import make_mesh
    from vcoder_tpu.parallel.sharding import shard_params

    cfg, params, px = setup
    mesh = make_mesh(jax.devices()[:8], data=2, fsdp=2, model=2)

    single = ServingEngine(
        cfg, params, max_batch=4, max_len=768, attn_impl="xla",
        speculative=4,
    )
    multi = ServingEngine(
        cfg, shard_params(params, mesh), max_batch=4, max_len=768,
        attn_impl="xla", mesh=mesh, speculative=4,
    )
    outs = {}
    for name, eng in (("single", single), ("multi", multi)):
        rids = [
            eng.add_request(
                _prompt(i), images=px, segs=px, depths=px,
                max_new_tokens=5,
            )
            for i in range(5)
        ]
        res = eng.run()
        outs[name] = [res[r] for r in rids]
    assert outs["multi"] == outs["single"]


def test_sync_every_matches_per_step(setup):
    """Windowed host sync (sync_every=4) must produce identical tokens
    per request as per-step sync — fetch batching only changes when the
    host learns about tokens, never the tokens."""
    cfg, params, px = setup
    ref = ServingEngine(
        cfg, params, max_batch=2, max_len=768, attn_impl="xla"
    )
    win = ServingEngine(
        cfg, params, max_batch=2, max_len=768, attn_impl="xla",
        sync_every=4,
    )
    outs = {}
    for name, eng in (("ref", ref), ("win", win)):
        rids = [
            eng.add_request(
                _prompt(i), images=px, segs=px, depths=px,
                max_new_tokens=7,
            )
            for i in range(4)  # 4 requests through 2 slots: reuse under
        ]                      # windowed sync exercises the drain guard
        res = eng.run()
        outs[name] = [res[r] for r in rids]
    assert outs["win"] == outs["ref"]


def test_spec_fused_matches_plain(setup):
    """Fused speculative windows (speculative=k + sync_every=N: N
    draft+verify steps per dispatch with device-resident histories) must
    emit token-for-token what the plain engine does."""
    cfg, params, px = setup
    plain = ServingEngine(
        cfg, params, max_batch=2, max_len=768, attn_impl="xla"
    )
    fused = ServingEngine(
        cfg, params, max_batch=2, max_len=768, attn_impl="xla",
        speculative=5, sync_every=3,
    )
    assert fused._spec_fused
    outs = {}
    for name, eng in (("plain", plain), ("fused", fused)):
        rids = [
            eng.add_request(
                _prompt(i), images=px, segs=px, depths=px,
                max_new_tokens=9,
            )
            for i in range(4)  # slot reuse under fused windows
        ]
        res = eng.run()
        outs[name] = [res[r] for r in rids]
    assert outs["fused"] == outs["plain"]


def test_sync_every_window_strategies(setup):
    """Windowed engines pin bf16 stacked projections to the serving
    layout (so the fori window compiles without weight relayout copies);
    int8 params are left alone. Both dtypes must match per-step sync
    token-for-token, and the relayout must not change bf16 decode."""
    from vcoder_tpu.quant import quantize_params

    cfg, params, px = setup
    qparams = quantize_params(params, bits=8, destroy=False)

    ref = ServingEngine(
        cfg, qparams, max_batch=2, max_len=768, attn_impl="xla"
    )
    win = ServingEngine(
        cfg, qparams, max_batch=2, max_len=768, attn_impl="xla",
        sync_every=4,
    )
    assert not win._serving_layout  # int8: nothing to relayout

    # bf16: per-step reference FIRST (params not yet re-laid), then the
    # windowed engine, whose init relayouts the shared params in place —
    # token parity across the relayout is part of the contract.
    fl_ref = ServingEngine(
        cfg, params, max_batch=2, max_len=768, attn_impl="xla"
    )
    fl_ref_out = _run_three(fl_ref, px)
    fl = ServingEngine(
        cfg, params, max_batch=2, max_len=768, attn_impl="xla",
        sync_every=4,
    )
    assert fl._serving_layout  # float: serving layout applied
    assert _run_three(fl, px) == fl_ref_out

    outs = {}
    for name, eng in (("ref", ref), ("win", win)):
        outs[name] = _run_three(eng, px)
    assert outs["win"] == outs["ref"]


def _run_three(eng, px):
    rids = [
        eng.add_request(
            _prompt(i), images=px, segs=px, depths=px, max_new_tokens=7
        )
        for i in range(3)
    ]
    res = eng.run()
    return [res[r] for r in rids]


def test_engine_top_p_near_zero_is_greedy(setup):
    """top_p -> 0 keeps only the argmax token, so a sampling request with
    a tiny top_p must emit exactly the greedy tokens — proving the
    per-request top_p vector reaches the decode dispatch."""
    cfg, params, px = setup
    greedy_eng = ServingEngine(
        cfg, params, max_batch=2, max_len=768, attn_impl="xla"
    )
    topp_eng = ServingEngine(
        cfg, params, max_batch=2, max_len=768, attn_impl="xla", seed=11
    )
    g = greedy_eng.add_request(
        _prompt(0), images=px, segs=px, depths=px, max_new_tokens=6,
        temperature=0.0,
    )
    t = topp_eng.add_request(
        _prompt(0), images=px, segs=px, depths=px, max_new_tokens=6,
        temperature=0.9, top_p=1e-9,
    )
    assert topp_eng._nucleus() or not topp_eng.active.any()
    assert topp_eng.run()[t] == greedy_eng.run()[g]


def test_engine_top_p_mixed_rows(setup):
    """A tiny-top_p sampling row next to an unrestricted sampling row:
    only the restricted row must reduce to greedy."""
    cfg, params, px = setup
    greedy_eng = ServingEngine(
        cfg, params, max_batch=2, max_len=768, attn_impl="xla"
    )
    mix_eng = ServingEngine(
        cfg, params, max_batch=2, max_len=768, attn_impl="xla", seed=5
    )
    g = greedy_eng.add_request(
        _prompt(0), images=px, segs=px, depths=px, max_new_tokens=5,
    )
    a = mix_eng.add_request(
        _prompt(0), images=px, segs=px, depths=px, max_new_tokens=5,
        temperature=1.3, top_p=1e-9,
    )
    b = mix_eng.add_request(
        _prompt(1), images=px, segs=px, depths=px, max_new_tokens=5,
        temperature=1.3, top_p=1.0,
    )
    ref = greedy_eng.run()[g]
    res = mix_eng.run()
    assert res[a] == ref
    assert len(res[b]) >= 1


def test_spec_engine_top_p(setup):
    """Sampling rows inside a speculative verify dispatch honor top_p."""
    cfg, params, px = setup
    greedy_eng = ServingEngine(
        cfg, params, max_batch=2, max_len=768, attn_impl="xla"
    )
    spec_eng = ServingEngine(
        cfg, params, max_batch=2, max_len=768, attn_impl="xla",
        speculative=4, seed=2,
    )
    g = greedy_eng.add_request(
        _prompt(0), images=px, segs=px, depths=px, max_new_tokens=6,
    )
    s = spec_eng.add_request(
        _prompt(0), images=px, segs=px, depths=px, max_new_tokens=6,
        temperature=0.8, top_p=1e-9,
    )
    assert spec_eng.run()[s] == greedy_eng.run()[g]


def test_spec_fused_mixed_temperature(setup):
    cfg, params, px = setup
    eng = ServingEngine(
        cfg, params, max_batch=2, max_len=768, attn_impl="xla",
        speculative=4, sync_every=2, seed=3,
    )
    g = eng.add_request(
        _prompt(0), images=px, segs=px, depths=px, max_new_tokens=6,
        temperature=0.0,
    )
    s = eng.add_request(
        _prompt(1), images=px, segs=px, depths=px, max_new_tokens=6,
        temperature=0.9,
    )
    res = eng.run()
    assert len(res[g]) >= 1 and len(res[s]) >= 1
