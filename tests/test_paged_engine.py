"""Paged-KV engine: kernel parity is covered on TPU; here the engine's
outputs must match the slot engine token-for-token (CPU, interpret-mode
paged kernel), pages must recycle, and ragged contexts must pack."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vcoder_tpu.config import VCoderConfig
from vcoder_tpu.constants import IMAGE_TOKEN_INDEX, SEG_TOKEN_INDEX
from vcoder_tpu.models import vcoder as model_mod
from vcoder_tpu.serve.engine import ServingEngine
from vcoder_tpu.serve.paged_engine import PagedServingEngine


@pytest.fixture(scope="module")
def setup():
    # MHA config (the production Vicuna layout); GQA paths are covered by
    # the dedicated tests below with the tiny default (4 q / 2 kv heads).
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


def _prompt(i):
    return [1, 10 + i, 11, IMAGE_TOKEN_INDEX, SEG_TOKEN_INDEX, 12, 13 + i]


def test_paged_matches_slot_engine(setup):
    cfg, params, px = setup
    slot = ServingEngine(
        cfg, params, max_batch=2, max_len=768, attn_impl="xla"
    )
    paged = PagedServingEngine(
        cfg, params, max_batch=2, max_len=768, page_size=64,
        attn_impl="xla",
    )
    outs = {}
    for name, eng in (("slot", slot), ("paged", paged)):
        rids = [
            eng.add_request(
                _prompt(i), images=px, segs=px, max_new_tokens=5
            )
            for i in range(3)
        ]
        res = eng.run()
        outs[name] = [res[r] for r in rids]
    assert outs["paged"] == outs["slot"]


def test_pages_recycle(setup):
    cfg, params, px = setup
    eng = PagedServingEngine(
        cfg, params, max_batch=1, max_len=768, page_size=64,
        total_pages=16, attn_impl="xla",
    )
    free0 = sum(len(f) for f in eng.free_pages)
    for i in range(3):
        eng.add_request(_prompt(i), images=px, segs=px, max_new_tokens=3)
    out = eng.run()
    assert len(out) == 3
    assert sum(len(f) for f in eng.free_pages) == free0  # all returned
    assert all(not p for p in eng.row_pages)


def test_ragged_contexts_pack(setup):
    """A text-only request and a multimodal one occupy very different page
    counts — the allocator hands out only what each needs."""
    cfg, params, px = setup
    eng = PagedServingEngine(
        cfg, params, max_batch=2, max_len=768, page_size=64,
        attn_impl="xla",
    )
    r_mm = eng.add_request(
        _prompt(0), images=px, segs=px, max_new_tokens=2
    )
    r_txt = eng.add_request([1, 5, 6, 7], max_new_tokens=2)
    eng._admit()
    pages_used = [len(p) for p in eng.row_pages]
    # multimodal prompt expands to ~1157 tokens? (tiny config: 2x4=8
    # patches) -> few pages; text-only: 1 page.
    assert pages_used[1] == 1
    assert pages_used[0] >= 1
    out = eng.run()
    assert set(out) == {r_mm, r_txt}


def test_pool_too_small_fails_only_that_request(setup):
    cfg, params, px = setup
    eng = PagedServingEngine(
        cfg, params, max_batch=1, max_len=768, page_size=64,
        total_pages=3, attn_impl="xla",  # 1 usable page
    )
    rid = eng.add_request(list(range(2, 80)), max_new_tokens=2)
    out = eng.run()
    assert out[rid] == []  # failed cleanly, engine alive


def test_pool_oversubscription_defers_admission(setup):
    """An undersized pool: the second request waits for the first to free
    its pages, then completes — no crash, all outputs delivered."""
    cfg, params, px = setup
    eng = PagedServingEngine(
        cfg, params, max_batch=2, max_len=256, page_size=64,
        total_pages=4, attn_impl="xla",  # 2 usable pages
    )
    r1 = eng.add_request([1, 5, 6, 7], max_new_tokens=3)   # 1 page
    r2 = eng.add_request(list(range(2, 70)), max_new_tokens=3)  # 2 pages
    out = eng.run()
    assert len(out[r1]) >= 1
    assert len(out[r2]) >= 1
    assert all(not p for p in eng.row_pages)


def test_paged_attention_gqa_matches_dense_oracle():
    """GQA (q heads grouped onto fewer KV heads) in the paged kernel must
    match a dense gather-then-softmax oracle."""
    from vcoder_tpu.ops.paged_attention import paged_attention

    B, H, KH, D, page, p_max = 2, 8, 2, 16, 8, 3
    group = H // KH
    n_pages = B * p_max + 1
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
    kp = jnp.asarray(
        rng.standard_normal((n_pages, KH, page, D)), jnp.float32
    )
    vp = jnp.asarray(
        rng.standard_normal((n_pages, KH, page, D)), jnp.float32
    )
    lengths = np.asarray([2 * page + 3, page - 1], np.int32)
    table = np.zeros((B, p_max), np.int32)
    for b in range(B):
        table[b, :] = 1 + b * p_max + np.arange(p_max)

    out = paged_attention(
        q, kp, vp, jnp.asarray(table), jnp.asarray(lengths), interpret=True
    )

    scale = D**-0.5
    for b in range(B):
        L = int(lengths[b])
        ks = np.concatenate(
            [np.asarray(kp)[table[b, j]] for j in range(p_max)], axis=1
        )[:, :L]  # [KH, L, D]
        vs = np.concatenate(
            [np.asarray(vp)[table[b, j]] for j in range(p_max)], axis=1
        )[:, :L]
        for h in range(H):
            kh = h // group
            s = np.asarray(q)[b, h] @ ks[kh].T * scale
            p = np.exp(s - s.max())
            p /= p.sum()
            expect = p @ vs[kh]
            np.testing.assert_allclose(
                np.asarray(out)[b, h], expect, atol=1e-5, rtol=1e-5
            )


def test_paged_engine_gqa_matches_slot_engine():
    """End-to-end: the paged engine with a GQA decoder (tiny default:
    4 q heads / 2 kv heads) matches the dense slot engine."""
    cfg = VCoderConfig.tiny("vcoder_llava")
    assert cfg.text.num_kv_heads < cfg.text.num_heads
    params = model_mod.init_vcoder_params(jax.random.PRNGKey(2), cfg)
    hw = cfg.vision.image_size
    px = np.asarray(
        jax.random.normal(jax.random.PRNGKey(3), (1, hw, hw, 3))
    )
    slot = ServingEngine(
        cfg, params, max_batch=2, max_len=768, attn_impl="xla"
    )
    paged = PagedServingEngine(
        cfg, params, max_batch=2, max_len=768, page_size=64,
        attn_impl="xla",
    )
    outs = {}
    for name, eng in (("slot", slot), ("paged", paged)):
        rids = [
            eng.add_request(
                _prompt(i), images=px, segs=px, max_new_tokens=4
            )
            for i in range(2)
        ]
        res = eng.run()
        outs[name] = [res[r] for r in rids]
    assert outs["paged"] == outs["slot"]


def test_carry_paged_attention_matches_blocked_kernel():
    """The carry-aliased manual-DMA kernel (stacked pools, in-place pass-
    through) must match the BlockSpec-pipelined per-layer kernel."""
    from vcoder_tpu.ops.paged_attention import (
        carry_paged_attention,
        paged_attention,
    )

    L, n_pages, KH, page, D, B, H = 3, 10, 4, 8, 16, 3, 8
    rng = np.random.default_rng(3)
    kp = jnp.asarray(
        rng.standard_normal((L, n_pages, KH, page, D)), jnp.float32
    )
    vp = jnp.asarray(
        rng.standard_normal((L, n_pages, KH, page, D)), jnp.float32
    )
    q = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
    lengths = jnp.asarray([2 * page + 3, 0, page - 1], jnp.int32)
    table = np.zeros((B, 3), np.int32)
    for b in range(B):
        table[b] = 1 + b * 3 + np.arange(3)
    table = jnp.asarray(table)

    for l in range(L):
        ref = paged_attention(
            q, kp[l], vp[l], table, lengths, interpret=True
        )
        got, kp2, vp2 = carry_paged_attention(
            q, kp, vp, table, lengths, jnp.int32(l), interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5
        )
        # pass-through pools unchanged
        np.testing.assert_array_equal(np.asarray(kp2), np.asarray(kp))


def test_append_token_layer_writes_only_the_token():
    from vcoder_tpu.ops.paged_attention import append_token_layer

    L, n_pages, KH, page, D, B = 2, 6, 4, 8, 16, 2
    rng = np.random.default_rng(4)
    pool = jnp.asarray(
        rng.standard_normal((L, n_pages, KH, page, D)), jnp.float32
    )
    tok = jnp.asarray(rng.standard_normal((B, KH, D)), jnp.float32)
    page_ids = jnp.asarray([1, 3], jnp.int32)
    offsets = jnp.asarray([2, 7], jnp.int32)
    active = jnp.asarray([True, False])

    out = append_token_layer(pool, jnp.int32(1), tok, page_ids, offsets, active)
    out = np.asarray(out)
    ref = np.asarray(pool).copy()
    ref[1, 1, :, 2, :] = np.asarray(tok)[0]  # active row 0
    ref[1, n_pages - 1, :, 7, :] = np.asarray(tok)[1]  # inactive -> scratch
    np.testing.assert_array_equal(out, ref)


# ---- multi-chip paged serving (8-device CPU mesh from conftest) ----------


def test_sharded_paged_attention_matches_single():
    """shard_map'd kernel (rows over data x fsdp, heads over model, global
    page ids rebased per shard) must equal the single-pool kernel."""
    from vcoder_tpu.ops.paged_attention import (
        paged_attention,
        sharded_paged_attention,
    )
    from vcoder_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(jax.devices()[:8], data=2, fsdp=2, model=2)
    row_shards = 4
    B, H, D, page, p_max = 4, 4, 16, 8, 3
    per = 4  # pages per shard (local 0 = sentinel by convention)
    n_pages = per * row_shards
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
    kp = jnp.asarray(
        rng.standard_normal((n_pages, H, page, D)), jnp.float32
    )
    vp = jnp.asarray(
        rng.standard_normal((n_pages, H, page, D)), jnp.float32
    )
    # Row r lives on shard r (rows_per_shard == 1): its table may only
    # reference pages in [r*per, (r+1)*per).
    lengths = jnp.asarray([page * 2, page + 3, 0, page * 3 - 1], jnp.int32)
    table = np.zeros((B, p_max), np.int32)
    for r in range(B):
        table[r, :] = r * per  # shard sentinel
        used = -(-int(lengths[r]) // page)
        table[r, :used] = r * per + 1 + np.arange(used)
    table = jnp.asarray(table)

    ref = paged_attention(q, kp, vp, table, lengths, interpret=True)
    got = sharded_paged_attention(
        q, kp, vp, table, lengths, mesh, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5
    )


@pytest.mark.slow
def test_paged_engine_multichip_matches_single(setup):
    """PagedServingEngine over the 8-device mesh (sharded params, per-shard
    page pools) decodes token-for-token identically to single-device."""
    from vcoder_tpu.parallel.mesh import make_mesh
    from vcoder_tpu.parallel.sharding import shard_params

    cfg, params, px = setup
    mesh = make_mesh(jax.devices()[:8], data=2, fsdp=2, model=2)

    single = PagedServingEngine(
        cfg, params, max_batch=4, max_len=768, page_size=64,
        attn_impl="xla",
    )
    multi = PagedServingEngine(
        cfg, shard_params(params, mesh), max_batch=4, max_len=768,
        page_size=64, attn_impl="xla", mesh=mesh,
    )
    assert multi.row_shards == 4 and len(multi.free_pages) == 4

    outs = {}
    for name, eng in (("single", single), ("multi", multi)):
        rids = [
            eng.add_request(
                _prompt(i), images=px, segs=px, max_new_tokens=5
            )
            for i in range(5)  # 5 requests through 4 slots: forces reuse
        ]
        res = eng.run()
        outs[name] = [res[r] for r in rids]
    assert outs["multi"] == outs["single"]
    # Pools fully recycled on every shard.
    assert all(
        len(f) == multi.pages_per_shard - 2 for f in multi.free_pages
    )


@pytest.mark.slow
def test_paged_engine_multichip_int4_matches_single(setup):
    """Packed-int4 weights under the mesh: the PACKED q leaf has a halved
    input dim, so the inherited sharding spec must still align (or drop
    the axis via _shrink_to_fit) — decoded tokens must match the
    single-device int4 engine exactly."""
    from vcoder_tpu.parallel.mesh import make_mesh
    from vcoder_tpu.parallel.sharding import shard_params
    from vcoder_tpu.quant import quantize_params

    cfg, params, px = setup
    q4 = quantize_params(params, bits=4, destroy=False)
    mesh = make_mesh(jax.devices()[:8], data=2, fsdp=2, model=2)

    single = PagedServingEngine(
        cfg, q4, max_batch=4, max_len=768, page_size=64, attn_impl="xla",
    )
    multi = PagedServingEngine(
        cfg, shard_params(q4, mesh), max_batch=4, max_len=768,
        page_size=64, attn_impl="xla", mesh=mesh,
    )
    outs = {}
    for name, eng in (("single", single), ("multi", multi)):
        rids = [
            eng.add_request(
                _prompt(i), images=px, segs=px, max_new_tokens=5
            )
            for i in range(4)
        ]
        res = eng.run()
        outs[name] = [res[r] for r in rids]
    assert outs["multi"] == outs["single"]


# ---- int8 page pools (kv_quant) ------------------------------------------


def test_carry_paged_attention_q8_matches_dequant_oracle():
    """int8 kernel (per-token-per-head scales, VMEM dequant) must match the
    f32 carry kernel run on the manually dequantized pools."""
    from vcoder_tpu.models.llama import _kv_quantize
    from vcoder_tpu.ops.paged_attention import (
        carry_paged_attention,
        carry_paged_attention_q8,
    )

    L, n_pages, KH, page, D, B, H = 3, 10, 4, 8, 16, 3, 8
    rng = np.random.default_rng(7)
    kp_f = jnp.asarray(
        rng.standard_normal((L, n_pages, KH, page, D)), jnp.float32
    )
    vp_f = jnp.asarray(
        rng.standard_normal((L, n_pages, KH, page, D)), jnp.float32
    )
    # Quantize per token vector: [.., page, D] -> int8 + [.., page] scales.
    kq, ks = _kv_quantize(kp_f)
    vq, vs = _kv_quantize(vp_f)
    ks, vs = ks[..., 0], vs[..., 0]
    deq_k = kq.astype(jnp.float32) * ks[..., None]
    deq_v = vq.astype(jnp.float32) * vs[..., None]

    q = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
    lengths = jnp.asarray([2 * page + 3, 0, page - 1], jnp.int32)
    table = np.zeros((B, 3), np.int32)
    for b in range(B):
        table[b] = 1 + b * 3 + np.arange(3)
    table = jnp.asarray(table)

    for l in range(L):
        ref, *_ = carry_paged_attention(
            q, deq_k, deq_v, table, lengths, jnp.int32(l), interpret=True
        )
        got, kp2, vp2, ks2, vs2 = carry_paged_attention_q8(
            q, kq, vq, ks, vs, table, lengths, jnp.int32(l), interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5
        )
        # pass-through pools unchanged
        np.testing.assert_array_equal(np.asarray(kp2), np.asarray(kq))
        np.testing.assert_array_equal(np.asarray(ks2), np.asarray(ks))


def test_append_scale_layer_writes_only_the_token():
    from vcoder_tpu.ops.paged_attention import append_scale_layer

    L, n_pages, KH, page, B = 2, 6, 4, 8, 2
    rng = np.random.default_rng(8)
    pool = jnp.asarray(
        rng.standard_normal((L, n_pages, KH, page)), jnp.float32
    )
    s = jnp.asarray(rng.standard_normal((B, KH, 1)), jnp.float32)
    page_ids = jnp.asarray([1, 3], jnp.int32)
    offsets = jnp.asarray([2, 7], jnp.int32)
    active = jnp.asarray([True, False])

    out = np.asarray(
        append_scale_layer(pool, jnp.int32(1), s, page_ids, offsets, active)
    )
    ref = np.asarray(pool).copy()
    ref[1, 1, :, 2] = np.asarray(s)[0, :, 0]
    ref[1, n_pages - 1, :, 7] = np.asarray(s)[1, :, 0]
    np.testing.assert_array_equal(out, ref)


def test_paged_engine_q8_matches_slot_kv_quant(setup):
    """kv_quant paged engine must decode token-for-token like the slot
    engine with its int8 KV cache — identical quantization scheme, so the
    only numeric difference is the online-softmax accumulation order."""
    cfg, params, px = setup
    slot = ServingEngine(
        cfg, params, max_batch=2, max_len=768, attn_impl="xla",
        kv_quant=True,
    )
    paged = PagedServingEngine(
        cfg, params, max_batch=2, max_len=768, page_size=64,
        attn_impl="xla", kv_quant=True,
    )
    assert paged.k_pages.dtype == jnp.int8
    outs = {}
    for name, eng in (("slot", slot), ("paged", paged)):
        rids = [
            eng.add_request(
                _prompt(i), images=px, segs=px, max_new_tokens=5
            )
            for i in range(3)
        ]
        res = eng.run()
        outs[name] = [res[r] for r in rids]
    assert outs["paged"] == outs["slot"]


@pytest.mark.slow
def test_paged_engine_q8_multichip_matches_single(setup):
    """kv_quant engine over the 8-device mesh (sharded int8 pools + scale
    pools) must match the single-device kv_quant engine."""
    from vcoder_tpu.parallel.mesh import make_mesh
    from vcoder_tpu.parallel.sharding import shard_params

    cfg, params, px = setup
    mesh = make_mesh(jax.devices()[:8], data=2, fsdp=2, model=2)

    single = PagedServingEngine(
        cfg, params, max_batch=4, max_len=768, page_size=64,
        attn_impl="xla", kv_quant=True,
    )
    multi = PagedServingEngine(
        cfg, shard_params(params, mesh), max_batch=4, max_len=768,
        page_size=64, attn_impl="xla", mesh=mesh, kv_quant=True,
    )
    outs = {}
    for name, eng in (("single", single), ("multi", multi)):
        rids = [
            eng.add_request(
                _prompt(i), images=px, segs=px, max_new_tokens=4
            )
            for i in range(4)
        ]
        res = eng.run()
        outs[name] = [res[r] for r in rids]
    assert outs["multi"] == outs["single"]


# ---- speculative paged serving -------------------------------------------


def _gather_dense_kv(pages, table, lengths, S):
    """Assemble contiguous [B, S, KH, D] KV from paged storage."""
    n_pages, KH, page, D = pages.shape
    B = table.shape[0]
    out = np.zeros((B, S, KH, D), np.float32)
    pg = np.asarray(pages)
    for b in range(B):
        for t in range(int(lengths[b])):
            pid = int(table[b, t // page])
            out[b, t] = pg[pid, :, t % page]
    return out


def test_carry_multi_matches_xla_oracle():
    """Multi-query verify kernel vs dense attention on the gathered
    pages: window token t at position length-k+t attends causally."""
    from vcoder_tpu.ops.attention import xla_attention
    from vcoder_tpu.ops.paged_attention import carry_paged_attention_multi

    L, n_pages, KH, page, D, B, H, k = 2, 12, 4, 8, 16, 3, 8, 4
    rng = np.random.default_rng(11)
    kp = jnp.asarray(
        rng.standard_normal((L, n_pages, KH, page, D)), jnp.float32
    )
    vp = jnp.asarray(
        rng.standard_normal((L, n_pages, KH, page, D)), jnp.float32
    )
    q = jnp.asarray(rng.standard_normal((B, k, H, D)), jnp.float32)
    # lengths INCLUDE the k window tokens (already appended).
    lengths = np.asarray([2 * page + 3, k, 3 * page], np.int32)
    table = np.zeros((B, 4), np.int32)
    for b in range(B):
        table[b] = 1 + b * 3 + np.arange(4) % 3  # enough live entries
        used = -(-int(lengths[b]) // page)
        table[b, :used] = 1 + b * 3 + np.arange(used)
    S = int(lengths.max())

    for l in range(L):
        got, kp2, _ = carry_paged_attention_multi(
            q, kp, vp, jnp.asarray(table), jnp.asarray(lengths),
            jnp.int32(l), window=k, interpret=True,
        )
        kd = _gather_dense_kv(kp[l], table, lengths, S)
        vd = _gather_dense_kv(vp[l], table, lengths, S)
        q_pos = (lengths[:, None] - k) + np.arange(k)[None, :]
        ref = xla_attention(
            q,
            jnp.asarray(kd),
            jnp.asarray(vd),
            causal=True,
            q_positions=jnp.asarray(q_pos),
            kv_mask=jnp.asarray(
                np.arange(S)[None, :] < lengths[:, None]
            ),
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5
        )
        np.testing.assert_array_equal(np.asarray(kp2), np.asarray(kp))


def test_carry_multi_q8_matches_dequant(setup):
    from vcoder_tpu.models.llama import _kv_quantize
    from vcoder_tpu.ops.paged_attention import (
        carry_paged_attention_multi,
        carry_paged_attention_multi_q8,
    )

    L, n_pages, KH, page, D, B, H, k = 2, 10, 4, 8, 16, 2, 8, 4
    rng = np.random.default_rng(12)
    kp_f = jnp.asarray(
        rng.standard_normal((L, n_pages, KH, page, D)), jnp.float32
    )
    vp_f = jnp.asarray(
        rng.standard_normal((L, n_pages, KH, page, D)), jnp.float32
    )
    kq, ks = _kv_quantize(kp_f)
    vq, vs = _kv_quantize(vp_f)
    ks, vs = ks[..., 0], vs[..., 0]
    deq_k = kq.astype(jnp.float32) * ks[..., None]
    deq_v = vq.astype(jnp.float32) * vs[..., None]
    q = jnp.asarray(rng.standard_normal((B, k, H, D)), jnp.float32)
    lengths = jnp.asarray([2 * page + 3, page + k], jnp.int32)
    table = np.zeros((B, 4), np.int32)
    for b in range(B):
        table[b] = 1 + b * 4 + np.arange(4)
    table = jnp.asarray(table)

    ref, *_ = carry_paged_attention_multi(
        q, deq_k, deq_v, table, lengths, jnp.int32(1), window=k,
        interpret=True,
    )
    got, *_ = carry_paged_attention_multi_q8(
        q, kq, vq, ks, vs, table, lengths, jnp.int32(1), window=k,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5
    )


def test_append_tokens_layer_straddles_pages():
    from vcoder_tpu.ops.paged_attention import append_tokens_layer

    L, n_pages, KH, page, D, B, k = 2, 6, 4, 8, 16, 2, 4
    rng = np.random.default_rng(13)
    pool = jnp.asarray(
        rng.standard_normal((L, n_pages, KH, page, D)), jnp.float32
    )
    toks = jnp.asarray(rng.standard_normal((B, k, KH, D)), jnp.float32)
    # Row 0 straddles the page-1 -> page-2 boundary (positions 6..9).
    positions = jnp.asarray([[6, 7, 8, 9], [0, 1, 2, 3]], jnp.int32)
    table = jnp.asarray([[1, 2, 0], [3, 0, 0]], jnp.int32)
    active = jnp.asarray([True, False])

    out = np.asarray(
        append_tokens_layer(pool, jnp.int32(0), toks, positions, table,
                            active)
    )
    ref = np.asarray(pool).copy()
    t = np.asarray(toks)
    ref[0, 1, :, 6] = t[0, 0]
    ref[0, 1, :, 7] = t[0, 1]
    ref[0, 2, :, 0] = t[0, 2]
    ref[0, 2, :, 1] = t[0, 3]
    # Inactive row 1 -> scratch page (last), positions 0..3.
    for j in range(4):
        ref[0, n_pages - 1, :, j] = t[1, j]
    np.testing.assert_array_equal(out, ref)


@pytest.mark.parametrize("quant", [False, True])
def test_paged_spec_engine_matches_plain(setup, quant):
    """speculative=k paged engine must match the plain paged engine
    token-for-token for greedy requests (both kv_quant settings)."""
    cfg, params, px = setup
    plain = PagedServingEngine(
        cfg, params, max_batch=2, max_len=768, page_size=64,
        attn_impl="xla", kv_quant=quant,
    )
    spec = PagedServingEngine(
        cfg, params, max_batch=2, max_len=768, page_size=64,
        attn_impl="xla", kv_quant=quant, speculative=5,
    )
    outs = {}
    for name, eng in (("plain", plain), ("spec", spec)):
        rids = [
            eng.add_request(
                _prompt(i), images=px, segs=px, max_new_tokens=7
            )
            for i in range(3)
        ]
        res = eng.run()
        outs[name] = [res[r] for r in rids]
    assert outs["spec"] == outs["plain"]
    # Pages fully recycled.
    assert all(not p for p in spec.row_pages)


@pytest.mark.slow
def test_paged_spec_engine_multichip_matches_single(setup):
    from vcoder_tpu.parallel.mesh import make_mesh
    from vcoder_tpu.parallel.sharding import shard_params

    cfg, params, px = setup
    mesh = make_mesh(jax.devices()[:8], data=2, fsdp=2, model=2)
    single = PagedServingEngine(
        cfg, params, max_batch=4, max_len=768, page_size=64,
        attn_impl="xla", speculative=4,
    )
    multi = PagedServingEngine(
        cfg, shard_params(params, mesh), max_batch=4, max_len=768,
        page_size=64, attn_impl="xla", mesh=mesh, speculative=4,
    )
    outs = {}
    for name, eng in (("single", single), ("multi", multi)):
        rids = [
            eng.add_request(
                _prompt(i), images=px, segs=px, max_new_tokens=4
            )
            for i in range(4)
        ]
        res = eng.run()
        outs[name] = [res[r] for r in rids]
    assert outs["multi"] == outs["single"]


def test_paged_sync_every_matches_per_step(setup):
    """Windowed host sync on the paged engine: identical tokens, pages
    fully recycled despite finished rows decoding garbage steps until
    the next drain."""
    cfg, params, px = setup
    ref = PagedServingEngine(
        cfg, params, max_batch=2, max_len=768, page_size=64,
        attn_impl="xla",
    )
    win = PagedServingEngine(
        cfg, params, max_batch=2, max_len=768, page_size=64,
        attn_impl="xla", sync_every=4,
    )
    outs = {}
    for name, eng in (("ref", ref), ("win", win)):
        rids = [
            eng.add_request(
                _prompt(i), images=px, segs=px, max_new_tokens=7
            )
            for i in range(4)
        ]
        res = eng.run()
        outs[name] = [res[r] for r in rids]
    assert outs["win"] == outs["ref"]
    assert all(not p for p in win.row_pages)


def test_paged_engine_top_p_near_zero_is_greedy(setup):
    """Per-request top_p reaches the paged decode dispatch: a sampling
    request with top_p -> 0 must emit exactly the greedy tokens."""
    cfg, params, px = setup
    greedy = PagedServingEngine(
        cfg, params, max_batch=2, max_len=768, page_size=64,
        attn_impl="xla",
    )
    topp = PagedServingEngine(
        cfg, params, max_batch=2, max_len=768, page_size=64,
        attn_impl="xla", seed=9,
    )
    g = greedy.add_request(
        _prompt(0), images=px, segs=px, max_new_tokens=5, temperature=0.0
    )
    t = topp.add_request(
        _prompt(0), images=px, segs=px, max_new_tokens=5,
        temperature=1.1, top_p=1e-9,
    )
    assert topp.run()[t] == greedy.run()[g]


def test_paged_spec_engine_top_p(setup):
    """top_p in the paged speculative verify dispatch."""
    cfg, params, px = setup
    greedy = PagedServingEngine(
        cfg, params, max_batch=2, max_len=768, page_size=64,
        attn_impl="xla",
    )
    spec = PagedServingEngine(
        cfg, params, max_batch=2, max_len=768, page_size=64,
        attn_impl="xla", speculative=4, seed=3,
    )
    g = greedy.add_request(
        _prompt(0), images=px, segs=px, max_new_tokens=5, temperature=0.0
    )
    s = spec.add_request(
        _prompt(0), images=px, segs=px, max_new_tokens=5,
        temperature=0.9, top_p=1e-9,
    )
    assert spec.run()[s] == greedy.run()[g]


def test_engine_close_frees_buffers(setup):
    """close() deletes the page pools / decode carries deterministically
    (dangling StreamReaders otherwise keep multi-GB pools alive on a
    single 16 GB chip) and is idempotent; params are untouched."""
    cfg, params, px = setup
    eng = PagedServingEngine(
        cfg, params, max_batch=2, max_len=768, page_size=64,
        attn_impl="xla",
    )
    r = eng.add_request(_prompt(0), images=px, segs=px, max_new_tokens=3)
    out = eng.run()[r]
    assert len(out) > 0
    pool = eng.k_pages
    eng.close()
    assert eng.k_pages is None and eng.v_pages is None
    assert eng.tokens is None and eng._closed
    assert pool.is_deleted()
    eng.close()  # idempotent
    # Shared params survive for the next engine.
    leaf = jax.tree_util.tree_leaves(params)[0]
    assert not leaf.is_deleted()

    slot = ServingEngine(
        cfg, params, max_batch=2, max_len=768, attn_impl="xla"
    )
    r2 = slot.add_request(_prompt(1), images=px, segs=px, max_new_tokens=3)
    assert len(slot.run()[r2]) > 0
    cache_leaf = jax.tree_util.tree_leaves(slot.cache)[0]
    slot.close()
    assert slot.cache is None and cache_leaf.is_deleted()
    slot.close()


# ---------------------------------------------------------------------------
# Fused append+attend kernels (ops/paged_attention.py FUSED_APPEND path)
# ---------------------------------------------------------------------------


def _fused_case(quantized, window, active_mask):
    """Fused kernel vs XLA-scatter append + non-fused attend: pools must
    match EXACTLY (same bytes land in the same slots) and active rows'
    outputs must match the oracle numerically. GQA (H=8, KH=4), window
    straddling a page boundary on row 0."""
    from vcoder_tpu.models.llama import _kv_quantize
    from vcoder_tpu.ops.paged_attention import (
        append_token_scales_layer,
        append_tokens_layer,
        carry_paged_attention_fused,
        carry_paged_attention_multi,
        carry_paged_attention_multi_q8,
    )

    L, n_pages, KH, page, D, B, H = 2, 12, 4, 8, 16, 3, 8
    k = window
    rng = np.random.default_rng(21 + window + 10 * quantized)
    kp_f = jnp.asarray(
        rng.standard_normal((L, n_pages, KH, page, D)), jnp.float32
    )
    vp_f = jnp.asarray(
        rng.standard_normal((L, n_pages, KH, page, D)), jnp.float32
    )
    # lengths BEFORE the window; row 0 straddles its page boundary.
    lengths0 = jnp.asarray([page - 1, 2 * page + 3, 5], jnp.int32)
    active = jnp.asarray(active_mask, bool)
    positions = lengths0  # window token 0 lands at the row's tail
    table = np.zeros((B, 4), np.int32)
    for b in range(B):
        table[b] = 1 + b * 3 + np.arange(4) % 3  # last entry wraps; unused
        table[b] = 1 + b * 3 + np.minimum(np.arange(4), 2)
    table = jnp.asarray(table)
    q = jnp.asarray(rng.standard_normal((B, k, H, D)), jnp.float32)
    new_k = jnp.asarray(rng.standard_normal((B, k, KH, D)), jnp.float32)
    new_v = jnp.asarray(rng.standard_normal((B, k, KH, D)), jnp.float32)
    attn_lengths = lengths0 + k * active.astype(jnp.int32)
    pos2d = positions[:, None] + jnp.arange(k, dtype=jnp.int32)[None]
    l = jnp.int32(1)

    if quantized:
        kq_pool, ks_pool = _kv_quantize(kp_f)
        vq_pool, vs_pool = _kv_quantize(vp_f)
        ks_pool, vs_pool = ks_pool[..., 0], vs_pool[..., 0]
        nkq, nks = _kv_quantize(new_k)
        nvq, nvs = _kv_quantize(new_v)
        nks, nvs = nks[..., 0], nvs[..., 0]
        # Oracle: XLA appends then the non-fused q8 kernel.
        kp_ref = append_tokens_layer(kq_pool, l, nkq, pos2d, table, active)
        vp_ref = append_tokens_layer(vq_pool, l, nvq, pos2d, table, active)
        ks_ref = append_token_scales_layer(ks_pool, l, nks, pos2d, table, active)
        vs_ref = append_token_scales_layer(vs_pool, l, nvs, pos2d, table, active)
        out_ref, *_ = carry_paged_attention_multi_q8(
            q, kp_ref, vp_ref, ks_ref, vs_ref, table, attn_lengths, l,
            window=k, interpret=True,
        )
        out, kp2, vp2, ks2, vs2 = carry_paged_attention_fused(
            q, nkq, nvq, kq_pool, vq_pool, table, attn_lengths, positions,
            active, l, window=k, interpret=True,
            k_scale=ks_pool, v_scale=vs_pool, new_ks=nks, new_vs=nvs,
        )
        np.testing.assert_array_equal(np.asarray(kp2), np.asarray(kp_ref))
        np.testing.assert_array_equal(np.asarray(vp2), np.asarray(vp_ref))
        np.testing.assert_array_equal(np.asarray(ks2), np.asarray(ks_ref))
        np.testing.assert_array_equal(np.asarray(vs2), np.asarray(vs_ref))
    else:
        kp_ref = append_tokens_layer(kp_f, l, new_k, pos2d, table, active)
        vp_ref = append_tokens_layer(vp_f, l, new_v, pos2d, table, active)
        out_ref, *_ = carry_paged_attention_multi(
            q, kp_ref, vp_ref, table, attn_lengths, l, window=k,
            interpret=True,
        )
        out, kp2, vp2 = carry_paged_attention_fused(
            q, new_k, new_v, kp_f, vp_f, table, attn_lengths, positions,
            active, l, window=k, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(kp2), np.asarray(kp_ref))
        np.testing.assert_array_equal(np.asarray(vp2), np.asarray(vp_ref))

    # Outputs compared on ACTIVE rows only: for finished rows the fused
    # kernel attends the true `lengths` tokens while the non-fused oracle
    # replays its window-mask arithmetic on a window that was never
    # appended — both are discarded by the engine.
    act = np.asarray(active)
    np.testing.assert_allclose(
        np.asarray(out)[act], np.asarray(out_ref)[act], atol=2e-5, rtol=2e-5
    )


@pytest.mark.parametrize("quantized", [False, True])
@pytest.mark.parametrize("window", [1, 4])
def test_fused_append_attend_matches_scatter_oracle(quantized, window):
    _fused_case(quantized, window, [True, True, True])


def test_fused_append_attend_inactive_rows_park_on_scratch():
    _fused_case(False, 1, [True, False, True])
    _fused_case(True, 4, [False, True, True])


@pytest.mark.parametrize("quantized", [False, True])
def test_sharded_fused_append_attend_matches_single(quantized):
    """sharded_carry_paged_attention_fused (global->local page-id
    rebasing, per-shard scratch parking, new_k/new_ks row/model specs)
    must equal the single-pool fused kernel on active rows — pools
    byte-exact on every table-referenced page. Row 3 rides inactive: its
    pages must come through untouched (its parked writes land on its
    SHARD's scratch page, not the global one — excluded from compare)."""
    from vcoder_tpu.models.llama import _kv_quantize
    from vcoder_tpu.ops.paged_attention import (
        carry_paged_attention_fused,
        sharded_carry_paged_attention_fused,
    )
    from vcoder_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(jax.devices()[:8], data=2, fsdp=2, model=2)
    row_shards = 4
    L, KH, page, D, B, H, k = 2, 4, 8, 16, 4, 8, 4
    per = 4  # pages per shard; local 0 = sentinel, local last = scratch
    n_pages = per * row_shards
    rng = np.random.default_rng(7 + quantized)
    kp_f = jnp.asarray(
        rng.standard_normal((L, n_pages, KH, page, D)), jnp.float32
    )
    vp_f = jnp.asarray(
        rng.standard_normal((L, n_pages, KH, page, D)), jnp.float32
    )
    lengths0 = jnp.asarray([page - 1, page + 3, 2, 5], jnp.int32)
    active = jnp.asarray([True, True, True, False], bool)
    positions = lengths0
    attn_lengths = lengths0 + k * active.astype(jnp.int32)
    # Row r lives on shard r; pages in [r*per+1, r*per+per-1) (scratch
    # excluded so the single/sharded parking difference stays isolated).
    table = np.zeros((B, 3), np.int32)
    for r in range(B):
        table[r, :] = r * per
        table[r, :2] = r * per + 1 + np.arange(2)
    table = jnp.asarray(table)
    q = jnp.asarray(rng.standard_normal((B, k, H, D)), jnp.float32)
    new_k = jnp.asarray(rng.standard_normal((B, k, KH, D)), jnp.float32)
    new_v = jnp.asarray(rng.standard_normal((B, k, KH, D)), jnp.float32)
    l = jnp.int32(1)

    if quantized:
        kq, ks = _kv_quantize(kp_f)
        vq, vs = _kv_quantize(vp_f)
        ks, vs = ks[..., 0], vs[..., 0]
        nkq, nks = _kv_quantize(new_k)
        nvq, nvs = _kv_quantize(new_v)
        nks, nvs = nks[..., 0], nvs[..., 0]
        ref = carry_paged_attention_fused(
            q, nkq, nvq, kq, vq, table, attn_lengths, positions, active,
            l, window=k, interpret=True,
            k_scale=ks, v_scale=vs, new_ks=nks, new_vs=nvs,
        )
        got = sharded_carry_paged_attention_fused(
            q, nkq, nvq, kq, vq, table, attn_lengths, positions, active,
            l, mesh, window=k, interpret=True,
            k_scale=ks, v_scale=vs, new_ks=nks, new_vs=nvs,
        )
    else:
        ref = carry_paged_attention_fused(
            q, new_k, new_v, kp_f, vp_f, table, attn_lengths, positions,
            active, l, window=k, interpret=True,
        )
        got = sharded_carry_paged_attention_fused(
            q, new_k, new_v, kp_f, vp_f, table, attn_lengths, positions,
            active, l, mesh, interpret=True, window=k,
        )
    act = np.asarray(active)
    np.testing.assert_allclose(
        np.asarray(got[0])[act], np.asarray(ref[0])[act],
        atol=2e-5, rtol=2e-5,
    )
    # Table-referenced pages byte-exact (incl. the INACTIVE row's pages:
    # both paths must leave them untouched).
    pages_used = sorted({int(p) for row in np.asarray(table) for p in row})
    for got_pool, ref_pool in zip(got[1:], ref[1:]):
        np.testing.assert_array_equal(
            np.asarray(got_pool)[:, pages_used],
            np.asarray(ref_pool)[:, pages_used],
        )


@pytest.mark.parametrize("quantized", [False, True])
def test_append_pages_matches_token_scatter(quantized):
    """append_pages_layer (page-granular chunk append) must produce a
    pool byte-identical to the token scatter on page-aligned windows —
    including an inactive row (scratch-page parking) and a final-chunk
    overhang mapping to sentinel table entries."""
    from vcoder_tpu.ops.paged_attention import (
        append_page_scales_layer,
        append_pages_layer,
        append_token_scales_layer,
        append_tokens_layer,
    )

    L, n_pages, KH, page, D = 2, 9, 4, 8, 16
    B, k = 3, 16  # 2 pages per window
    rng = np.random.default_rng(11 + quantized)
    dt = jnp.int8 if quantized else jnp.float32
    pool0 = jnp.asarray(
        rng.integers(-100, 100, (L, n_pages, KH, page, D)), dt
    )
    kv = jnp.asarray(rng.integers(-100, 100, (B, k, KH, D)), dt)
    # Row 0: start page-aligned mid-table; row 1: overhang (second page
    # of the window maps to a sentinel entry 0); row 2: inactive.
    table = jnp.asarray(
        [[1, 2, 0], [3, 0, 0], [4, 5, 0]], jnp.int32
    )
    starts = jnp.asarray([0, 8, 0], jnp.int32)
    positions = starts[:, None] + jnp.arange(k, dtype=jnp.int32)[None, :]
    active = jnp.asarray([True, True, False])
    for l in range(L):
        a = append_tokens_layer(pool0, l, kv, positions, table, active)
        b = append_pages_layer(pool0, l, kv, positions, table, active)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    if quantized:
        sc0 = jnp.asarray(
            rng.standard_normal((L, n_pages, KH, page)), jnp.float32
        )
        s = jnp.asarray(
            rng.standard_normal((B, k, KH, 1)), jnp.float32
        )
        a = append_token_scales_layer(sc0, 1, s, positions, table, active)
        b = append_page_scales_layer(sc0, 1, s, positions, table, active)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sharded_append_pages_matches_single():
    """sharded_append_pages_layer must equal the single-pool version on
    every table-referenced page (global->local rebasing; the inactive
    row's parked writes land on its shard's scratch, not the global
    one — excluded)."""
    from vcoder_tpu.ops.paged_attention import (
        append_pages_layer,
        sharded_append_pages_layer,
    )
    from vcoder_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(jax.devices()[:8], data=2, fsdp=2, model=2)
    row_shards = 4
    L, KH, page, D = 2, 4, 8, 16
    B, k = 4, 16
    per = 4
    n_pages = per * row_shards
    rng = np.random.default_rng(3)
    pool0 = jnp.asarray(
        rng.standard_normal((L, n_pages, KH, page, D)), jnp.float32
    )
    kv = jnp.asarray(rng.standard_normal((B, k, KH, D)), jnp.float32)
    table = np.zeros((B, 3), np.int32)
    for r in range(B):
        table[r, :] = r * per
        table[r, :2] = r * per + 1 + np.arange(2)
    table = jnp.asarray(table)
    starts = jnp.zeros((B,), jnp.int32)
    positions = starts[:, None] + jnp.arange(k, dtype=jnp.int32)[None, :]
    active = jnp.asarray([True, True, True, False])
    want = append_pages_layer(pool0, 1, kv, positions, table, active)
    with mesh:
        got = sharded_append_pages_layer(
            pool0, 1, kv, positions, table, active, mesh
        )
    ref_pages = sorted(
        {int(p) for r in range(3) for p in np.asarray(table)[r, :2]}
    )
    np.testing.assert_allclose(
        np.asarray(got)[:, ref_pages], np.asarray(want)[:, ref_pages],
        rtol=0, atol=0,
    )
