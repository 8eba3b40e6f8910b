"""int8 KV-cache quantization: numerics vs the bf16 cache, engine path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vcoder_tpu.config import VCoderConfig
from vcoder_tpu.constants import IMAGE_TOKEN_INDEX, SEG_TOKEN_INDEX
from vcoder_tpu.models import vcoder as model_mod
from vcoder_tpu.models.llama import KVCache, _kv_quantize
from vcoder_tpu.multimodal import build_splice_plan
from vcoder_tpu.serve.engine import ServingEngine


def test_kv_quantize_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 4, 32))
    q, s = _kv_quantize(x)
    assert q.dtype == jnp.int8 and s.shape == (2, 8, 4, 1)
    x_hat = q.astype(jnp.float32) * s
    rel = np.abs(np.asarray(x_hat - x)).max() / np.abs(np.asarray(x)).max()
    assert rel < 0.02


def _setup():
    cfg = VCoderConfig.tiny("vcoder_llava")
    params = model_mod.init_vcoder_params(jax.random.PRNGKey(0), cfg)
    ids = [[1, 5, IMAGE_TOKEN_INDEX, SEG_TOKEN_INDEX, 7, 8, 9]]
    plan = build_splice_plan(
        ids, num_patches=cfg.vision.num_patches, has_seg=True,
        pad_multiple=16,
    )
    arrays = model_mod.plan_to_arrays(plan)
    hw = cfg.vision.image_size
    px = jax.random.normal(jax.random.PRNGKey(1), (1, hw, hw, 3))
    return cfg, params, arrays, px, plan


def test_quantized_cache_prefill_decode_close_to_bf16():
    cfg, params, arrays, px, plan = _setup()
    T = plan.seq_len

    def run(quantized):
        cache = KVCache.create(
            cfg.text, 1, T + 8, dtype=jnp.float32, quantized=quantized
        )
        logits, cache = model_mod.prefill(
            params, cfg, arrays, px, px, cache=cache,
            use_vcoder_emb=True, attn_impl="xla",
        )
        toks = [int(jnp.argmax(logits))]
        tok = jnp.asarray([toks[0]], jnp.int32)
        for i in range(4):
            pos = jnp.asarray(plan.seq_lens) + i
            logits, cache = model_mod.decode_step(
                params, cfg, tok, pos, cache, attn_impl="xla"
            )
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
            toks.append(int(tok[0]))
        return toks, logits

    toks_f, logits_f = run(False)
    toks_q, logits_q = run(True)
    # int8 KV error is small; greedy tokens should match on a tiny model
    # with well-separated logits (compare logits closeness regardless).
    err = np.abs(np.asarray(logits_q - logits_f)).max()
    scale = np.abs(np.asarray(logits_f)).max()
    assert err / scale < 0.05, (err, scale)
    assert toks_q == toks_f


def test_engine_with_kv_quant_matches_bf16_engine():
    cfg, params, _, px, _ = _setup()
    ids = [1, 5, IMAGE_TOKEN_INDEX, SEG_TOKEN_INDEX, 7, 8, 9]

    outs = {}
    for kv_quant in (False, True):
        eng = ServingEngine(
            cfg, params, max_batch=2, max_len=768, attn_impl="xla",
            kv_quant=kv_quant,
        )
        rid = eng.add_request(
            ids, images=np.asarray(px), segs=np.asarray(px),
            max_new_tokens=5,
        )
        outs[kv_quant] = eng.run()[rid]
    assert outs[True] == outs[False]
    # cache really is int8
    eng = ServingEngine(
        cfg, params, max_batch=1, max_len=768, kv_quant=True,
        attn_impl="xla",
    )
    assert eng.cache.k.dtype == jnp.int8 and eng.cache.quantized
