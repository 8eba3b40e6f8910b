"""Numerical parity of the JAX Llama decoder vs HF transformers (torch CPU).

Builds a tiny random HF LlamaForCausalLM, imports its weights through the
checkpoint importer, and compares logits for full-sequence forward and
incremental (KV-cached) decode. This is the correctness gate for RoPE /
RMSNorm / SwiGLU / attention numerics (SURVEY.md §7.2 step 1).
"""

import numpy as np
import pytest

from vcoder_tpu.config import TextConfig

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def tiny_pair():
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = TextConfig(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        num_layers=2,
        num_heads=4,
        num_kv_heads=2,
        max_position_embeddings=128,
    )
    hf_cfg = LlamaConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        num_key_value_heads=cfg.num_kv_heads,
        max_position_embeddings=cfg.max_position_embeddings,
        rms_norm_eps=cfg.rms_norm_eps,
        rope_theta=cfg.rope_theta,
        attn_implementation="eager",
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    hf = LlamaForCausalLM(hf_cfg).eval()

    state = {k: v.numpy() for k, v in hf.state_dict().items()}
    from vcoder_tpu.checkpoint import import_llama

    params = {
        **{"lm": import_llama(state, cfg)},
    }
    return hf, params["lm"], cfg


def test_forward_logits_match(tiny_pair):
    hf, params, cfg = tiny_pair
    import jax.numpy as jnp

    from vcoder_tpu.models.llama import embed_tokens, llama_forward, lm_head

    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=(2, 9))

    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.numpy()

    embeds = embed_tokens(params, jnp.asarray(ids))
    B, T = ids.shape
    hidden, _ = llama_forward(
        params,
        cfg,
        embeds,
        attn_mask=jnp.ones((B, T), bool),
        position_ids=jnp.broadcast_to(jnp.arange(T), (B, T)),
        attn_impl="xla",
    )
    got = np.asarray(lm_head(params, hidden))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-3)


def test_cached_decode_matches_full_forward(tiny_pair):
    hf, params, cfg = tiny_pair
    import jax.numpy as jnp

    from vcoder_tpu.models.llama import (
        KVCache,
        embed_tokens,
        llama_forward,
        lm_head,
    )

    rng = np.random.default_rng(1)
    B, T_prefill, n_steps, S_max = 2, 7, 4, 32
    ids = rng.integers(0, cfg.vocab_size, size=(B, T_prefill + n_steps))
    full_ids = jnp.asarray(ids)

    # Full forward (no cache) as oracle.
    T = ids.shape[1]
    hidden_full, _ = llama_forward(
        params,
        cfg,
        embed_tokens(params, full_ids),
        attn_mask=jnp.ones((B, T), bool),
        position_ids=jnp.broadcast_to(jnp.arange(T), (B, T)),
        attn_impl="xla",
    )
    logits_full = np.asarray(lm_head(params, hidden_full))

    # Prefill + stepwise decode through the cache.
    cache = KVCache.create(cfg, B, S_max)
    hidden_p, cache = llama_forward(
        params,
        cfg,
        embed_tokens(params, full_ids[:, :T_prefill]),
        attn_mask=jnp.ones((B, T_prefill), bool),
        position_ids=jnp.broadcast_to(
            jnp.arange(T_prefill), (B, T_prefill)
        ),
        cache=cache,
        attn_impl="xla",
    )
    np.testing.assert_allclose(
        np.asarray(lm_head(params, hidden_p)),
        logits_full[:, :T_prefill],
        atol=1e-4,
        rtol=1e-3,
    )
    assert cache.length.tolist() == [T_prefill, T_prefill]

    for step in range(n_steps):
        pos = T_prefill + step
        tok = full_ids[:, pos : pos + 1]
        hidden_s, cache = llama_forward(
            params,
            cfg,
            embed_tokens(params, tok),
            attn_mask=jnp.ones((B, 1), bool),
            position_ids=jnp.full((B, 1), pos, jnp.int32),
            cache=cache,
            attn_impl="xla",
        )
        np.testing.assert_allclose(
            np.asarray(lm_head(params, hidden_s))[:, 0],
            logits_full[:, pos],
            atol=1e-4,
            rtol=1e-3,
            err_msg=f"decode step {step}",
        )
    assert cache.length.tolist() == [T, T]


def test_ragged_prefill_masking(tiny_pair):
    """Rows shorter than T must produce the same logits as unpadded rows."""
    hf, params, cfg = tiny_pair
    import jax.numpy as jnp

    from vcoder_tpu.models.llama import embed_tokens, llama_forward, lm_head

    rng = np.random.default_rng(2)
    short = rng.integers(0, cfg.vocab_size, size=(1, 5))

    def run(ids, mask):
        B, T = ids.shape
        hidden, _ = llama_forward(
            params,
            cfg,
            embed_tokens(params, jnp.asarray(ids)),
            attn_mask=jnp.asarray(mask),
            position_ids=jnp.broadcast_to(jnp.arange(T), (B, T)),
            attn_impl="xla",
        )
        return np.asarray(lm_head(params, hidden))

    unpadded = run(short, np.ones((1, 5), bool))
    padded_ids = np.concatenate([short, np.zeros((1, 3), np.int64)], axis=1)
    padded_mask = np.concatenate(
        [np.ones((1, 5), bool), np.zeros((1, 3), bool)], axis=1
    )
    padded = run(padded_ids, padded_mask)
    np.testing.assert_allclose(padded[:, :5], unpadded, atol=1e-5, rtol=1e-4)


def test_golden_vectors_anchor_llama():
    """Logits must match the COMMITTED HF activations (tests/golden/
    hf_golden.npz, recorded by record_golden.py) — parity anchored to real
    transformers numerics independent of the installed version."""
    import os

    import jax.numpy as jnp

    from vcoder_tpu.checkpoint import import_llama
    from vcoder_tpu.models.llama import embed_tokens, llama_forward, lm_head

    path = os.path.join(os.path.dirname(__file__), "golden", "hf_golden.npz")
    g = np.load(path, allow_pickle=False)
    state = {
        k[len("llama.state."):]: g[k]
        for k in g.files
        if k.startswith("llama.state.")
    }
    cfg = TextConfig(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        num_layers=2,
        num_heads=4,
        num_kv_heads=2,
        max_position_embeddings=128,
    )
    params = import_llama(state, cfg)
    ids = g["llama.input_ids"]
    B, T = ids.shape
    hidden, _ = llama_forward(
        params,
        cfg,
        embed_tokens(params, jnp.asarray(ids)),
        attn_mask=jnp.ones((B, T), bool),
        position_ids=jnp.broadcast_to(jnp.arange(T), (B, T)),
        attn_impl="xla",
    )
    got = np.asarray(lm_head(params, hidden))
    np.testing.assert_allclose(got, g["llama.logits"], atol=2e-4, rtol=2e-3)


def test_live_transformers_matches_golden_llama():
    """If the installed transformers drifts from the recorded activations,
    fail HERE (environment signal), not in the impl-parity tests."""
    import os

    from transformers import LlamaConfig, LlamaForCausalLM

    path = os.path.join(os.path.dirname(__file__), "golden", "hf_golden.npz")
    g = np.load(path, allow_pickle=False)
    hf_cfg = LlamaConfig(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        attn_implementation="eager",
        tie_word_embeddings=False,
    )
    hf = LlamaForCausalLM(hf_cfg).eval()
    hf.load_state_dict(
        {
            k[len("llama.state."):]: torch.tensor(g[k])
            for k in g.files
            if k.startswith("llama.state.")
        }
    )
    with torch.no_grad():
        live = hf(torch.tensor(g["llama.input_ids"])).logits.numpy()
    np.testing.assert_allclose(live, g["llama.logits"], atol=1e-5, rtol=1e-4)
