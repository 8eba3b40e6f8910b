"""Beam search (``num_beams``) parity with HF transformers.

The reference exposes ``--num_beams`` straight through HF ``generate``
(reference: vcoder_llava/eval/model_seg_loader.py:127-149), i.e. HF's
BeamSearchScorer with do_sample=False, length_penalty=1.0,
early_stopping=False. ``generation._beam_generate_jit`` reimplements
those semantics as one fused JAX loop; this file pins it token-for-token
against live HF beam search on a weight-matched tiny Llama, then covers
the multimodal/ragged cases HF can't cross-check (right-padded batches).
"""

import dataclasses

import numpy as np
import pytest

from vcoder_tpu.config import TextConfig, VCoderConfig

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def tiny_pair():
    from transformers import LlamaConfig, LlamaForCausalLM

    txt = TextConfig(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        num_layers=2,
        num_heads=4,
        num_kv_heads=2,
        max_position_embeddings=128,
    )
    hf_cfg = LlamaConfig(
        vocab_size=txt.vocab_size,
        hidden_size=txt.hidden_size,
        intermediate_size=txt.intermediate_size,
        num_hidden_layers=txt.num_layers,
        num_attention_heads=txt.num_heads,
        num_key_value_heads=txt.num_kv_heads,
        max_position_embeddings=txt.max_position_embeddings,
        rms_norm_eps=txt.rms_norm_eps,
        rope_theta=txt.rope_theta,
        attn_implementation="eager",
        tie_word_embeddings=False,
    )
    torch.manual_seed(3)
    hf = LlamaForCausalLM(hf_cfg).eval()

    from vcoder_tpu.checkpoint import import_llama

    state = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = {"lm": import_llama(state, txt)}
    cfg = VCoderConfig(model_type="llava", text=txt)
    return hf, params, cfg


def _hf_beams(hf, ids, max_new, num_beams, eos_id, length_penalty=1.0):
    """HF beam search; generated region padded to max_new with eos."""
    with torch.no_grad():
        out = hf.generate(
            torch.tensor(ids),
            attention_mask=torch.ones(ids.shape, dtype=torch.long),
            max_new_tokens=max_new,
            num_beams=num_beams,
            do_sample=False,
            eos_token_id=eos_id,
            pad_token_id=eos_id,
            length_penalty=length_penalty,
            early_stopping=False,
        )
    gen = out[:, ids.shape[1]:].numpy()
    if gen.shape[1] < max_new:
        pad = np.full(
            (gen.shape[0], max_new - gen.shape[1]), eos_id, gen.dtype
        )
        gen = np.concatenate([gen, pad], axis=1)
    return gen.astype(np.int32)


def _our_beams(
    params, cfg, ids, max_new, num_beams, length_penalty=1.0,
    temperature=0.0, top_p=1.0, seed=0,
):
    from vcoder_tpu.generation import generate

    res = generate(
        params,
        cfg,
        [list(r) for r in ids],
        max_new_tokens=max_new,
        num_beams=num_beams,
        length_penalty=length_penalty,
        temperature=temperature,
        top_p=top_p,
        seed=seed,
        attn_impl="xla",
    )
    return res.sequences.astype(np.int32)


def test_beams_match_hf(tiny_pair):
    hf, params, cfg = tiny_pair
    rng = np.random.default_rng(7)
    ids = rng.integers(3, cfg.text.vocab_size, size=(2, 7))
    got = _our_beams(params, cfg, ids, 10, 3)
    ref = _hf_beams(hf, ids, 10, 3, cfg.text.eos_token_id)
    np.testing.assert_array_equal(got, ref)
    # Beam-3 must genuinely differ from greedy somewhere, or the test
    # proves nothing about the search.
    from vcoder_tpu.generation import generate

    greedy = generate(
        params, cfg, [list(r) for r in ids], max_new_tokens=10,
        attn_impl="xla",
    ).sequences
    assert not np.array_equal(got, greedy)


def test_beams_with_eos_retirement_match_hf(tiny_pair):
    """Force hypotheses to retire mid-search: declare a token the beam
    output actually emits to be EOS, and re-search under it. Exercises
    the finished-set merge + early-done logic against HF's."""
    hf, params, cfg = tiny_pair
    rng = np.random.default_rng(11)
    ids = rng.integers(3, cfg.text.vocab_size, size=(2, 6))
    probe = _our_beams(params, cfg, ids, 12, 3)
    eos = int(probe[0, 3])
    cfg2 = dataclasses.replace(
        cfg, text=dataclasses.replace(cfg.text, eos_token_id=eos)
    )
    got = _our_beams(params, cfg2, ids, 12, 3)
    ref = _hf_beams(hf, ids, 12, 3, eos)
    np.testing.assert_array_equal(got, ref)
    # With length_penalty=0 shorter hypotheses always outscore longer
    # ones (sums of negative logprobs, no normalization), so a RETIRED
    # hypothesis must win and the EOS must appear in the output — pins
    # the finished-set content, not just live-beam agreement.
    got0 = _our_beams(params, cfg2, ids, 12, 3, length_penalty=0.0)
    ref0 = _hf_beams(hf, ids, 12, 3, eos, length_penalty=0.0)
    np.testing.assert_array_equal(got0, ref0)
    assert (got0 == eos).any()


def test_length_penalty_matches_hf(tiny_pair):
    hf, params, cfg = tiny_pair
    rng = np.random.default_rng(13)
    ids = rng.integers(3, cfg.text.vocab_size, size=(2, 6))
    probe = _our_beams(params, cfg, ids, 12, 3)
    eos = int(probe[1, 2])
    cfg2 = dataclasses.replace(
        cfg, text=dataclasses.replace(cfg.text, eos_token_id=eos)
    )
    for lp in (0.5, 2.0):
        got = _our_beams(params, cfg2, ids, 12, 3, length_penalty=lp)
        ref = _hf_beams(hf, ids, 12, 3, eos, length_penalty=lp)
        np.testing.assert_array_equal(got, ref, err_msg=f"lp={lp}")


def test_beam_sample(tiny_pair):
    """temperature>0 with beams = HF's beam-sample mode: seeded and
    reproducible, seed-sensitive, and collapsing to deterministic beam
    search as temperature -> 0 (the Gumbel noise becomes negligible
    against 1/T-scaled scores, and uniform 1/T scaling is
    ranking-invariant through normalization and the done heuristic)."""
    _, params, cfg = tiny_pair
    rng = np.random.default_rng(17)
    ids = rng.integers(3, cfg.text.vocab_size, size=(2, 6))

    s0 = _our_beams(params, cfg, ids, 10, 3, temperature=1.0, seed=0)
    s0b = _our_beams(params, cfg, ids, 10, 3, temperature=1.0, seed=0)
    s1 = _our_beams(params, cfg, ids, 10, 3, temperature=1.0, seed=1)
    np.testing.assert_array_equal(s0, s0b)
    assert not np.array_equal(s0, s1)

    det = _our_beams(params, cfg, ids, 10, 3)
    cold = _our_beams(params, cfg, ids, 10, 3, temperature=0.01, seed=0)
    np.testing.assert_array_equal(cold, det)

    # Nucleus-filtered beam-sample runs and stays reproducible.
    n0 = _our_beams(
        params, cfg, ids, 10, 3, temperature=0.8, top_p=0.9, seed=2
    )
    n0b = _our_beams(
        params, cfg, ids, 10, 3, temperature=0.8, top_p=0.9, seed=2
    )
    np.testing.assert_array_equal(n0, n0b)


def test_multimodal_ragged_beams():
    """Beam search over a right-padded multimodal batch: deterministic,
    correct shapes, and the spliced image prefix actually steers the
    search (HF can't cross-check this path — it left-pads)."""
    import jax
    import jax.numpy as jnp

    from vcoder_tpu.constants import IMAGE_TOKEN_INDEX as IMG
    from vcoder_tpu.generation import generate
    from vcoder_tpu.models import vcoder as model_mod

    cfg = VCoderConfig.tiny("llava")
    params = model_mod.init_vcoder_params(jax.random.PRNGKey(0), cfg)
    s = cfg.vision.image_size
    rng = np.random.default_rng(5)
    images = jnp.asarray(
        rng.standard_normal((2, s, s, 3)).astype(np.float32)
    )
    rows = [
        [1, IMG, 9, 10, 11],
        [1, IMG, 9],  # ragged: right-padded internally
    ]
    a = generate(
        params, cfg, rows, images=images, max_new_tokens=8, num_beams=2,
        attn_impl="xla",
    )
    b = generate(
        params, cfg, rows, images=images, max_new_tokens=8, num_beams=2,
        attn_impl="xla",
    )
    assert a.sequences.shape == (2, 8)
    np.testing.assert_array_equal(a.sequences, b.sequences)
    assert a.num_generated.shape == (2,)
    # Different images must steer the beams differently.
    other = generate(
        params,
        cfg,
        rows,
        images=jnp.asarray(
            rng.standard_normal((2, s, s, 3)).astype(np.float32)
        ),
        max_new_tokens=8,
        num_beams=2,
        attn_impl="xla",
    )
    assert not np.array_equal(a.sequences, other.sequences)


def _golden():
    import os

    path = os.path.join(
        os.path.dirname(__file__), "golden", "hf_golden.npz"
    )
    return np.load(path, allow_pickle=False)


def _beam_cases(g):
    for name in ("plain", "eos", "eos_lp0", "lp05", "lp2"):
        max_new, beams, eos = (int(x) for x in g[f"beam.{name}.args"])
        yield (
            name, g[f"beam.{name}.ids"], g[f"beam.{name}.gen"],
            max_new, beams, eos, float(g[f"beam.{name}.lp"]),
        )


def test_golden_vectors_anchor_beams():
    """Our beam search must match the COMMITTED HF beam outputs
    (recorded by record_golden.py) — parity anchored independent of the
    installed transformers version."""
    from vcoder_tpu.checkpoint import import_llama

    g = _golden()
    txt = TextConfig(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        num_layers=2,
        num_heads=4,
        num_kv_heads=2,
        max_position_embeddings=128,
    )
    state = {
        k[len("beam.state."):]: g[k]
        for k in g.files
        if k.startswith("beam.state.")
    }
    params = {"lm": import_llama(state, txt)}
    for name, ids, gen, max_new, beams, eos, lp in _beam_cases(g):
        cfg = VCoderConfig(
            model_type="llava",
            text=dataclasses.replace(txt, eos_token_id=eos),
        )
        got = _our_beams(params, cfg, ids, max_new, beams, lp)
        np.testing.assert_array_equal(got, gen, err_msg=f"case {name}")


def test_live_transformers_matches_golden_beams():
    """If installed transformers' beam search drifts from the recorded
    outputs, fail HERE (environment signal), not in the parity tests."""
    from transformers import LlamaConfig, LlamaForCausalLM

    g = _golden()
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
            k[len("beam.state."):]: torch.tensor(g[k])
            for k in g.files
            if k.startswith("beam.state.")
        }
    )
    for name, ids, gen, max_new, beams, eos, lp in _beam_cases(g):
        got = _hf_beams(hf, ids, max_new, beams, eos, length_penalty=lp)
        np.testing.assert_array_equal(got, gen, err_msg=f"case {name}")
