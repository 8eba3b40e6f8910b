"""Record HF-transformers golden activations for the parity tests.

Runs the SAME tiny configs the parity fixtures build (tests/
test_llama_parity.py::tiny_pair, tests/test_clip_parity.py::tiny_clip)
through torch transformers once and freezes weights + inputs + outputs to
``hf_golden.npz``. The committed file anchors parity to real HF numerics
(reference trains/serves via transformers Llama/CLIP — model/builder.py)
independent of the transformers version installed when tests run: one
wrong convention (RoPE interleaving, norm epsilon placement, projection
transpose) in BOTH our model and a future re-derivation cannot cancel out.

Regenerate (only when intentionally changing the tiny configs):
    python tests/golden/record_golden.py
"""

import os

import numpy as np
import torch

OUT = os.path.join(os.path.dirname(__file__), "hf_golden.npz")


def record_llama(store):
    from transformers import LlamaConfig, LlamaForCausalLM

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
    torch.manual_seed(0)
    hf = LlamaForCausalLM(hf_cfg).eval()
    rng = np.random.default_rng(0)
    ids = rng.integers(0, hf_cfg.vocab_size, size=(2, 9))
    with torch.no_grad():
        logits = hf(torch.tensor(ids)).logits.numpy()
    for k, v in hf.state_dict().items():
        store[f"llama.state.{k}"] = v.numpy()
    store["llama.input_ids"] = ids
    store["llama.logits"] = logits


def record_clip(store):
    from transformers import CLIPVisionConfig, CLIPVisionModel

    hf_cfg = CLIPVisionConfig(
        image_size=28,
        patch_size=14,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        hidden_act="quick_gelu",
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf = CLIPVisionModel(hf_cfg).eval()
    rng = np.random.default_rng(0)
    pix = rng.standard_normal((2, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        out = hf(torch.tensor(pix), output_hidden_states=True)
    for k, v in hf.state_dict().items():
        store[f"clip.state.{k}"] = v.numpy()
    store["clip.pixel_values"] = pix
    # select_layer -2 with CLS dropped: the production feature tap
    # (reference: llava_arch.py vision_tower select_layer=-2, 'patch').
    store["clip.hidden_m2"] = out.hidden_states[-2].numpy()


def record_beams(store):
    """HF beam-search outputs on the tests/test_beam_search.py tiny
    config (torch seed 3): anchors our beam semantics to the recorded
    transformers behavior, independent of the installed version. EOS
    ids 93/44 are tokens the beam output emits mid-sequence (probed once
    from the parity fixture and frozen) so retirement actually fires."""
    from transformers import LlamaConfig, LlamaForCausalLM

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
    torch.manual_seed(3)
    hf = LlamaForCausalLM(hf_cfg).eval()
    for k, v in hf.state_dict().items():
        store[f"beam.state.{k}"] = v.numpy()

    ids_plain = np.random.default_rng(7).integers(3, 128, size=(2, 7))
    ids_eos = np.random.default_rng(11).integers(3, 128, size=(2, 6))
    ids_lp = np.random.default_rng(13).integers(3, 128, size=(2, 6))
    cases = {
        "plain": (ids_plain, 10, 3, 2, 1.0),
        "eos": (ids_eos, 12, 3, 93, 1.0),
        "eos_lp0": (ids_eos, 12, 3, 93, 0.0),
        "lp05": (ids_lp, 12, 3, 44, 0.5),
        "lp2": (ids_lp, 12, 3, 44, 2.0),
    }
    for name, (ids, max_new, beams, eos, lp) in cases.items():
        with torch.no_grad():
            out = hf.generate(
                torch.tensor(ids),
                attention_mask=torch.ones(ids.shape, dtype=torch.long),
                max_new_tokens=max_new,
                num_beams=beams,
                do_sample=False,
                eos_token_id=eos,
                pad_token_id=eos,
                length_penalty=lp,
                early_stopping=False,
            )
        gen = out[:, ids.shape[1]:].numpy()
        if gen.shape[1] < max_new:
            pad = np.full(
                (gen.shape[0], max_new - gen.shape[1]), eos, gen.dtype
            )
            gen = np.concatenate([gen, pad], axis=1)
        store[f"beam.{name}.ids"] = ids
        store[f"beam.{name}.gen"] = gen.astype(np.int32)
        store[f"beam.{name}.args"] = np.array(
            [max_new, beams, eos], np.int64
        )
        store[f"beam.{name}.lp"] = np.float64(lp)


def main():
    import transformers

    store = {}
    record_llama(store)
    record_clip(store)
    record_beams(store)
    store["meta.versions"] = np.array(
        [transformers.__version__, torch.__version__]
    )
    np.savez_compressed(OUT, **store)
    print(f"wrote {OUT} ({os.path.getsize(OUT)} bytes, {len(store)} arrays)")


if __name__ == "__main__":
    main()
