"""Multi-LoRA serving (lora.py::MultiLoraWeight + both engines).

N adapters ride one frozen base; each request picks its adapter by
name, and a batch mixing adapters X / Y / none must emit token-for-token
what three single-adapter models would. The reference can only merge
ONE adapter into the weights at load time (model/builder.py:44-81)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vcoder_tpu.config import VCoderConfig
from vcoder_tpu.lora import (
    LoraWeight,
    MultiLoraWeight,
    lora_qmatmul,
    multilora_qmatmul,
    single_adapter_view,
    stack_adapters,
)
from vcoder_tpu.models import vcoder as model_mod
from vcoder_tpu.parallel.sharding import _path_str
from vcoder_tpu.serve.engine import ServingEngine
from vcoder_tpu.serve.paged_engine import PagedServingEngine

TARGETS = ["lm/layers/q_proj", "lm/layers/v_proj", "lm/layers/down_proj"]


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

    adapters = {"x": mk_adapter(1, 4, 8.0), "y": mk_adapter(2, 8, 8.0)}
    return cfg, params, adapters


def _wrap_single(params, tree):
    """Base params with ONE adapter as LoraWeight leaves (the
    already-tested single-LoRA path — the numerical oracle)."""

    def leaf(path, x):
        s = _path_str(path)
        if s in tree:
            a, b, scale = tree[s]
            return LoraWeight(base=x, a=a, b=b, scale=scale)
        return x

    return jax.tree_util.tree_map_with_path(leaf, params)


def _prompt(tail):
    return [1] + [20 + (j % 50) for j in range(24)] + list(tail)


def _serve(eng, jobs, max_new=6):
    rids = [
        eng.add_request(p, max_new_tokens=max_new, lora=name)
        for p, name in jobs
    ]
    res = eng.run()
    return [res[r] for r in rids]


def _serve_plain(eng, prompts, max_new=6):
    rids = [eng.add_request(p, max_new_tokens=max_new) for p in prompts]
    res = eng.run()
    return [res[r] for r in rids]


# ---------------------------------------------------------------------------
# unit level
# ---------------------------------------------------------------------------


def test_multilora_matmul_matches_single(setup):
    cfg, params, adapters = setup
    a, b, scale = adapters["x"]["lm/layers/q_proj"]
    L, in_dim, r = a.shape
    out_dim = b.shape[-1]
    base = jax.random.normal(jax.random.PRNGKey(3), (in_dim, out_dim))
    x = jax.random.normal(jax.random.PRNGKey(4), (3, 2, in_dim))

    single = lora_qmatmul(
        x, LoraWeight(base=base, a=a[0], b=b[0], scale=scale)
    )
    # Stacked: index 0 zero, index 1 = the adapter (scale folded, rank
    # padded to 8 like stack_adapters does).
    R = 8
    a_p = jnp.pad(a[0], ((0, 0), (0, R - r)))
    b_p = jnp.pad(b[0] * scale, ((0, R - r), (0, 0)))
    ml = MultiLoraWeight(
        base=base,
        a=jnp.stack([jnp.zeros_like(a_p), a_p]),
        b=jnp.stack([jnp.zeros_like(b_p), b_p]),
        idx=jnp.asarray([1, 0, 1], jnp.int32),
    )
    out = multilora_qmatmul(x, ml)
    np.testing.assert_allclose(
        np.asarray(out[0]), np.asarray(single[0]), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(  # idx 0 row = plain base
        np.asarray(out[1]), np.asarray(x[1] @ base), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out[2]), np.asarray(single[2]), atol=1e-5, rtol=1e-5
    )


def test_stack_and_view(setup):
    cfg, params, adapters = setup
    wrapped, ids = stack_adapters(params, adapters, max_batch=4)
    assert ids == {"x": 1, "y": 2}
    q = wrapped["lm"]["layers"]["q_proj"]
    assert isinstance(q, MultiLoraWeight)
    assert q.a.shape[1] == 3 and q.a.shape[-1] == 8  # zero + x + y, R=8
    assert q.idx.shape == (q.a.shape[0], 4)
    # Zero entry really is zero; view of idx 0 is a no-op adapter.
    assert not np.asarray(q.a[:, 0]).any()
    view = single_adapter_view(wrapped, 0)
    vq = view["lm"]["layers"]["q_proj"]
    assert isinstance(vq, LoraWeight) and not np.asarray(vq.a).any()


# ---------------------------------------------------------------------------
# engines
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("engine_cls", [ServingEngine, PagedServingEngine])
def test_mixed_batch_matches_single_adapter_engines(setup, engine_cls):
    cfg, params, adapters = setup
    kw = dict(max_batch=4, max_len=256, attn_impl="xla")
    if engine_cls is PagedServingEngine:
        kw["page_size"] = 8

    jobs = [
        (_prompt([5, 9]), "x"),
        (_prompt([5, 9]), "y"),
        (_prompt([5, 9]), None),
        (_prompt([7, 3]), "x"),
    ]
    eng = engine_cls(cfg, params, lora_adapters=adapters, **kw)
    mixed = _serve(eng, jobs)

    oracle_x = _serve_plain(
        engine_cls(cfg, _wrap_single(params, adapters["x"]), **kw),
        [jobs[0][0], jobs[3][0]],
    )
    oracle_y = _serve_plain(
        engine_cls(cfg, _wrap_single(params, adapters["y"]), **kw),
        [jobs[1][0]],
    )
    oracle_none = _serve_plain(engine_cls(cfg, params, **kw), [jobs[2][0]])

    assert mixed[0] == oracle_x[0]
    assert mixed[1] == oracle_y[0]
    assert mixed[2] == oracle_none[0]
    assert mixed[3] == oracle_x[1]
    # Adapters actually do something (x != y != none on same prompt).
    assert len({tuple(mixed[0]), tuple(mixed[1]), tuple(mixed[2])}) == 3


def test_slot_reuse_resets_adapter(setup):
    """A no-adapter request admitted into a slot previously running
    adapter x must NOT inherit x."""
    cfg, params, adapters = setup
    kw = dict(max_batch=1, max_len=256, attn_impl="xla")
    eng = ServingEngine(cfg, params, lora_adapters=adapters, **kw)
    out = _serve(eng, [(_prompt([5, 9]), "x"), (_prompt([5, 9]), None)])
    oracle_none = _serve_plain(
        ServingEngine(cfg, params, **kw), [_prompt([5, 9])]
    )
    assert out[1] == oracle_none[0]


def test_unknown_adapter_fails_only_that_request(setup):
    cfg, params, adapters = setup
    eng = ServingEngine(
        cfg, params, lora_adapters=adapters, max_batch=2, max_len=256,
        attn_impl="xla",
    )
    ok = eng.add_request(_prompt([5, 9]), max_new_tokens=4, lora="x")
    bad = eng.add_request(_prompt([5, 9]), max_new_tokens=4, lora="nope")
    res = eng.run()
    assert len(res[ok]) == 4
    assert res[bad] == []  # failed at admission, nothing generated


def test_lora_on_plain_engine_rejected(setup):
    cfg, params, adapters = setup
    eng = ServingEngine(
        cfg, params, max_batch=2, max_len=256, attn_impl="xla"
    )
    rid = eng.add_request(_prompt([5, 9]), max_new_tokens=4, lora="x")
    res = eng.run()
    assert res[rid] == []  # failed at admission


def test_prefix_cache_is_adapter_salted(setup):
    """Identical prompt under adapters x and y must not share pages;
    the same prompt under x twice must."""
    cfg, params, adapters = setup
    kw = dict(
        max_batch=2, max_len=256, page_size=8, attn_impl="xla",
        prefix_cache=True, prefix_chunk=16,
    )
    eng = PagedServingEngine(cfg, params, lora_adapters=adapters, **kw)
    out = _serve(
        eng,
        [(_prompt([5, 9]), "x"), (_prompt([5, 9]), "y")],
    )
    assert eng.prefix_stats()["hits"] == 0
    oracle_y = _serve_plain(
        PagedServingEngine(
            cfg, _wrap_single(params, adapters["y"]), max_batch=2,
            max_len=256, page_size=8, attn_impl="xla",
        ),
        [_prompt([5, 9])],
    )
    assert out[1] == oracle_y[0]

    out2 = _serve(eng, [(_prompt([5, 9]), "x")])
    assert eng.prefix_stats()["hits"] >= 1
    assert out2[0] == out[0]


def test_partial_layer_adapter_rejected(setup):
    """An adapter covering fewer layers than the model must raise a
    clear error, not be reshape()d into cross-layer garbage."""
    cfg, params, adapters = setup
    bad = {
        path: (a[:1], b[:1], s)  # 1 of L layers
        for path, (a, b, s) in adapters["x"].items()
    }
    with pytest.raises(ValueError, match="stacked over"):
        stack_adapters(params, {"x": bad}, max_batch=4)


def test_no_target_adapter_rejected(setup):
    """An adapter whose paths match no parameter of this model would
    silently serve as the base model; it must be rejected."""
    cfg, params, adapters = setup
    ghost = {
        "lm/layers/nonexistent_proj": next(iter(adapters["x"].values()))
    }
    with pytest.raises(ValueError, match="targets no parameter"):
        stack_adapters(params, {"x": adapters["x"], "g": ghost},
                       max_batch=4)
    with pytest.raises(ValueError, match="no LoRA targets"):
        stack_adapters(params, {"e": {}}, max_batch=4)


def test_adapter_dir_ab_layer_mismatch(tmp_path):
    """lora_A/lora_B covering different layer sets is a corrupt adapter:
    a clear ValueError, not a bare KeyError."""
    import numpy as np

    from safetensors.numpy import save_file

    from vcoder_tpu.lora import load_lora_adapter_dir

    state = {
        "base_model.model.model.layers.0.self_attn.q_proj.lora_A.weight":
            np.zeros((4, 8), np.float32),
        "base_model.model.model.layers.1.self_attn.q_proj.lora_A.weight":
            np.zeros((4, 8), np.float32),
        "base_model.model.model.layers.0.self_attn.q_proj.lora_B.weight":
            np.zeros((8, 4), np.float32),
    }
    save_file(state, str(tmp_path / "adapter_model.safetensors"))
    with pytest.raises(ValueError, match="different"):
        load_lora_adapter_dir(str(tmp_path))


def test_load_lora_adapter_dir(tmp_path):
    """PEFT-format dir -> unmerged {path: (a, b, scale)} trees in our
    [L, in, r] / [L, r, out] layout."""
    torch = pytest.importorskip("torch")
    import json

    from vcoder_tpu.lora import load_lora_adapter_dir

    L, in_dim, out_dim, r = 2, 8, 12, 4
    state = {}
    rng = np.random.RandomState(0)
    for i in range(L):
        pre = f"base_model.model.model.layers.{i}.self_attn.q_proj"
        state[f"{pre}.lora_A.weight"] = torch.tensor(
            rng.randn(r, in_dim).astype(np.float32)
        )
        state[f"{pre}.lora_B.weight"] = torch.tensor(
            rng.randn(out_dim, r).astype(np.float32)
        )
    torch.save(state, str(tmp_path / "adapter_model.bin"))
    (tmp_path / "adapter_config.json").write_text(
        json.dumps({"lora_alpha": 16, "r": 4})
    )
    tree = load_lora_adapter_dir(str(tmp_path))
    a, b, scale = tree["lm/layers/q_proj"]
    assert a.shape == (L, in_dim, r) and b.shape == (L, r, out_dim)
    assert scale == 4.0
    # Transposition is right: a[l] == A_l.T
    np.testing.assert_allclose(
        np.asarray(a[0]),
        state[
            "base_model.model.model.layers.0.self_attn.q_proj.lora_A.weight"
        ].numpy().T,
    )


def test_chunked_prefill_multilora_parity(setup):
    cfg, params, adapters = setup
    jobs = [(_prompt([5, 9]), "x"), (_prompt([7, 3]), "y")]
    kw = dict(max_batch=2, max_len=256, page_size=8, attn_impl="xla")
    plain = _serve(
        PagedServingEngine(cfg, params, lora_adapters=adapters, **kw),
        jobs,
    )
    chunked = _serve(
        PagedServingEngine(
            cfg, params, lora_adapters=adapters, chunked_prefill=16, **kw
        ),
        jobs,
    )
    assert chunked == plain
