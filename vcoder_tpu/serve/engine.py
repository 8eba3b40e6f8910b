"""Continuous-batching serving engine.

The reference serves one request at a time through HF ``generate``
(reference: serve/chat.py, serve/cli.py). This engine is the TPU-native
replacement for production serving:

* a fixed pool of ``max_batch`` decode slots shares one jitted decode step
  — requests join and leave the batch between steps (continuous batching);
* per-request multimodal prefill (1/2/3 modalities -> 576/1152/1728 vision
  tokens) runs through the fused prefill graph at bucketed lengths, then
  its KV block is inserted into the slot cache with one
  ``dynamic_update_slice`` — no recompilation per request;
* decode is one ``[max_batch]`` step regardless of occupancy; inactive
  slots are masked. Per-request temperature rides as a vector.

Slot caches are contiguous per request (JetStream-style). At VCoder's
sequence scale (<=2048 text + 1728 vision tokens) a block-table paged
layout buys nothing over slots; token budget per slot is static.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vcoder_tpu.config import VCoderConfig
from vcoder_tpu.models import vcoder as model_mod
from vcoder_tpu.models.llama import KVCache
from vcoder_tpu.multimodal import build_splice_plan, validate_features

PREFILL_BUCKETS = (512, 1024, 1536, 2048, 2560, 3072, 4096)


def _bucket(n: int) -> int:
    for b in PREFILL_BUCKETS:
        if n <= b:
            return b
    raise ValueError(f"prompt too long: {n}")


class DeferAdmission(Exception):
    """Raised by a _prefill override to pause admission (e.g. paged pool
    exhausted); the request must already be back in the queue."""


def apply_serving_layout(params) -> bool:
    """Pin the stacked bf16 q/k/v projections to the batched-decode
    weight layout (``major_to_minor=(0, 2, 1)`` — layer-major, output-dim
    before input-dim in memory).

    Why: the windowed decode jits (`_decode_all_n` and friends) run their
    matmuls inside a ``fori_loop``.  Entry parameters arrive in whatever
    layout the first graph that touched them chose (row-major ``[L, in,
    out]`` from init/prefill), but XLA's layout assignment wants the
    transposed layout for the B>=2 decode matmuls in the loop body — and
    because a while-loop body cannot read an entry arg in two layouts, it
    materializes a full relayout COPY of each 1.07 GB projection (the
    round-1 bf16 batched-decode OOM; docs/PERFORMANCE.md).  Handing the
    weights over already in the decode-preferred layout compiles the same
    loop with ZERO weight copies; prefill is layout-insensitive (measured
    TTFT unchanged-to-better, docs/PERFORMANCE.md).

    Mutates ``params`` in place (so the relayouted old arrays actually
    free — at 7B the weights are 14.5 of 15.5 GB and a functional copy
    would hold both).  int8/int4 ``QuantizedTensor`` and LoRA-wrapped
    projections are left alone (integer weights never relayout in loop
    bodies — measured).  Returns True if any leaf was re-laid."""
    try:
        from jax.experimental.layout import Format, Layout
        from jax.sharding import SingleDeviceSharding
    except ImportError:  # pragma: no cover - older jax
        return False
    dev = jax.devices()[0]
    fmt = Format(Layout(major_to_minor=(0, 2, 1)), SingleDeviceSharding(dev))
    layers = params["lm"]["layers"]
    changed = False
    for name in ("q_proj", "k_proj", "v_proj"):
        w = layers.get(name)
        if (
            not isinstance(w, jax.Array)
            or w.ndim != 3
            or not jnp.issubdtype(w.dtype, jnp.floating)
        ):
            continue
        layers[name] = jax.device_put(w, fmt)
        # Fence before dropping the old buffer so peak HBM holds at most
        # one extra projection (~1 GB) at a time.
        jax.device_get(jnp.zeros(1))
        del w
        changed = True
    return changed


@dataclasses.dataclass
class Request:
    request_id: int
    input_ids: List[int]
    images: Optional[np.ndarray] = None
    segs: Optional[np.ndarray] = None
    depths: Optional[np.ndarray] = None
    max_new_tokens: int = 256
    temperature: float = 0.0
    top_p: float = 1.0
    lora: Optional[str] = None  # adapter name (multi-LoRA engines)
    # runtime state
    slot: int = -1
    prompt_len: int = 0
    generated: List[int] = dataclasses.field(default_factory=list)
    done: bool = False
    error: Optional[str] = None
    # Tokens from `generated` folded back into `input_ids` by a
    # preemption recompute (paged engine): they count against
    # max_new_tokens but occupy context as part of prompt_len.
    folded: int = 0

    def context_used(self) -> int:
        """KV positions this request occupies: prompt + generated,
        without double-counting recompute-folded tokens."""
        return self.prompt_len + len(self.generated) - self.folded

    def new_ids(self) -> List[int]:
        """Generated ids not yet folded into the prompt — what, together
        with input_ids, reconstructs the full token history."""
        return self.generated[self.folded:]


@partial(
    jax.jit,
    static_argnames=("cfg", "use_vcoder_emb", "has_images", "has_segs",
                     "has_depths", "attn_impl"),
    donate_argnums=(6,),
)
def _prefill_insert(
    params,
    cfg: VCoderConfig,
    plan_arrays,
    images,
    segs,
    depths,
    cache: KVCache,  # engine slot cache [L, B_max, S_max, ...]
    slot,  # [] int32
    *,
    use_vcoder_emb: bool,
    has_images: bool,
    has_segs: bool,
    has_depths: bool,
    attn_impl: str,
):
    """Prefill one request at bucketed length T, insert its KV into the
    slot cache, return first-token logits + updated cache."""
    T = plan_arrays["safe_ids"].shape[1]
    tmp = KVCache.create(
        cfg.text,
        1,
        T,
        dtype=params["lm"]["embed_tokens"].dtype,
        quantized=cache.quantized,
    )
    logits, tmp = model_mod.prefill(
        params,
        cfg,
        plan_arrays,
        images if has_images else None,
        segs if has_segs else None,
        depths if has_depths else None,
        cache=tmp,
        use_vcoder_emb=use_vcoder_emb,
        attn_impl=attn_impl,
    )
    # Insert [L, 1, T, ...] blocks at (slot, 0).
    k = jax.lax.dynamic_update_slice(
        cache.k, tmp.k.astype(cache.k.dtype), (0, slot, 0, 0, 0)
    )
    v = jax.lax.dynamic_update_slice(
        cache.v, tmp.v.astype(cache.v.dtype), (0, slot, 0, 0, 0)
    )
    k_scale = v_scale = None
    if cache.quantized:
        k_scale = jax.lax.dynamic_update_slice(
            cache.k_scale, tmp.k_scale, (0, slot, 0, 0, 0)
        )
        v_scale = jax.lax.dynamic_update_slice(
            cache.v_scale, tmp.v_scale, (0, slot, 0, 0, 0)
        )
    s_max = cache.kv_mask.shape[1]
    row_mask = jnp.arange(s_max) < tmp.length[0]
    kv_mask = jax.lax.dynamic_update_slice(
        cache.kv_mask, row_mask[None, :], (slot, 0)
    )
    length = jax.lax.dynamic_update_slice(
        cache.length, tmp.length, (slot,)
    )
    return logits[0], KVCache(
        k=k, v=v, kv_mask=kv_mask, length=length,
        k_scale=k_scale, v_scale=v_scale,
    )


@partial(
    jax.jit,
    static_argnames=("cfg", "nucleus", "attn_impl"),
    donate_argnums=(3,),
)
def _decode_all(
    params,
    cfg: VCoderConfig,
    tokens,  # [B_max] int32
    cache: KVCache,
    active,  # [B_max] bool
    temperature,  # [B_max] f32
    top_p,  # [B_max] f32
    rng,
    *,
    nucleus: bool,
    attn_impl: str,
):
    """One decode step for every slot; inactive slots are masked out of the
    cache write and their sampled token is ignored by the host."""
    from vcoder_tpu.generation import sample_token_batch

    positions = cache.length  # next position == current length
    embeds = model_mod.llama_mod.embed_tokens(
        params["lm"], tokens[:, None]
    )
    hidden, cache = model_mod.llama_mod.llama_forward(
        params["lm"],
        cfg.text,
        embeds,
        attn_mask=active[:, None],
        position_ids=positions[:, None],
        cache=cache,
        write_offset=positions,
        attn_impl=attn_impl,
    )
    logits = model_mod.llama_mod.lm_head(params["lm"], hidden)[:, 0]
    nxt = sample_token_batch(logits, rng, temperature, top_p, nucleus=nucleus)
    return nxt, cache


@partial(
    jax.jit,
    static_argnames=("cfg", "steps", "nucleus", "attn_impl"),
    donate_argnums=(3,),
)
def _decode_all_n(
    params,
    cfg: VCoderConfig,
    tokens,
    cache: KVCache,
    active,
    temperature,
    top_p,
    rng,
    *,
    steps: int,
    nucleus: bool,
    attn_impl: str,
):
    """``steps`` decode steps in ONE dispatch (a ``fori_loop`` whose body
    is one full decode step); returns ([steps, B] tokens, last tokens,
    cache).

    bf16 engines MUST hold their stacked q/k/v projections in the
    serving layout (``apply_serving_layout``) before tracing this: with
    the default [L, in, out] row-major entry layout, XLA's layout
    assignment re-lays each projection for the batched matmuls inside
    the loop body (~1 GB materialized copy per projection — the round-1
    bf16 batched OOM; docs/PERFORMANCE.md). With the weights already in
    the layout the loop body wants, the graph has zero weight copies for
    any window size. int8 weights never relayout."""
    B = tokens.shape[0]
    buf = jnp.zeros((steps, B), jnp.int32)

    def body(i, carry):
        tokens, cache, buf, rng = carry
        rng, sub = jax.random.split(rng)
        nxt, cache = _decode_all(
            params, cfg, tokens, cache, active, temperature, top_p, sub,
            nucleus=nucleus, attn_impl=attn_impl,
        )
        return nxt, cache, buf.at[i].set(nxt), rng

    tokens, cache, buf, _ = jax.lax.fori_loop(
        0, steps, body, (tokens, cache, buf, rng)
    )
    return buf, tokens, cache


@partial(
    jax.jit,
    static_argnames=("cfg", "eos_id", "nucleus", "attn_impl"),
    donate_argnums=(4,),
)
def _spec_decode_all(
    params,
    cfg: VCoderConfig,
    tokens,  # [B_max] int32 current token per slot (KV not yet written)
    draft,  # [B_max, k-1] int32 prompt-lookup drafts
    cache: KVCache,
    active,  # [B_max] bool
    budget,  # [B_max] int32 tokens each row may still emit (>= 1 if active)
    temperature,  # [B_max] f32
    top_p,  # [B_max] f32
    rng,
    *,
    eos_id: int,
    nucleus: bool,
    attn_impl: str,
):
    """One speculative verify step for every slot (the engine analogue of
    speculative._spec_step_jit): feed [token, draft...] through the
    decoder, accept the greedy-matching prefix per row, trim the cache to
    the accepted length. Rows with temperature > 0 sample their next
    token from the first position and always emit exactly 1 (speculation
    is a greedy-only optimization; their drafts are masked off).

    Returns (outs [B, k], emit [B], nxt [B], cache).
    """
    from vcoder_tpu.speculative import accept_window

    B = tokens.shape[0]
    k = 1 + draft.shape[1]
    positions0 = cache.length
    ids = jnp.concatenate([tokens[:, None], draft], axis=1)  # [B, k]
    embeds = model_mod.llama_mod.embed_tokens(params["lm"], ids)
    positions = positions0[:, None] + jnp.arange(k, dtype=jnp.int32)[None, :]
    hidden, cache = model_mod.llama_mod.llama_forward(
        params["lm"],
        cfg.text,
        embeds,
        attn_mask=jnp.broadcast_to(active[:, None], (B, k)),
        position_ids=positions,
        cache=cache,
        write_offset=positions0,
        attn_impl=attn_impl,
    )
    logits = model_mod.llama_mod.lm_head(params["lm"], hidden)  # [B, k, V]
    pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    # Sampling rows: draw from the first position (temperature + top_p),
    # force emit == 1; greedy rows keep their argmax.
    from vcoder_tpu.generation import sample_token_batch

    is_sampling = temperature > 0.0
    outs = pred.at[:, 0].set(
        sample_token_batch(
            logits[:, 0], rng, temperature, top_p, nucleus=nucleus
        )
    )

    emit, nxt = accept_window(
        outs, draft, is_sampling, ~active, budget, eos_id
    )

    from vcoder_tpu.speculative import trim_cache

    cache = trim_cache(cache, positions0 + emit)
    nxt = jnp.where(emit > 0, nxt, tokens)
    return outs, emit, nxt, cache


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "steps", "lookahead", "eos_id", "nucleus", "attn_impl",
    ),
    donate_argnums=(3, 4, 5, 6, 7),
)
def _spec_decode_all_n(
    params,
    cfg: VCoderConfig,
    tokens,  # [B] current token per slot
    cache: KVCache,
    history,  # [B, H] int32 prompt+generated per slot (device-resident)
    hist_len,  # [B]
    gen_count,  # [B] tokens generated so far per slot
    done,  # [B] bool device-side done flags
    active,  # [B]
    budget_max,  # [B] total-generation cap per slot
    temperature,  # [B]
    top_p,  # [B]
    rng,
    *,
    steps: int,
    lookahead: int,
    eos_id: int,
    nucleus: bool,
    attn_impl: str,
):
    """``steps`` fused speculative verify steps in ONE dispatch: drafting
    runs on the device history (speculative.ngram_draft), so no host
    round trip is needed between verifies. bf16 engines must hold their
    stacked q/k/v projections in the serving layout first (see
    ``apply_serving_layout`` / `_decode_all_n`); int8 weights never
    relayout.

    Returns (outs_buf [steps, B, k], emit_buf [steps, B], tokens, cache,
    history, hist_len, gen_count, done).
    """
    from vcoder_tpu.speculative import ngram_draft

    B = tokens.shape[0]
    k = lookahead
    H = history.shape[1]
    rows = jnp.arange(B, dtype=jnp.int32)
    jpos = jnp.arange(k, dtype=jnp.int32)[None, :]
    outs_buf = jnp.zeros((steps, B, k), jnp.int32)
    emit_buf = jnp.zeros((steps, B), jnp.int32)

    def body(i, st):
        (tokens, cache, history, hist_len, gen_count, done,
         outs_buf, emit_buf, rng) = st
        rng, sub = jax.random.split(rng)
        draft = ngram_draft(history, hist_len, k - 1)
        budget = jnp.maximum(budget_max - gen_count, 0)
        outs, emit, nxt, cache = _spec_decode_all(
            params, cfg, tokens, draft, cache, active & ~done, budget,
            temperature, top_p, sub, eos_id=eos_id, nucleus=nucleus,
            attn_impl=attn_impl,
        )
        live = jpos < emit[:, None]
        hidx = jnp.where(live, hist_len[:, None] + jpos, H)
        history = history.at[rows[:, None], hidx].set(outs, mode="drop")
        hist_len = jnp.minimum(hist_len + emit, H)
        gen_count = gen_count + emit
        done = (
            done
            | ((emit > 0) & (nxt == eos_id))
            | (gen_count >= budget_max)
        )
        tokens = jnp.where(emit > 0, nxt, tokens)
        return (
            tokens, cache, history, hist_len, gen_count, done,
            outs_buf.at[i].set(outs), emit_buf.at[i].set(emit), rng,
        )

    st = jax.lax.fori_loop(
        0, steps, body,
        (tokens, cache, history, hist_len, gen_count, done,
         outs_buf, emit_buf, rng),
    )
    (tokens, cache, history, hist_len, gen_count, done,
     outs_buf, emit_buf, _) = st
    return (
        outs_buf, emit_buf, tokens, cache, history, hist_len, gen_count,
        done,
    )


class ServingEngine:
    def __init__(
        self,
        cfg: VCoderConfig,
        params: dict,
        *,
        max_batch: int = 8,
        max_len: int = 4096,
        attn_impl: str = "auto",
        seed: int = 0,
        kv_quant: bool = False,
        mesh=None,
        speculative: int = 0,
        sync_every: int = 1,
        lora_adapters=None,
        eos_id: Optional[int] = None,
    ):
        self.cfg = cfg
        self.params = params
        self.max_batch = max_batch
        self.max_len = max_len
        self.attn_impl = attn_impl
        self.kv_quant = kv_quant
        # Speculative continuous batching: each decode dispatch verifies
        # `speculative - 1` prompt-lookup drafts per greedy slot and emits
        # the accepted prefix (1..k tokens). Sampling slots emit exactly 1.
        # The slot cache gets k tokens of slack so the admission/cap rules
        # stay identical to the plain engine.
        self.spec_k = speculative if speculative >= 2 else 0
        if self.spec_k > model_mod.llama_mod.QUANT_FOLD_T_MAX:
            # Beyond this the int8-KV verify would silently fall into the
            # dequantize-the-whole-cache prefill branch (llama_forward);
            # prompt-lookup drafts this long never pay off anyway.
            raise ValueError(
                f"speculative window {self.spec_k} exceeds the supported "
                f"maximum {model_mod.llama_mod.QUANT_FOLD_T_MAX}"
            )
        self.cache_len = max_len + max(
            self.spec_k, max(1, int(sync_every))
        )
        # Windowed decode: ``sync_every = N`` runs N decode steps in ONE
        # on-device fori_loop dispatch and fetches the [N, B] token block
        # in one round trip. Through the tunnel a dispatch costs ~15 ms
        # to submit and a blocking fetch ~40 ms, vs ~16 ms device compute
        # per step (measured: 60 ms/step fully synced, 31 ms dispatch-
        # chained, ~16 ms fused). Finished rows decode up to N-1 garbage
        # steps before the host notices; their cache writes are masked on
        # slot reuse. Speculative mode keeps per-dispatch sync (host
        # drafting needs the freshest tokens) and already amortizes ~k
        # tokens per fetch.
        self.sync_every = max(1, int(sync_every))
        # Fused speculative windows: with spec_k AND sync_every > 1, the
        # slot engine runs sync_every draft+verify steps per dispatch
        # with device-resident per-slot histories (drafting needs no
        # host round trip). Paged engine keeps per-dispatch speculation.
        self._spec_fused = bool(
            self.spec_k and self.sync_every > 1
            and type(self) is ServingEngine
        )
        if self._spec_fused:
            self._hist_cap = self.max_len + 8
            self._history = jnp.full(
                (max_batch, self._hist_cap), -1, jnp.int32
            )
            self._hist_len = jnp.zeros((max_batch,), jnp.int32)
            self._gen_count = jnp.zeros((max_batch,), jnp.int32)
            self._done_dev = jnp.ones((max_batch,), bool)
            self._budget_max = jnp.zeros((max_batch,), jnp.int32)
        # Windowed decode runs the per-step matmuls inside a fori_loop;
        # bf16 stacked projections must be pinned to the decode-preferred
        # layout FIRST or layout assignment materializes ~1 GB relayout
        # copies of each (the round-1 OOM — see apply_serving_layout).
        # Mesh-sharded params keep their NamedSharding (GSPMD owns
        # layouts there); int8/quantized/LoRA projections are skipped
        # inside the helper.
        self._serving_layout = False
        if self.sync_every > 1 and (
            mesh is None or getattr(mesh, "size", 1) <= 1
        ):
            self._serving_layout = apply_serving_layout(params)
        # Multi-chip serving: slot rows shard over data x fsdp, attention
        # heads over model; the dense graphs partition via GSPMD from the
        # cache/param NamedShardings (paged engine handles its own pools).
        if not hasattr(self, "mesh"):
            self.mesh = mesh if (mesh is not None and mesh.size > 1) else None
        if self.mesh is not None and type(self) is ServingEngine:
            assert max_batch % (
                self.mesh.shape["data"] * self.mesh.shape["fsdp"]
            ) == 0, "max_batch must divide over data*fsdp"
            assert cfg.text.num_heads % self.mesh.shape["model"] == 0
        # Multi-LoRA serving: adapter stacks ride next to the frozen base
        # and each batch row picks its adapter by index (lora.py::
        # MultiLoraWeight). B=1 prefills slice a single-adapter view so
        # their jit caches stay shape-stable. The reference can only
        # merge one adapter at load time (model/builder.py:44-81).
        self.lora_ids: Dict[str, int] = {}
        self._multilora = bool(lora_adapters)
        if self._multilora:
            if self.mesh is not None:
                raise ValueError(
                    "multi-LoRA serving is single-device only"
                )
            from vcoder_tpu.lora import stack_adapters

            self.params, self.lora_ids = stack_adapters(
                self.params, lora_adapters, max_batch
            )
        self.cache = self._make_cache()
        self.tokens = jnp.zeros((max_batch,), jnp.int32)
        self.active = np.zeros((max_batch,), bool)
        self.temps = np.zeros((max_batch,), np.float32)
        self.top_ps = np.ones((max_batch,), np.float32)
        # active/temps/top_ps only change at admission/completion; cache
        # their device copies so steady-state decode pays no H2D round
        # trips for them (each upload costs a tunnel RTT).
        self._flags_dirty = True
        self._active_dev = None
        self._temps_dev = None
        self._top_ps_dev = None
        self.slots: List[Optional[Request]] = [None] * max_batch
        self.queue: List[Request] = []
        self.failed: Dict[int, str] = {}
        self._next_id = 0
        self.rng = jax.random.PRNGKey(seed)
        # eos_id=-1 disables EOS termination (deterministic-length
        # generation — benchmarks/tests on random weights).
        self.eos_id = (
            cfg.text.eos_token_id if eos_id is None else eos_id
        )
        from vcoder_tpu.profiling import StepTimer

        self.timer = StepTimer()  # ttft / decode_step percentiles

    # ---- public API ----

    def add_request(
        self,
        input_ids: Sequence[int],
        images=None,
        segs=None,
        depths=None,
        *,
        max_new_tokens: int = 256,
        temperature: float = 0.0,
        top_p: float = 1.0,
        lora: Optional[str] = None,
    ) -> int:
        req = Request(
            request_id=self._next_id,
            input_ids=list(input_ids),
            images=images,
            segs=segs,
            depths=depths,
            max_new_tokens=max_new_tokens,
            temperature=temperature,
            top_p=top_p,
            lora=lora,
        )
        self._next_id += 1
        self.queue.append(req)
        return req.request_id

    def _adapter_idx(self, req: Request) -> int:
        """Stack index of a request's adapter (0 = none); unknown names
        fail only that request (ValueError rides the _admit handler)."""
        if req.lora is None:
            return 0
        if not self._multilora or req.lora not in self.lora_ids:
            raise ValueError(f"unknown LoRA adapter {req.lora!r}")
        return self.lora_ids[req.lora]

    def _prefill_params(self, req: Request):
        """Params view for this request's B=1 prefill: multi-LoRA engines
        slice the request's adapter out of the stacks (index 0 is the
        zero adapter, so the pytree structure — and the prefill jit
        cache — never changes)."""
        if not self._multilora:
            if req.lora is not None:
                raise ValueError(
                    f"engine has no LoRA adapters (got {req.lora!r})"
                )
            return self.params
        from vcoder_tpu.lora import single_adapter_view

        return single_adapter_view(self.params, self._adapter_idx(req))

    def has_work(self) -> bool:
        return bool(self.queue) or any(self.active)

    def _record_failure(self, req: Request) -> None:
        """Remember an admission failure so a serving front-end can turn
        the bare (rid, eos, done) event into an error payload. Bounded:
        front-ends pop entries; direct run() callers never would."""
        self.failed[req.request_id] = req.error or "admission failed"
        while len(self.failed) > 1024:
            self.failed.pop(next(iter(self.failed)))

    def pop_error(self, request_id: int) -> Optional[str]:
        """Fetch-and-clear the failure reason for a request id (None if
        the request ended normally)."""
        return self.failed.pop(request_id, None)

    def cancel(self, request_id: int) -> bool:
        """End a request early (client stop-string hit or disconnect):
        drop it from the queue, or vacate its slot so the capacity goes
        back to other streams. Returns False for unknown/finished ids
        (cancel can race completion — that's fine)."""
        for i, req in enumerate(self.queue):
            if req.request_id == request_id:
                req.done = True
                del self.queue[i]
                return True
        for slot, req in enumerate(self.slots):
            if req is not None and req.request_id == request_id:
                req.done = True
                self._release_slot(slot)
                return True
        return False

    def step(self) -> List[Tuple[int, int, bool]]:
        """Admit queued requests into free slots (prefill), then run one
        decode step. Returns (request_id, token, done) events, including
        the prefill-sampled FIRST token of newly admitted requests.

        With ``sync_every = N > 1``, each step() runs N decode steps in
        one on-device loop dispatch and returns all N steps' events."""
        events = self._admit()
        if not any(self.active):
            return events
        if self.spec_k:
            return events + self._step_speculative()

        self.rng, sub = jax.random.split(self.rng)
        active_dev, temps_dev, top_ps_dev = self._device_flags()
        with self.timer.measure("decode_step"), self._mesh_ctx():
            toks, self.tokens, self.cache = _decode_all_n(
                self.params,
                self.cfg,
                self.tokens,
                self.cache,
                active_dev,
                temps_dev,
                top_ps_dev,
                sub,
                steps=self.sync_every,
                nucleus=self._nucleus(),
                attn_impl=self.attn_impl,
            )
            toks_host = jax.device_get(toks)  # [N, B], ONE round trip
        return events + self._emit_step_events(toks_host)

    def _emit_step_events(self, toks_host) -> List[Tuple[int, int, bool]]:
        """Emit events for an [N, B] block of decoded tokens in step
        order; a row's tokens past its done condition are discarded (the
        device keeps decoding it until the window ends; those cache
        writes are masked on slot reuse)."""
        events: List[Tuple[int, int, bool]] = []
        for n in range(toks_host.shape[0]):
            for slot, req in enumerate(self.slots):
                if req is None or not self.active[slot]:
                    continue
                tok = int(toks_host[n, slot])
                req.generated.append(tok)
                done = (
                    tok == self.eos_id
                    or len(req.generated) >= req.max_new_tokens
                    or req.context_used() >= self.max_len - 1
                )
                events.append((req.request_id, tok, done))
                if done:
                    req.done = True
                    self._release_slot(slot)
        return events

    def _device_flags(self):
        if self._flags_dirty:
            self._active_dev = jnp.asarray(self.active)
            self._temps_dev = jnp.asarray(self.temps)
            self._top_ps_dev = jnp.asarray(self.top_ps)
            self._flags_dirty = False
        return self._active_dev, self._temps_dev, self._top_ps_dev

    def _nucleus(self) -> bool:
        """Static jit flag: only pay the per-step vocab sort when some
        active sampling row actually restricts top_p (both variants stay
        in the jit cache, so flipping costs nothing after first use)."""
        return bool(
            np.any(self.active & (self.temps > 0.0) & (self.top_ps < 1.0))
        )

    def _release_slot(self, slot: int) -> None:
        """Vacate a finished request's slot (paged engine also frees its
        pages)."""
        self.active[slot] = False
        self.slots[slot] = None
        self._flags_dirty = True

    def _spec_host_inputs(self):
        """Per-slot prompt-lookup drafts + remaining-token budgets for a
        speculative verify dispatch (shared by both engines)."""
        from vcoder_tpu.speculative import draft_from_ids

        draft = draft_from_ids(
            [
                (req.input_ids + req.new_ids()) if req is not None else None
                for req in self.slots
            ],
            self.spec_k - 1,
        )
        budget = np.zeros((self.max_batch,), np.int32)
        for slot, req in enumerate(self.slots):
            if req is None or not self.active[slot]:
                continue
            budget[slot] = max(
                1,
                min(
                    req.max_new_tokens - len(req.generated),
                    (self.max_len - 1) - req.context_used(),
                ),
            )
        return draft, budget

    def _emit_window_events(
        self, outs_host, emit_host
    ) -> List[Tuple[int, int, bool]]:
        """Append each slot's accepted window tokens to its request and
        emit (request_id, token, done) events; the done rules match the
        plain per-token step exactly (shared by both engines)."""
        events: List[Tuple[int, int, bool]] = []
        for slot, req in enumerate(self.slots):
            if req is None or not self.active[slot]:
                continue
            for tok in outs_host[slot, : int(emit_host[slot])]:
                tok = int(tok)
                req.generated.append(tok)
                done = (
                    tok == self.eos_id
                    or len(req.generated) >= req.max_new_tokens
                    or req.context_used() >= self.max_len - 1
                )
                events.append((req.request_id, tok, done))
                if done:
                    req.done = True
                    self._release_slot(slot)
                    break
        return events

    def _on_admitted(self, slot: int, req: Request, first_tok: int,
                     done: bool) -> None:
        """Per-admission hook: point the slot's decode row at the
        request's adapter; fused-spec engines sync the slot's device
        history/draft state."""
        if self._multilora:
            from vcoder_tpu.lora import set_row_adapter

            self.params = set_row_adapter(
                self.params, slot, self._adapter_idx(req)
            )
        if not getattr(self, "_spec_fused", False):
            return
        row = np.full((self._hist_cap,), -1, np.int32)
        ids = (list(req.input_ids) + [int(first_tok)])[-self._hist_cap:]
        row[: len(ids)] = ids
        self._history = self._history.at[slot].set(jnp.asarray(row))
        self._hist_len = self._hist_len.at[slot].set(len(ids))
        self._gen_count = self._gen_count.at[slot].set(1)
        self._done_dev = self._done_dev.at[slot].set(bool(done))
        self._budget_max = self._budget_max.at[slot].set(
            min(
                req.max_new_tokens - req.folded,
                (self.max_len - 1) - req.prompt_len,
            )
        )

    def _step_speculative_fused(self) -> List[Tuple[int, int, bool]]:
        """sync_every fused draft+verify steps in one dispatch; device
        histories make between-step host syncs unnecessary."""
        active_dev, temps_dev, top_ps_dev = self._device_flags()
        self.rng, sub = jax.random.split(self.rng)
        with self.timer.measure("decode_step"), self._mesh_ctx():
            (
                outs_buf,
                emit_buf,
                self.tokens,
                self.cache,
                self._history,
                self._hist_len,
                self._gen_count,
                self._done_dev,
            ) = _spec_decode_all_n(
                self.params,
                self.cfg,
                self.tokens,
                self.cache,
                self._history,
                self._hist_len,
                self._gen_count,
                self._done_dev,
                active_dev,
                self._budget_max,
                temps_dev,
                top_ps_dev,
                sub,
                steps=self.sync_every,
                lookahead=self.spec_k,
                eos_id=self.eos_id,
                nucleus=self._nucleus(),
                attn_impl=self.attn_impl,
            )
            # ONE device->host sync for the whole window.
            outs_host, emit_host = jax.device_get((outs_buf, emit_buf))
        events: List[Tuple[int, int, bool]] = []
        for n in range(outs_host.shape[0]):
            for slot, req in enumerate(self.slots):
                if req is None or not self.active[slot]:
                    continue
                for tok in outs_host[n, slot, : int(emit_host[n, slot])]:
                    tok = int(tok)
                    req.generated.append(tok)
                    done = (
                        tok == self.eos_id
                        or len(req.generated) >= req.max_new_tokens
                        or req.context_used() >= self.max_len - 1
                    )
                    events.append((req.request_id, tok, done))
                    if done:
                        req.done = True
                        self._release_slot(slot)
                        break
        return events

    def _step_speculative(self) -> List[Tuple[int, int, bool]]:
        """One speculative verify dispatch for all slots: up to
        ``spec_k`` tokens per greedy row, 1 per sampling row."""
        if getattr(self, "_spec_fused", False):
            return self._step_speculative_fused()
        draft, budget = self._spec_host_inputs()
        # draft + budget ride ONE host->device transfer.
        db = jnp.asarray(np.concatenate([draft, budget[:, None]], axis=1))
        active_dev, temps_dev, top_ps_dev = self._device_flags()
        self.rng, sub = jax.random.split(self.rng)
        with self.timer.measure("decode_step"), self._mesh_ctx():
            outs, emit, nxt, self.cache = _spec_decode_all(
                self.params,
                self.cfg,
                self.tokens,
                db[:, :-1],
                self.cache,
                active_dev,
                db[:, -1],
                temps_dev,
                top_ps_dev,
                sub,
                eos_id=self.eos_id,
                nucleus=self._nucleus(),
                attn_impl=self.attn_impl,
            )
            self.tokens = nxt
            # ONE device->host sync (every fetch pays a tunnel RTT).
            outs_host, emit_host = jax.device_get((outs, emit))
        return self._emit_window_events(outs_host, emit_host)

    def run(self) -> Dict[int, List[int]]:
        """Drain the queue; returns {request_id: generated ids (EOS
        stripped)}."""
        reqs = list(self.queue) + [r for r in self.slots if r is not None]
        while self.has_work():
            self.step()
        return {
            r.request_id: [t for t in r.generated if t != self.eos_id]
            for r in reqs
        }

    def close(self) -> None:
        """Free the engine's device buffers (KV cache, decode carries)
        immediately and render the engine unusable.

        Dropping the Python reference is NOT enough: StreamReaders and
        worker threads commonly keep the engine alive, and on a single
        16 GB chip a second engine's first allocations then race the GC
        for HBM (transient RESOURCE_EXHAUSTED). Shared ``params`` are
        left untouched. Idempotent."""
        if getattr(self, "_closed", False):
            return
        self._closed = True
        big = [self.cache, self.tokens]
        if self._spec_fused:
            big += [
                self._history, self._hist_len, self._gen_count,
                self._done_dev, self._budget_max,
            ]
        for leaf in jax.tree_util.tree_leaves(big):
            if hasattr(leaf, "delete"):
                try:
                    leaf.delete()
                except Exception:
                    pass
        self.cache = None
        self.tokens = None
        self._active_dev = self._temps_dev = self._top_ps_dev = None

    # ---- internals ----

    def _mesh_ctx(self):
        from contextlib import nullcontext

        from vcoder_tpu.parallel.mesh import use_mesh

        return use_mesh(self.mesh) if self.mesh is not None else nullcontext()

    def _make_cache(self):
        cache = KVCache.create(
            self.cfg.text,
            self.max_batch,
            self.cache_len,  # max_len + spec-lookahead slack
            self.params["lm"]["embed_tokens"].dtype,
            quantized=self.kv_quant,
        )
        if self.mesh is not None:
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P

            rows = ("data", "fsdp")

            def put(x, spec):
                if x is None:
                    return None
                return jax.device_put(x, NamedSharding(self.mesh, spec))

            kv_spec = P(None, rows, None, "model", None)
            cache = KVCache(
                k=put(cache.k, kv_spec),
                v=put(cache.v, kv_spec),
                kv_mask=put(cache.kv_mask, P(rows, None)),
                length=put(cache.length, P(rows)),
                k_scale=put(cache.k_scale, kv_spec),
                v_scale=put(cache.v_scale, kv_spec),
            )
        return cache

    def _plan_request(self, req: Request, *, pad_round: int = 1):
        """Shared prompt planning: exact-length probe, max_len guard,
        bucketed re-plan (optionally rounded to ``pad_round``), pixel cast
        to the COMPUTE dtype (never a quantized storage dtype — int8 would
        truncate normalized pixels to ~4 levels). Returns
        (plan, plan_arrays, px_fn)."""
        cfg = self.cfg
        plan_kwargs = dict(
            num_patches=cfg.vision.num_patches,
            has_image=req.images is not None,
            has_seg=req.segs is not None,
            has_depth=req.depths is not None,
            ds_mode=cfg.model_type == "vcoder_ds_llava",
            it_mode=cfg.model_type == "vcoder_it_llava",
        )
        # Exact expanded length first (the DS splice quirk drops depth
        # tokens, so a worst-case estimate would overshoot the cache).
        probe = build_splice_plan(
            [req.input_ids], pad_multiple=1, **plan_kwargs
        )
        exact = int(probe.seq_lens[0])
        if exact > self.max_len - 1:
            raise ValueError(
                f"prompt expands to {exact} tokens; engine max_len"
                f" {self.max_len} is too small"
            )
        # A bucket may overshoot max_len even though the prompt fits; cap
        # it (one extra compiled shape at the boundary).
        pad_to = min(_bucket(exact), self.max_len - 1)
        pad_to = -(-pad_to // pad_round) * pad_round
        plan = build_splice_plan(
            [req.input_ids], pad_to=pad_to, **plan_kwargs
        )
        validate_features(plan, req.images, req.segs, req.depths)
        req.prompt_len = exact
        arrays = model_mod.plan_to_arrays(plan)
        dummy = jnp.zeros((0,), jnp.float32)
        dtype = self.params["lm"]["embed_tokens"].dtype

        def px(x):
            return jnp.asarray(x, dtype) if x is not None else dummy

        return plan, arrays, px

    def _sample_first(self, logits, req: Request) -> int:
        if req.temperature > 0.0:
            from vcoder_tpu.generation import sample_token

            self.rng, sub = jax.random.split(self.rng)
            return int(
                sample_token(
                    logits[None, :],
                    sub,
                    temperature=float(req.temperature),
                    top_p=float(req.top_p),
                )[0]
            )
        return int(jnp.argmax(logits))

    def _admit(self) -> List[Tuple[int, int, bool]]:
        """Fill free slots from the queue; returns first-token events."""
        events: List[Tuple[int, int, bool]] = []
        while self.queue and not all(self.active):
            slot = int(np.nonzero(~self.active)[0][0])
            req = self.queue.pop(0)
            try:
                with self.timer.measure("ttft"):
                    first_tok = self._prefill(req, slot)
            except ValueError as e:
                # Oversized prompt: fail only this request, keep serving.
                req.done = True
                req.error = str(e)
                self._record_failure(req)
                events.append((req.request_id, self.eos_id, True))
                continue
            except DeferAdmission:
                # Resources unavailable right now; the request is back in
                # the queue — stop admitting, keep decoding.
                break
            req.slot = slot
            req.generated.append(first_tok)
            self.slots[slot] = req
            self.active[slot] = True
            self.temps[slot] = req.temperature
            self.top_ps[slot] = req.top_p
            self._flags_dirty = True
            self.tokens = self.tokens.at[slot].set(first_tok)
            done = (
                first_tok == self.eos_id
                or len(req.generated) >= req.max_new_tokens
            )
            self._on_admitted(slot, req, first_tok, done)
            events.append((req.request_id, first_tok, done))
            if done:
                req.done = True
                self._release_slot(slot)
        return events

    def _prefill(self, req: Request, slot: int) -> int:
        cfg = self.cfg
        plan, arrays, px = self._plan_request(req)

        with self._mesh_ctx():
            logits, self.cache = _prefill_insert(
                self._prefill_params(req),
                cfg,
                arrays,
                px(req.images),
                px(req.segs),
                px(req.depths),
                self.cache,
                jnp.asarray(slot, jnp.int32),
                use_vcoder_emb=plan.use_vcoder_emb
                and cfg.use_vcoder_lm_emb,
                has_images=req.images is not None,
                has_segs=req.segs is not None,
                has_depths=req.depths is not None,
                attn_impl=self.attn_impl,
            )
        return self._sample_first(logits, req)
