"""Paged-KV continuous-batching engine.

The slot engine (serve/engine.py) reserves ``max_len`` cache tokens per
slot; VCoder's requests are ragged (1/2/3 modalities -> 576/1152/1728
vision tokens + text), so slots strand HBM. This engine packs KV into
fixed-size pages with a host-side free-list allocator and decodes through
the Pallas paged-attention kernel — the BASELINE.json north star's
"continuous-batched decode with a Pallas paged KV-cache".

Memory: page pools [L, n_pages, KH, page, HD]; a request holds exactly
ceil(context/page) pages, freed on completion. Prefill still runs the
fused dense graph at bucketed lengths (compute-optimal), then its KV
scatters into pages in one jitted insert.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vcoder_tpu.config import VCoderConfig
from vcoder_tpu.models import llama as llama_mod
from vcoder_tpu.models import vcoder as model_mod
from vcoder_tpu.models.llama import KVCache
from vcoder_tpu.serve.engine import Request, ServingEngine, _bucket


@partial(
    jax.jit,
    static_argnames=("cfg", "use_vcoder_emb", "has_images", "has_segs",
                     "has_depths", "attn_impl", "n_new_pages"),
    donate_argnums=(6, 7),
)
def _prefill_to_pages(
    params,
    cfg: VCoderConfig,
    plan_arrays,
    images,
    segs,
    depths,
    k_pages,  # [L, n_pages, KH, page, HD]
    v_pages,
    page_ids,  # [n_new_pages] int32
    *,
    use_vcoder_emb: bool,
    has_images: bool,
    has_segs: bool,
    has_depths: bool,
    attn_impl: str,
    n_new_pages: int,
):
    """Fused dense prefill, then scatter the prompt KV into pages."""
    T = plan_arrays["safe_ids"].shape[1]
    page = k_pages.shape[3]
    tmp = KVCache.create(
        cfg.text, 1, T, dtype=k_pages.dtype
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

    # tmp.k: [L, 1, T, KH, HD] -> [L, T/page, KH, page, HD] page chunks.
    def chunks(x):
        L, _, _, KH, HD = x.shape
        c = x[:, 0].reshape(L, T // page, page, KH, HD)
        return c.transpose(0, 1, 3, 2, 4)

    k_pages = k_pages.at[:, page_ids].set(
        chunks(tmp.k)[:, :n_new_pages].astype(k_pages.dtype)
    )
    v_pages = v_pages.at[:, page_ids].set(
        chunks(tmp.v)[:, :n_new_pages].astype(v_pages.dtype)
    )
    return logits[0], k_pages, v_pages


@partial(
    jax.jit,
    static_argnames=("cfg", "attn_impl"),
    donate_argnums=(3, 4),
)
def _paged_decode_all(
    params,
    cfg: VCoderConfig,
    tokens,  # [B]
    k_pages,
    v_pages,
    page_table,  # [B, P_max]
    lengths,  # [B]
    active,  # [B] bool
    temperature,  # [B] f32
    rng,
    *,
    attn_impl: str,
):
    embeds = llama_mod.embed_tokens(params["lm"], tokens[:, None])
    hidden, k_pages, v_pages = llama_mod.llama_paged_decode(
        params["lm"],
        cfg.text,
        embeds,
        lengths,  # next position == current length
        k_pages,
        v_pages,
        page_table,
        lengths,
        active,
        # The paged kernel has no XLA twin; interpret off-TPU.
        interpret=jax.default_backend() != "tpu",
    )
    logits = llama_mod.lm_head(params["lm"], hidden)[:, 0]
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    temp_safe = jnp.maximum(temperature, 1e-6)
    sampled = jax.random.categorical(
        rng, logits / temp_safe[:, None], axis=-1
    ).astype(jnp.int32)
    nxt = jnp.where(temperature > 0.0, sampled, greedy)
    return nxt, k_pages, v_pages


class PagedServingEngine(ServingEngine):
    """Continuous batching over paged KV storage."""

    def __init__(
        self,
        cfg: VCoderConfig,
        params: dict,
        *,
        max_batch: int = 8,
        max_len: int = 4096,
        page_size: int = 64,
        total_pages: Optional[int] = None,
        attn_impl: str = "auto",
        seed: int = 0,
    ):
        assert cfg.text.num_kv_heads == cfg.text.num_heads, (
            "paged engine requires MHA (the production Vicuna models are)"
        )
        super().__init__(
            cfg,
            params,
            max_batch=max_batch,
            max_len=page_size,  # dummy slot cache stays tiny
            attn_impl=attn_impl,
            seed=seed,
        )
        self.max_len = max_len
        self.page_size = page_size
        self.p_max = max_len // page_size
        if total_pages is None:
            # Default: enough for every slot at max_len plus scratch.
            total_pages = max_batch * self.p_max + 2
        self.total_pages = total_pages
        L = cfg.text.num_layers
        KH, HD = cfg.text.num_kv_heads, cfg.text.head_dim
        dtype = params["lm"]["embed_tokens"].dtype
        self.k_pages = jnp.zeros(
            (L, total_pages, KH, page_size, HD), dtype
        )
        self.v_pages = jnp.zeros(
            (L, total_pages, KH, page_size, HD), dtype
        )
        # Page 0 is a sentinel for unused table entries; the LAST page is
        # the scratch target for inactive-row writes. Neither is allocated.
        self.free_pages = list(range(1, total_pages - 1))
        self.row_pages: List[List[int]] = [[] for _ in range(max_batch)]
        self.lengths = np.zeros((max_batch,), np.int32)
        self.table = np.zeros((max_batch, self.p_max), np.int32)

    # ---- paged allocation ----

    def _alloc(self, n: int) -> List[int]:
        if len(self.free_pages) < n:
            raise RuntimeError(
                f"page pool exhausted: need {n}, free {len(self.free_pages)}"
            )
        out = self.free_pages[:n]
        del self.free_pages[:n]
        return out

    def _free_row(self, slot: int) -> None:
        self.free_pages.extend(self.row_pages[slot])
        self.row_pages[slot] = []
        self.lengths[slot] = 0
        self.table[slot, :] = 0

    def _admit(self):
        events = super()._admit()
        # Requests that finished AT admission (EOS on first token /
        # max_new_tokens <= 1) vacated their slot; reclaim their pages.
        for slot in range(self.max_batch):
            if not self.active[slot] and self.row_pages[slot]:
                self._free_row(slot)
        return events

    # ---- overridden request lifecycle ----

    def _prefill(self, req: Request, slot: int) -> int:
        cfg = self.cfg
        from vcoder_tpu.multimodal import build_splice_plan

        plan_kwargs = dict(
            num_patches=cfg.vision.num_patches,
            has_image=req.images is not None,
            has_seg=req.segs is not None,
            has_depth=req.depths is not None,
            ds_mode=cfg.model_type == "vcoder_ds_llava",
            it_mode=cfg.model_type == "vcoder_it_llava",
        )
        probe = build_splice_plan(
            [req.input_ids], pad_multiple=1, **plan_kwargs
        )
        exact = int(probe.seq_lens[0])
        if exact > self.max_len - 1:
            raise ValueError(
                f"prompt expands to {exact} tokens; max_len {self.max_len}"
            )
        pad_to = min(_bucket(exact), self.max_len)
        pad_to = -(-pad_to // self.page_size) * self.page_size
        plan = build_splice_plan(
            [req.input_ids], pad_to=pad_to, **plan_kwargs
        )
        req.prompt_len = exact

        n_used = -(-exact // self.page_size)
        n_insert = pad_to // self.page_size
        ids = self._alloc(n_insert)

        arrays = model_mod.plan_to_arrays(plan)
        dummy = jnp.zeros((0,), jnp.float32)
        dtype = self.params["lm"]["embed_tokens"].dtype

        def px(x):
            return jnp.asarray(x, dtype) if x is not None else dummy

        logits, self.k_pages, self.v_pages = _prefill_to_pages(
            self.params,
            cfg,
            arrays,
            px(req.images),
            px(req.segs),
            px(req.depths),
            self.k_pages,
            self.v_pages,
            jnp.asarray(ids, jnp.int32),
            use_vcoder_emb=plan.use_vcoder_emb and cfg.use_vcoder_lm_emb,
            has_images=req.images is not None,
            has_segs=req.segs is not None,
            has_depths=req.depths is not None,
            attn_impl=self.attn_impl,
            n_new_pages=n_insert,
        )
        # Keep only the pages covering real tokens; padding pages recycle
        # (their stale contents sit beyond every owner's length).
        self.row_pages[slot] = ids[:n_used]
        self.free_pages.extend(ids[n_used:])
        self.lengths[slot] = exact
        self.table[slot, :] = 0
        self.table[slot, : n_used] = self.row_pages[slot]

        if req.temperature > 0.0:
            self.rng, sub = jax.random.split(self.rng)
            tok = int(jax.random.categorical(sub, logits / req.temperature))
        else:
            tok = int(jnp.argmax(logits))
        return tok

    def step(self) -> List[Tuple[int, int, bool]]:
        events = self._admit()
        if not any(self.active):
            return events

        # Ensure every active row has a page for its next position.
        for slot in range(self.max_batch):
            if not self.active[slot]:
                continue
            pos = int(self.lengths[slot])
            if pos % self.page_size == 0:
                needed_idx = pos // self.page_size
                if needed_idx >= self.p_max:
                    continue  # max-length handling below ends the request
                pid = self._alloc(1)[0]
                self.row_pages[slot].append(pid)
                self.table[slot, needed_idx] = pid

        self.rng, sub = jax.random.split(self.rng)
        with self.timer.measure("decode_step"):
            nxt, self.k_pages, self.v_pages = _paged_decode_all(
                self.params,
                self.cfg,
                self.tokens,
                self.k_pages,
                self.v_pages,
                jnp.asarray(self.table),
                jnp.asarray(self.lengths),
                jnp.asarray(self.active),
                jnp.asarray(self.temps),
                sub,
                attn_impl=self.attn_impl,
            )
            self.tokens = nxt
            nxt_host = np.asarray(nxt)
        self.lengths += self.active.astype(np.int32)

        for slot, req in enumerate(self.slots):
            if req is None or not self.active[slot]:
                continue
            tok = int(nxt_host[slot])
            req.generated.append(tok)
            done = (
                tok == self.eos_id
                or len(req.generated) >= req.max_new_tokens
                or int(self.lengths[slot]) >= self.max_len - 1
            )
            events.append((req.request_id, tok, done))
            if done:
                req.done = True
                self.active[slot] = False
                self.slots[slot] = None
                self._free_row(slot)
        return events
