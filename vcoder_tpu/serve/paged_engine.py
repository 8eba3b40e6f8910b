"""Paged-KV continuous-batching engine.

The slot engine (serve/engine.py) reserves ``max_len`` cache tokens per
slot; VCoder's requests are ragged (1/2/3 modalities -> 576/1152/1728
vision tokens + text), so slots strand HBM. This engine packs KV into
fixed-size pages with a host-side free-list allocator and decodes through
the Pallas paged-attention kernel — the BASELINE.json north star's
"continuous-batched decode with a Pallas paged KV-cache".

Memory: page pools [L, n_pages, KH, page, HD]; a request holds exactly
ceil(context/page) pages, freed on completion. Prefill runs the fused
dense graph at bucketed lengths (compute-optimal, one compile per
bucket), then a separate small jitted scatter moves its KV into pages
(one compile per page count). Pool exhaustion defers admission; a
boundary-allocation failure mid-generation ends only that request.
"""

from __future__ import annotations

import time
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vcoder_tpu.config import VCoderConfig
from vcoder_tpu.models import llama as llama_mod
from vcoder_tpu.models import vcoder as model_mod
from vcoder_tpu.models.llama import KVCache
from vcoder_tpu.ops.paged_attention import write_prompt_pages
from vcoder_tpu.serve.engine import DeferAdmission, Request, ServingEngine
from vcoder_tpu.serve.prefix_cache import (
    PrefixIndex,
    chain_hashes,
    content_key_ids,
)


@partial(
    jax.jit,
    static_argnames=("cfg", "use_vcoder_emb", "has_images", "has_segs",
                     "has_depths", "attn_impl"),
)
def _dense_prefill(
    params,
    cfg: VCoderConfig,
    plan_arrays,
    images,
    segs,
    depths,
    *,
    use_vcoder_emb: bool,
    has_images: bool,
    has_segs: bool,
    has_depths: bool,
    attn_impl: str,
):
    """Fused dense prefill into a temporary cache (compiled per length
    bucket, independent of page accounting)."""
    T = plan_arrays["safe_ids"].shape[1]
    tmp = KVCache.create(
        cfg.text, 1, T, dtype=params["lm"]["embed_tokens"].dtype
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
    return logits[0], tmp.k, tmp.v


@partial(jax.jit, static_argnames=("n_pages_used",), donate_argnums=(0, 1))
def _scatter_pages(
    k_pages,  # [L, n_pages, KH, page, HD]
    v_pages,
    tmp_k,  # [L, 1, T, KH, HD]
    tmp_v,
    page_ids,  # [n_pages_used] int32
    *,
    n_pages_used: int,
):
    """Move a prompt's KV into its pages (cheap; compiled per page count).
    Only the first n_pages_used * page tokens scatter — padding KV past
    the prompt never lands in the pool."""
    page = k_pages.shape[3]
    T_used = n_pages_used * page

    def one_layer(pages, kv_l):
        # kv_l: [T, KH, HD] (dense prompt slice)
        return write_prompt_pages(pages, kv_l, page_ids)

    k_pages = jax.vmap(one_layer)(k_pages, tmp_k[:, 0, :T_used])
    v_pages = jax.vmap(one_layer)(v_pages, tmp_v[:, 0, :T_used])
    return k_pages, v_pages


@partial(
    jax.jit, static_argnames=("n_pages_used",), donate_argnums=(0, 1, 2, 3)
)
def _scatter_pages_q8(
    k_pages,  # [L, n_pages, KH, page, HD] int8
    v_pages,
    k_scale,  # [L, n_pages, KH, page] f32
    v_scale,
    tmp_k,  # [L, 1, T, KH, HD]
    tmp_v,
    page_ids,  # [n_pages_used] int32
    *,
    n_pages_used: int,
):
    """int8-pool variant of :func:`_scatter_pages`: quantize the prompt's
    KV per token vector (the dense cache's ``_kv_quantize`` scheme) and
    scatter values + scales."""
    from vcoder_tpu.models.llama import _kv_quantize

    page = k_pages.shape[3]
    T_used = n_pages_used * page

    def one_layer(pages, kv_l):
        return write_prompt_pages(pages, kv_l, page_ids)

    def one_layer_scale(scales, s_l):
        # s_l: [T, KH] -> pages [n_pages, KH, page] via the D=1 path.
        L_pages = write_prompt_pages(
            scales[..., None], s_l[..., None], page_ids
        )
        return L_pages[..., 0]

    kq, ks = _kv_quantize(tmp_k[:, 0, :T_used])  # [L, T, KH, HD], [L,T,KH,1]
    vq, vs = _kv_quantize(tmp_v[:, 0, :T_used])
    k_pages = jax.vmap(one_layer)(k_pages, kq)
    v_pages = jax.vmap(one_layer)(v_pages, vq)
    k_scale = jax.vmap(one_layer_scale)(k_scale, ks[..., 0])
    v_scale = jax.vmap(one_layer_scale)(v_scale, vs[..., 0])
    return k_pages, v_pages, k_scale, v_scale


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "use_vcoder_emb", "has_images", "has_segs", "has_depths",
        "attn_impl",
    ),
)
def _plan_embeds(
    params,
    cfg: VCoderConfig,
    plan_arrays,
    images,
    segs,
    depths,
    *,
    use_vcoder_emb: bool,
    has_images: bool,
    has_segs: bool,
    has_depths: bool,
    attn_impl: str,
):
    """Spliced embedding sequence [1, T_pad, D] of a planned request —
    the embedding half of the prefill graph, for suffix prefill over
    cached prefix pages whose suffix contains vision positions.

    Pixels are cast to the embed dtype HERE (free, fuses into the tower):
    casting f32->bf16 on the host via numpy/ml_dtypes is an elementwise
    C loop that cost >1 s for a gb=8 three-modality stack (round-5
    _build_group attribution), so callers ship raw f32."""
    dtype = params["lm"]["embed_tokens"].dtype
    cast = lambda x: None if x is None else x.astype(dtype)
    images, segs, depths = cast(images), cast(segs), cast(depths)
    vis_table = None
    if has_images:
        vis_table = model_mod.encode_vision(
            params,
            cfg,
            images,
            segs if has_segs else None,
            depths if has_depths else None,
            attn_impl=attn_impl,
        )
    return model_mod.assemble_embeddings(
        params,
        cfg,
        plan_arrays["safe_ids"],
        plan_arrays["is_text"],
        plan_arrays["vis_idx"],
        vis_table,
        use_vcoder_emb=use_vcoder_emb,
    )


@partial(
    jax.jit,
    static_argnames=("cfg", "kc", "text_mode"),
    donate_argnums=(3, 4, 5, 6),
)
def _group_chunk(
    params,
    cfg: VCoderConfig,
    source,  # [G, T, D] spliced embeds (vision) or [G, T] int32 ids (text)
    k_pages,
    v_pages,
    k_scale,  # dummy () leaves when unquantized
    v_scale,
    tables,  # [G, P_max] — each row's pages (reused prefix + fresh)
    starts,  # [G] int32: absolute position of each row's region start
    off,  # [] int32: group cursor (uniform — rows advance in lockstep)
    active,  # [G] bool: rows still inside their region
    use_vemb,  # [] bool: TRACED (vemb/plain traffic shares one graph —
    #             every extra static here is a 20-40 s cold compile)
    *,
    kc: int,
    text_mode: bool,
):
    """One BATCHED chunk of region prefill over paged KV: the speculative
    verify forward doubles as a chunked prefill for G admissions at once
    (append each row's chunk KV into its own pages, attend each token
    causally to that row's cached prefix + its own window). Batching is
    the round-4 admission-latency fix: G concurrent admissions stream the
    weights ONCE per chunk step instead of once per chunk per request.

    Per-row slack is masked, not specialized: rows past their region ride
    along inactive (writes target the scratch page), and a row's final
    chunk may overhang its region — those pad positions map to table
    entries past the row's pages (the sentinel; gathers clamp), and the
    kernel's causal window masking keeps valid tokens from ever attending
    them. Returns (hidden [G, kc, D], pools...)."""
    quantized = k_scale is not None and k_scale.ndim == 4
    s = starts + off  # [G]
    slice_row = lambda row, st: jax.lax.dynamic_slice_in_dim(row, st, kc, 0)
    if text_mode:
        ids = jax.vmap(slice_row)(source, s)  # [G, kc]
        if "vcoder_lm_emb" in params:
            embeds = jax.lax.cond(
                use_vemb,
                lambda: jnp.take(params["vcoder_lm_emb"], ids, axis=0),
                lambda: jnp.take(params["lm"]["embed_tokens"], ids, axis=0),
            )
        else:
            embeds = jnp.take(params["lm"]["embed_tokens"], ids, axis=0)
    else:
        embeds = jax.vmap(slice_row)(source, s)  # [G, kc, D]
    positions = s[:, None] + jnp.arange(kc, dtype=jnp.int32)[None, :]
    out = llama_mod.llama_paged_verify(
        params["lm"],
        cfg.text,
        embeds,
        positions,
        k_pages,
        v_pages,
        tables,
        s,
        active,
        k_scale=k_scale if quantized else None,
        v_scale=v_scale if quantized else None,
        interpret=jax.default_backend() != "tpu",
        # Region starts are m*page and off advances by kc, so every
        # chunk window is page-aligned whenever kc is a page multiple —
        # the page-granular append (measured 179 -> ~6 ms per int8 pool
        # per G=8 chunk, scripts/bench_group_chunk.py).
        page_aligned=kc % k_pages.shape[3] == 0,
    )
    if quantized:
        return out
    # Pass the donated dummy scale leaves through so the caller's
    # rebinding stays uniform (donation invalidates the inputs).
    return out + (k_scale, v_scale)


@partial(
    jax.jit,
    static_argnames=("cfg", "has_images", "has_segs", "has_depths",
                     "attn_impl"),
)
def _encode_vision_group(
    params, cfg: VCoderConfig, images, segs, depths, *,
    has_images: bool, has_segs: bool, has_depths: bool, attn_impl: str,
):
    """Tower-only half of the group source build -> vision table
    [G, N_vis, D]. Split from the splice so per-request tables can be
    CACHED by pixel digest (turn-2+ and shared-media traffic skips both
    the pixel H2D and the tower forward). Pixels arrive raw f32; cast
    here (fuses into the tower)."""
    dtype = params["lm"]["embed_tokens"].dtype
    cast = lambda x: None if x is None else x.astype(dtype)
    return model_mod.encode_vision(
        params,
        cfg,
        cast(images) if has_images else None,
        cast(segs) if has_segs else None,
        cast(depths) if has_depths else None,
        attn_impl=attn_impl,
    )


@jax.jit
def _assemble_group(params, plan_arrays, vis_table, use_vemb):
    """Splice half: text/vision gathers over a (possibly cached) vision
    table. use_vemb is TRACED (both embed routes share one graph, like
    _group_chunk)."""
    safe_ids = plan_arrays["safe_ids"]
    if "vcoder_lm_emb" in params:
        table = jax.lax.cond(
            use_vemb,
            lambda: params["vcoder_lm_emb"],
            lambda: params["lm"]["embed_tokens"],
        )
    else:
        table = params["lm"]["embed_tokens"]
    text_e = jnp.take(table, safe_ids, axis=0)
    vis_e = jnp.take_along_axis(
        vis_table, plan_arrays["vis_idx"][:, :, None], axis=1
    ).astype(text_e.dtype)
    return jnp.where(plan_arrays["is_text"][:, :, None], text_e, vis_e)


@jax.jit
def _hidden_logits(params, hidden, row, idx):
    """lm_head at one position of one row of a chunk's hidden states
    -> [V]."""
    h = jax.lax.dynamic_slice(
        hidden, (row, idx, jnp.int32(0)), (1, 1, hidden.shape[-1])
    )
    return llama_mod.lm_head(params["lm"], h)[0, 0]


@jax.jit
def _hidden_logits_group(params, hidden, idxs):
    """lm_head at one (clipped) position of EVERY row of a chunk's
    hidden states -> [G, V]: one dispatch + one fetch for all rows
    finishing in the same chunk, instead of a tunnel round trip per row
    (the round-5 probe measured the per-row path at ~1.2 s of the
    lockstep group's final step). Rows not finishing this chunk get
    garbage (clipped) positions — callers read only finishing rows."""
    G, kc, D = hidden.shape
    idxs = jnp.clip(idxs, 0, kc - 1)
    h = jnp.take_along_axis(hidden, idxs[:, None, None], axis=1)  # [G,1,D]
    return llama_mod.lm_head(params["lm"], h)[:, 0]


@partial(
    jax.jit,
    static_argnames=("cfg", "nucleus", "sharded"),
    donate_argnums=(3, 4, 5, 6),
)
def _paged_decode_all(
    params,
    cfg: VCoderConfig,
    tokens,  # [B]
    k_pages,
    v_pages,
    k_scale,  # [L, n_pages, KH, page] f32 or dummy () when unquantized
    v_scale,
    page_table,  # [B, P_max]
    lengths,  # [B]
    active,  # [B] bool
    temperature,  # [B] f32
    top_p,  # [B] f32
    rng,
    *,
    nucleus: bool = False,
    sharded: bool = False,  # jit-cache key: trace reads the ambient mesh
):
    from vcoder_tpu.generation import sample_token_batch

    quantized = k_scale is not None and k_scale.ndim == 4
    embeds = llama_mod.embed_tokens(params["lm"], tokens[:, None])
    out = llama_mod.llama_paged_decode(
        params["lm"],
        cfg.text,
        embeds,
        lengths,  # next position == current length
        k_pages,
        v_pages,
        page_table,
        lengths,
        active,
        k_scale=k_scale if quantized else None,
        v_scale=v_scale if quantized else None,
        # The paged kernel has no XLA twin; interpret off-TPU.
        interpret=jax.default_backend() != "tpu",
    )
    if quantized:
        hidden, k_pages, v_pages, k_scale, v_scale = out
    else:
        hidden, k_pages, v_pages = out
    logits = llama_mod.lm_head(params["lm"], hidden)[:, 0]
    nxt = sample_token_batch(logits, rng, temperature, top_p, nucleus=nucleus)
    return nxt, k_pages, v_pages, k_scale, v_scale


@partial(
    jax.jit,
    static_argnames=("cfg", "steps", "nucleus", "sharded"),
    donate_argnums=(3, 4, 5, 6),
)
def _paged_decode_all_n(
    params,
    cfg: VCoderConfig,
    tokens,
    k_pages,
    v_pages,
    k_scale,
    v_scale,
    page_table,
    lengths,  # [B] tokens BEFORE the window
    active,
    temperature,
    top_p,
    rng,
    *,
    steps: int,
    nucleus: bool = False,
    sharded: bool = False,
):
    """``steps`` paged decode steps in ONE dispatch (engine windowed
    sync; see ServingEngine). Returns ([steps, B] tokens, last tokens,
    pools). Per-row lengths advance by ``active`` inside the loop; the
    host adds steps*active after. bf16 engines pin the stacked q/k/v
    projections to the serving layout first (engine
    ``apply_serving_layout``) so the loop compiles without weight
    relayout copies."""
    B = tokens.shape[0]
    buf = jnp.zeros((steps, B), jnp.int32)
    act32 = active.astype(jnp.int32)

    def body(i, carry):
        tokens, k_pages, v_pages, k_scale, v_scale, buf, rng = carry
        rng, sub = jax.random.split(rng)
        nxt, k_pages, v_pages, k_scale, v_scale = _paged_decode_all(
            params,
            cfg,
            tokens,
            k_pages,
            v_pages,
            k_scale,
            v_scale,
            page_table,
            lengths + i * act32,
            active,
            temperature,
            top_p,
            sub,
            nucleus=nucleus,
            sharded=sharded,
        )
        return nxt, k_pages, v_pages, k_scale, v_scale, buf.at[i].set(nxt), rng

    carry = (tokens, k_pages, v_pages, k_scale, v_scale, buf, rng)
    carry = jax.lax.fori_loop(0, steps, body, carry)
    tokens, k_pages, v_pages, k_scale, v_scale, buf, _ = carry
    return buf, tokens, k_pages, v_pages, k_scale, v_scale


@partial(
    jax.jit,
    static_argnames=("cfg", "eos_id", "nucleus", "sharded"),
    donate_argnums=(4, 5, 6, 7),
)
def _paged_spec_decode_all(
    params,
    cfg: VCoderConfig,
    tokens,  # [B] current token per slot (KV not yet written)
    draft,  # [B, k-1] prompt-lookup drafts
    k_pages,
    v_pages,
    k_scale,  # dummy () leaves when unquantized
    v_scale,
    page_table,  # [B, P_max]
    lengths,  # [B] tokens BEFORE this window
    active,  # [B] bool
    budget,  # [B] int32
    temperature,  # [B] f32
    top_p,  # [B] f32
    rng,
    eos_id: int,
    nucleus: bool = False,
    sharded: bool = False,
):
    """Speculative verify step over paged KV (the paged analogue of
    engine._spec_decode_all): returns (outs [B, k], emit [B], nxt [B],
    pools...). The host applies emit to its lengths/table bookkeeping."""
    from vcoder_tpu.speculative import accept_window

    quantized = k_scale is not None and k_scale.ndim == 4
    B = tokens.shape[0]
    k = 1 + draft.shape[1]
    ids = jnp.concatenate([tokens[:, None], draft], axis=1)
    embeds = llama_mod.embed_tokens(params["lm"], ids)
    positions = lengths[:, None] + jnp.arange(k, dtype=jnp.int32)[None, :]
    out = llama_mod.llama_paged_verify(
        params["lm"],
        cfg.text,
        embeds,
        positions,
        k_pages,
        v_pages,
        page_table,
        lengths,
        active,
        k_scale=k_scale if quantized else None,
        v_scale=v_scale if quantized else None,
        interpret=jax.default_backend() != "tpu",
    )
    hidden, pools = out[0], out[1:]
    logits = llama_mod.lm_head(params["lm"], hidden)  # [B, k, V]
    pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    # Sampling rows: temperature + top_p draw from the first position,
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
    nxt = jnp.where(emit > 0, nxt, tokens)
    return (outs, emit, nxt) + pools


# Pending-prefill groups pad their batch to the nearest bucket (inactive
# pad rows write to the scratch page) so concurrent-admission traffic
# compiles a handful of chunk shapes instead of one per batch size.
_G_BUCKETS = (1, 2, 4, 8)


def _g_bucket(n: int) -> int:
    for b in _G_BUCKETS:
        if n <= b:
            return b
    return _G_BUCKETS[-1]


class _RegionRow:
    """Bookkeeping for one request's resumable paged region prefill.

    The compute state (stacked embeddings/ids, page tables, cursor) lives
    on the :class:`_PrefillGroup` the row belongs to; the row keeps the
    request-level facts `_finish_admission` needs — its pages, prefix-hit
    depth, hashes, and (once the chunk containing the last prompt token
    has run) the first-token logits."""

    __slots__ = (
        "req", "row_ids", "m", "hashes", "start", "region", "last_idx",
        "logits", "slot", "t0", "done",
    )

    def __init__(self, *, req, row_ids, m, start, region, last_idx):
        self.req = req
        self.row_ids = row_ids
        self.m = m
        self.hashes: List[bytes] = []
        self.start = start
        self.region = region
        self.last_idx = last_idx
        self.logits = None
        self.slot = -1
        self.t0 = 0.0
        self.done = False


class _PrefillGroup:
    """A lockstep batch of pending region prefills sharing one compiled
    chunk graph: same padded length, modality signature, embed route, and
    adapter. `_advance_group` runs ONE `[G, kc]` verify dispatch per call;
    rows whose region ends early ride along inactive until the group
    drains (their slack is at most a chunk)."""

    __slots__ = (
        "rows", "params", "source", "text_mode", "use_vemb", "tables",
        "starts", "off", "chunk", "gb", "max_region", "admit",
        "_active_dev", "_active_dirty",
    )

    def __init__(self, *, rows, params, source, text_mode, use_vemb,
                 tables, starts, chunk, admit):
        self.rows: List[_RegionRow] = rows
        self.params = params
        self.source = source  # [Gb, T, D] embeds or [Gb, T] ids (device)
        self.text_mode = text_mode
        self.use_vemb = use_vemb
        self.tables = tables  # [Gb, P_max] device
        self.starts = starts  # [Gb] device
        self.off = 0
        self.chunk = chunk
        self.gb = int(tables.shape[0])
        self.max_region = max(rp.region for rp in rows)
        self.admit = admit  # finish rows into decode slots as they drain
        self._active_dev = None
        self._active_dirty = True

    @property
    def done(self) -> bool:
        return all(rp.done for rp in self.rows)

    def active_dev(self):
        if self._active_dirty:
            act = np.zeros((self.gb,), bool)
            for i, rp in enumerate(self.rows):
                act[i] = not rp.done
            self._active_dev = jnp.asarray(act)
            self._active_dirty = False
        return self._active_dev


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
        mesh=None,
        kv_quant: bool = False,
        speculative: int = 0,
        sync_every: int = 1,
        prefix_cache: bool = False,
        prefix_chunk: int = 128,
        prefix_max_suffix: int = 1024,
        chunked_prefill: int = 0,
        lora_adapters=None,
        eos_id: Optional[int] = None,
    ):
        assert max_len % page_size == 0, (
            f"max_len {max_len} must be a multiple of page_size {page_size}"
        )
        if kv_quant and jax.default_backend() == "tpu":
            # Mosaic tiling constraint on the f32 scale-page DMA: int8
            # pools need 128-token pages on hardware (interpret mode —
            # CPU tests — takes any size).
            assert page_size % 128 == 0, (
                f"kv_quant on TPU requires page_size % 128 == 0,"
                f" got {page_size}"
            )
        self.page_size = page_size
        # Multi-chip: rows (and their page-pool slices) shard over
        # data x fsdp, heads over model (ops/paged_attention.py sharded
        # wrappers). Page ids are GLOBAL; each row-shard owns the id range
        # [s * pages_per_shard, (s+1) * pages_per_shard).
        self.mesh = mesh if (mesh is not None and mesh.size > 1) else None
        if self.mesh is not None:
            row_shards = mesh.shape["data"] * mesh.shape["fsdp"]
            assert max_batch % row_shards == 0, (
                f"max_batch {max_batch} must divide over"
                f" data*fsdp={row_shards} row shards"
            )
            assert cfg.text.num_heads % mesh.shape["model"] == 0, (
                "num_heads must divide the model axis"
            )
        else:
            row_shards = 1
        self.row_shards = row_shards
        self.rows_per_shard = max_batch // row_shards
        super().__init__(
            cfg,
            params,
            max_batch=max_batch,
            max_len=max_len,
            attn_impl=attn_impl,
            seed=seed,
            speculative=speculative,
            sync_every=sync_every,
            lora_adapters=lora_adapters,
            eos_id=eos_id,
        )
        # Speculative windows overshoot a row's accepted length by up to
        # spec_k rejected tokens, and sync windows by up to sync_every-1
        # late-discovered tokens; the table covers that slack so writes
        # never need a page past p_max.
        self.p_max = -(
            -(max_len + max(self.spec_k, self.sync_every)) // page_size
        )
        if total_pages is None:
            # Default: enough for every slot at max_len plus a per-shard
            # sentinel + scratch. Set lower to oversubscribe (the point of
            # paging).
            total_pages = row_shards * (
                self.rows_per_shard * self.p_max + 2
            )
        assert total_pages % row_shards == 0, (
            f"total_pages {total_pages} must divide over {row_shards}"
            " row shards"
        )
        self.total_pages = total_pages
        self.pages_per_shard = total_pages // row_shards
        assert self.pages_per_shard >= 3, "need sentinel + scratch + 1 page"
        L = cfg.text.num_layers
        KH, HD = cfg.text.num_kv_heads, cfg.text.head_dim
        # int8 pages (per-token-per-head scales) halve the page-pool HBM —
        # the serving-capacity limit at 13B — and halve the cache bytes
        # each decode step streams.
        self.kv_quant = kv_quant
        dtype = (
            jnp.int8 if kv_quant else params["lm"]["embed_tokens"].dtype
        )
        self.k_pages = jnp.zeros(
            (L, total_pages, KH, page_size, HD), dtype
        )
        self.v_pages = jnp.zeros(
            (L, total_pages, KH, page_size, HD), dtype
        )
        if kv_quant:
            self.k_scale = jnp.zeros(
                (L, total_pages, KH, page_size), jnp.float32
            )
            self.v_scale = jnp.zeros(
                (L, total_pages, KH, page_size), jnp.float32
            )
        else:
            # Dummy leaves keep one _paged_decode_all signature; ndim != 4
            # selects the unquantized trace.
            self.k_scale = jnp.zeros((0,), jnp.float32)
            self.v_scale = jnp.zeros((0,), jnp.float32)
        if self.mesh is not None:
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P

            pool_sharding = NamedSharding(
                self.mesh, P(None, ("data", "fsdp"), "model", None, None)
            )
            self.k_pages = jax.device_put(self.k_pages, pool_sharding)
            self.v_pages = jax.device_put(self.v_pages, pool_sharding)
            if kv_quant:
                spool = NamedSharding(
                    self.mesh, P(None, ("data", "fsdp"), "model", None)
                )
                self.k_scale = jax.device_put(self.k_scale, spool)
                self.v_scale = jax.device_put(self.v_scale, spool)
        # Within each shard's slice, the local-first page is the sentinel
        # for unused table entries and the local-last page is the scratch
        # target for inactive-row writes. Neither is ever allocated.
        per = self.pages_per_shard
        self.free_pages: List[List[int]] = [
            list(range(s * per + 1, (s + 1) * per - 1))
            for s in range(row_shards)
        ]
        self.row_pages: List[List[int]] = [[] for _ in range(max_batch)]
        self.lengths = np.zeros((max_batch,), np.int32)
        # The page table only changes at prefill/allocation/free; cache
        # its device copy so steady-state decode skips the H2D upload.
        self._table_dirty = True
        self._table_dev = None
        self.table = np.zeros((max_batch, self.p_max), np.int32)
        for slot in range(max_batch):
            self.table[slot, :] = self._shard_of(slot) * per
        # Automatic prefix caching: full prompt pages are published under
        # chained content hashes; later requests map matching prefix pages
        # into their table and only the suffix runs through the model
        # (serve/prefix_cache.py). Single-device engines only: the chunked
        # suffix forward rides the B=1 verify path, which the shard_map
        # row sharding cannot take.
        if prefix_cache and self.mesh is not None:
            raise ValueError(
                "prefix_cache is single-device only (suffix prefill runs"
                " the B=1 verify path)"
            )
        self.prefix_idx: Optional[List[PrefixIndex]] = (
            [PrefixIndex() for _ in range(row_shards)]
            if prefix_cache
            else None
        )
        # Suffix chunks are multiples of page_size so the region tiles
        # with at most two compiled chunk shapes (the chunk and one
        # remainder multiple).
        self._chunk = max(
            prefix_chunk - prefix_chunk % page_size, page_size
        )
        self.prefix_max_suffix = prefix_max_suffix
        # Chunked prefill: admissions run `chunked_prefill`-token chunks
        # through the paged verify forward, ONE chunk per engine step, so
        # a long multimodal prompt (up to 2048 text + 1728 vision tokens)
        # never stalls in-flight decodes for more than a chunk. vLLM-style
        # prefill/decode interleaving; the reference blocks its whole
        # generate loop on each admission (HF GenerationMixin is
        # strictly sequential, vcoder_llava/serve/chat.py:141-150).
        if chunked_prefill and self.mesh is not None:
            raise ValueError(
                "chunked_prefill is single-device only (chunks run the"
                " B=1 verify path)"
            )
        self._cp_chunk = (
            max(chunked_prefill - chunked_prefill % page_size, page_size)
            if chunked_prefill
            else 0
        )
        self._pending_groups: List[_PrefillGroup] = []
        # Requests requeued for recompute after losing their pages
        # (observability; tests assert the path actually fired).
        self.preemptions = 0
        # Batched-admission observability: size of every admit group
        # formed (tests assert concurrent traffic actually batches).
        self.admit_group_sizes: List[int] = []
        # Deferred first-token device writes (slot, token, request); see
        # _finish_admission/_flush_tokens.
        self._tok_writes: List[Tuple[int, int, "Request"]] = []
        # Device-resident vision-table LRU (pixel digest + adapter ->
        # [N_vis, D]); see _group_vis_tables. ~14 MB/entry at 7B.
        from collections import OrderedDict

        self._vis_cache: "OrderedDict" = OrderedDict()
        self._vis_cache_cap = max(16, max_batch)
        # Engine-constant group-buffer caps (see _build_group SHAPE
        # STABILITY): sources/tables pad to these so the compiled group
        # chunk graphs key only on (bucket, chunk size).
        max_chunk = max(self._chunk, self._cp_chunk)
        self._src_cap = self.p_max * page_size + max_chunk
        self._tbl_cap = self.p_max + max_chunk // page_size


    def _device_table(self):
        if self._table_dirty:
            self._table_dev = jnp.asarray(self.table)
            self._table_dirty = False
        return self._table_dev

    def _shard_of(self, slot: int) -> int:
        return slot // self.rows_per_shard

    def close(self) -> None:
        """Free the page pools — the paged engine's dominant HBM use
        (several GB at serving scale) — plus the base decode carries.
        Idempotent; shared ``params`` are left untouched."""
        if getattr(self, "_closed", False):
            return
        group_bufs = [
            [g.source, g.tables, g.starts] for g in self._pending_groups
        ]
        self._pending_groups = []
        for leaf in jax.tree_util.tree_leaves(
            [
                self.k_pages,
                self.v_pages,
                self.k_scale,
                self.v_scale,
                self._table_dev,
                group_bufs,
            ]
        ):
            if hasattr(leaf, "delete"):
                try:
                    leaf.delete()
                except Exception:
                    pass
        self.k_pages = self.v_pages = None
        self.k_scale = self.v_scale = None
        self._table_dev = None
        self._table_dirty = True
        super().close()

    def _make_cache(self):
        # No slot cache: KV lives in the page pools.
        return None

    # ---- paged allocation ----

    def _alloc(self, n: int, shard: int = 0) -> List[int]:
        free = self.free_pages[shard]
        if len(free) < n and self.prefix_idx is not None:
            # Cached-but-unreferenced prefix pages are reclaimable: evict
            # LRU-first until the allocation fits.
            free.extend(self.prefix_idx[shard].evict(n - len(free)))
        if len(free) < n:
            raise PoolExhausted(
                f"page pool exhausted (shard {shard}): need {n},"
                f" free {len(free)}"
            )
        out = free[:n]
        del free[:n]
        return out

    def _free_row(self, slot: int) -> None:
        shard = self._shard_of(slot)
        idx = self.prefix_idx[shard] if self.prefix_idx is not None else None
        for pid in self.row_pages[slot]:
            if idx is not None and idx.is_registered(pid):
                # Shared/published page: drop this row's reference; the
                # KV stays cached (evictable at zero refs) for reuse.
                idx.release(pid)
            else:
                self.free_pages[shard].append(pid)
        self.row_pages[slot] = []
        self.lengths[slot] = 0
        self.table[slot, :] = shard * self.pages_per_shard
        self._table_dirty = True

    def warmup_chunks(self, vision: bool = True) -> None:
        """Pre-compile the lockstep group-chunk graphs — one per (group
        bucket, chunk size, mode) shape the engine can form — so the
        first burst of concurrent admissions doesn't stall 20-40 s behind
        one XLA compile per new group size mid-traffic (the cold-start
        mode the round-5 wire bench caught: turn-1 p50 43.9 s). Sources
        pad to engine-constant caps (_build_group SHAPE STABILITY), so
        this covers EVERY prompt length.

        Runs each shape once with ALL rows inactive: kernel writes park
        on the scratch page and the pools pass through bit-unchanged, so
        this is safe on a live engine between steps. ``vision`` also
        warms the vision-mode group graphs (batched tower encode +
        embeds-source verify) — the production hot path, since a turn-1
        region after a prefix hit usually straddles the vision span's
        tail. Cold this is minutes of XLA compiles; the persistent
        compilation cache (vcoder_tpu/__init__) makes it near-free on
        every later process.
        """
        shapes = []
        if self._cp_chunk:
            shapes += [(gb, self._cp_chunk) for gb in _G_BUCKETS]
        if not any(kc == self._chunk for _, kc in shapes):
            # The prefix-cache suffix path always forms singletons.
            shapes.append((1, self._chunk))

        def run(gb, kc, source, *, text_mode):
            tables = jnp.zeros((gb, self._tbl_cap), jnp.int32)
            starts = jnp.zeros((gb,), jnp.int32)
            with self._mesh_ctx():
                out = _group_chunk(
                    self.params,
                    self.cfg,
                    source,
                    self.k_pages,
                    self.v_pages,
                    self.k_scale,
                    self.v_scale,
                    tables,
                    starts,
                    jnp.asarray(0, jnp.int32),
                    jnp.zeros((gb,), bool),
                    jnp.asarray(False, bool),
                    kc=kc,
                    text_mode=text_mode,
                )
                # Warm the finish-path lm_head for this (gb, kc) too —
                # it otherwise compiles mid-traffic at the FIRST group
                # finish (caught as a >10 s phase-A stall, round 5).
                _hidden_logits_group(
                    self.params, out[0],
                    jnp.zeros((gb,), jnp.int32),
                )
            (_, self.k_pages, self.v_pages,
             self.k_scale, self.v_scale) = out

        for gb, kc in shapes:
            run(gb, kc, jnp.zeros((gb, self._src_cap), jnp.int32),
                text_mode=True)
        if vision:
            vshapes = (
                [(gb, self._cp_chunk) for gb in _G_BUCKETS]
                if self._cp_chunk
                else []
            )
            if not any(kc == self._chunk for _, kc in vshapes):
                vshapes.append((1, self._chunk))
            hw = self.cfg.vision.image_size
            use_vemb = self.cfg.use_vcoder_lm_emb
            # Encode buckets (cache-miss batches) and the assemble/chunk
            # buckets compile independently.
            tbl = None
            for mb in sorted({gbk for gbk, _ in vshapes}):
                px = jnp.zeros((mb, hw, hw, 3), jnp.float32)
                with self._mesh_ctx():
                    tbl = _encode_vision_group(
                        self.params,
                        self.cfg,
                        px,
                        px if self.cfg.use_seg else None,
                        px if self.cfg.use_depth else None,
                        has_images=True,
                        has_segs=self.cfg.use_seg,
                        has_depths=self.cfg.use_depth,
                        attn_impl=self.attn_impl,
                    )
            n_vis = tbl.shape[1]
            for gb, vkc in vshapes:
                plan_arrays = {
                    "safe_ids": jnp.zeros((gb, self._src_cap), jnp.int32),
                    "is_text": jnp.ones((gb, self._src_cap), bool),
                    "vis_idx": jnp.zeros((gb, self._src_cap), jnp.int32),
                }
                with self._mesh_ctx():
                    source = _assemble_group(
                        self.params,
                        plan_arrays,
                        jnp.zeros((gb, n_vis, tbl.shape[2]), tbl.dtype),
                        jnp.asarray(use_vemb, bool),
                    )
                run(gb, vkc, source, text_mode=False)
        jax.block_until_ready(self.k_pages)

    def prefix_stats(self) -> dict:
        """Aggregate prefix-cache counters across shards (zeros when the
        cache is disabled)."""
        out = {
            "hits": 0, "misses": 0, "reused_pages": 0,
            "evicted": 0, "cached_pages": 0,
        }
        for idx in self.prefix_idx or []:
            for k, v in idx.stats().items():
                out[k] += v
        return out

    # ---- request lifecycle ----

    @property
    def _pending(self) -> Optional[_RegionRow]:
        """First still-prefilling pending row, or None (observability +
        the `_ensure_pages` may-free-pages-later signal)."""
        for g in self._pending_groups:
            for rp in g.rows:
                if not rp.done:
                    return rp
        return None

    def has_work(self) -> bool:
        return super().has_work() or self._pending is not None

    def cancel(self, request_id: int) -> bool:
        for g in self._pending_groups:
            for rp in g.rows:
                if rp.done or rp.req.request_id != request_id:
                    continue
                # Mid-chunked-prefill: return the region's pages. Reused
                # prefix pages hold a reference (match() took one); fresh
                # pages go straight back to the free list — the same
                # split `_free_row` applies. The row stays in its group
                # as an inactive lane (no writes) until the group drains.
                rp.done = True
                g._active_dirty = True
                rp.req.done = True
                shard = rp.row_ids[0] // self.pages_per_shard
                idx = (
                    self.prefix_idx[shard]
                    if self.prefix_idx is not None
                    else None
                )
                for pid in rp.row_ids:
                    if idx is not None and idx.is_registered(pid):
                        idx.release(pid)
                    else:
                        self.free_pages[shard].append(pid)
                if g.done:
                    self._pending_groups.remove(g)
                return True
        return super().cancel(request_id)

    def _admit(self):
        # Reclaim before admitting (a slot vacated by the previous decode
        # window still holds pages the incoming allocation may need) ...
        self._reclaim_vacated()
        if self._cp_chunk:
            events = self._admit_chunked()
        else:
            events = super()._admit()
        # ... and after: requests that finished AT admission vacated
        # their slot inside the loop above.
        self._reclaim_vacated()
        return events

    def _reclaim_vacated(self) -> None:
        """Free pages still attached to empty inactive slots. A pending
        chunked prefill's slot legitimately holds pages while inactive —
        skip those."""
        pend_slots = {
            rp.slot
            for g in self._pending_groups
            for rp in g.rows
            if not rp.done
        }
        for slot in range(self.max_batch):
            if slot in pend_slots:
                continue
            if not self.active[slot] and self.slots[slot] is None:
                if self.row_pages[slot]:
                    self._free_row(slot)

    # ---- chunked admission (prefill/decode interleaving) ----

    def _admit_chunked(self) -> List[Tuple[int, int, bool]]:
        """Advance prefill work by one BATCHED chunk per step UNDER
        DECODE LOAD, or to completion when no row is decoding: chunking
        exists to bound how long in-flight decodes stall behind an
        admission, so with nothing to interleave against there is no
        reason to pay the per-chunk step tax (vLLM's token-budget rule:
        decode tokens and prefill chunks share one step budget, and an
        idle step's whole budget goes to prefill).

        Every queued request that can claim a slot + pages is staged
        immediately and compatible stages form lockstep groups
        (`_form_groups`), so K concurrent admissions cost ~one admission's
        chunk steps instead of K× — the round-4 1874 ms concurrent-TTFT
        fix."""
        events: List[Tuple[int, int, bool]] = []
        while True:
            with self.timer.measure("admit_stage"):
                events += self._fill_pending()
            if not self._pending_groups:
                break
            g = self._pending_groups[0]  # FIFO: drain the oldest first
            with self.timer.measure("admit_chunk"):
                events += self._advance_group(g)
            if g.done:
                self._pending_groups.pop(0)
            if any(self.active):
                # Decode work exists: at most one chunk this step.
                break
        return events

    def _fill_pending(self) -> List[Tuple[int, int, bool]]:
        """Stage every queued request that can claim a free slot (plan +
        page allocation + group formation); forwards run later, one
        batched chunk per `_advance_group` call.

        Requests whose prompt is mostly covered by an IN-FLIGHT
        admission's soon-to-be-published pages wait for that publication
        instead of staging a redundant re-prefill (`_WaitForPublish`);
        requests with little or no overlap stage concurrently — batching
        beats dedup when there is nothing substantial to dedup."""
        events: List[Tuple[int, int, bool]] = []
        claimed = set()
        inflight = set()
        page = self.page_size
        for g in self._pending_groups:
            for rp in g.rows:
                if rp.done or not g.admit:
                    continue
                claimed.add(rp.slot)
                inflight.update(rp.hashes[rp.m : rp.req.prompt_len // page])
        staged = []
        waiting: List[Request] = []
        while self.queue:
            free = [
                s
                for s in range(self.max_batch)
                if not self.active[s]
                and self.slots[s] is None
                and s not in claimed
            ]
            if not free:
                break
            req = self.queue.pop(0)
            try:
                st = self._stage_admission(
                    req, free[0], inflight, others_staged=bool(staged)
                )
            except ValueError as e:
                # Oversized prompt / pool too small: fail this request.
                req.done = True
                req.error = str(e)
                self._record_failure(req)
                events.append((req.request_id, self.eos_id, True))
                continue
            except _WaitForPublish:
                # Leave the slot unclaimed; retry next step (the
                # publisher finishing — or dying — unblocks it).
                waiting.append(req)
                continue
            except DeferAdmission:
                break
            claimed.add(free[0])
            staged.append(st)
            rp = st[0]
            inflight.update(rp.hashes[rp.m : req.prompt_len // page])
        self.queue[:0] = waiting
        if staged:
            self._pending_groups += self._form_groups(
                staged, chunk=self._cp_chunk, admit=True
            )
        return events

    def _stage_admission(self, req: Request, slot: int, inflight=(),
                         others_staged: bool = False):
        """Plan + allocate pages for a chunked admission; mirrors the
        front half of `_prefill` (including prefix-cache reuse and the
        defer-on-exhaustion rule) but defers the forward passes to the
        batched per-step `_advance_group` calls. Returns the staging
        tuple `_form_groups` consumes."""
        if self.row_pages[slot]:
            self._free_row(slot)
        t0 = time.perf_counter()
        pp = self._prefill_params(req)  # adapter view (ValueError early)
        plan, arrays, px = self._plan_request(req, pad_round=self.page_size)
        page = self.page_size
        shard = self._shard_of(slot)
        n_used = -(-req.prompt_len // page)

        idx = self.prefix_idx[shard] if self.prefix_idx is not None else None
        reused: List[int] = []
        hashes: List[bytes] = []
        if idx is not None:
            hashes = chain_hashes(
                content_key_ids(plan, req), page,
                salt=self._cache_salt(plan, req),
            )
            # No prefix_max_suffix bailout here: chunked mode never takes
            # the fused dense path, so a long suffix costs the same
            # either way and the reuse is pure win.
            reused = idx.match(hashes[: (req.prompt_len - 1) // page])
        m = len(reused)

        if inflight and hashes:
            # Overlap with pages an in-flight admission will publish
            # (chained hashes: consecutive membership == shared prefix).
            extra = 0
            for h in hashes[m : (req.prompt_len - 1) // page]:
                if h not in inflight:
                    break
                extra += 1
            if extra and 2 * extra >= n_used:
                # Most of this prompt is being computed RIGHT NOW by
                # another admission: wait for its pages instead of
                # re-prefilling them in parallel.
                for pid in reused:
                    idx.release(pid)
                raise _WaitForPublish()

        try:
            ids = self._alloc(n_used - m, shard)
        except PoolExhausted as e:
            for pid in reused:
                idx.release(pid)
            if (
                not any(self.active)
                and self._pending is None
                and not others_staged
            ):
                # Nothing decoding, nothing mid-prefill, nothing staged
                # ahead of this request: no pages will ever free — this
                # request can never fit.
                raise ValueError(str(e))
            self.queue.insert(0, req)
            raise DeferAdmission()

        rp = _RegionRow(
            req=req,
            row_ids=reused + ids,
            m=m,
            start=m * page,
            region=(n_used - m) * page,
            last_idx=req.prompt_len - 1 - m * page,
        )
        rp.hashes = hashes
        rp.slot = slot
        rp.t0 = t0
        return (rp, plan, pp, req)

    def _finish_admission(self, rp: "_RegionRow") -> List[Tuple[int, int, bool]]:
        """Activate a fully-prefilled pending request: publish its prefix
        pages, install its page-table row, sample the first token, and do
        the slot bookkeeping the base `_admit` does after `_prefill`."""
        req, slot = rp.req, rp.slot
        page = self.page_size
        n_used = len(rp.row_ids)
        shard = self._shard_of(slot)
        idx = self.prefix_idx[shard] if self.prefix_idx is not None else None
        if idx is not None:
            for i in range(rp.m, req.prompt_len // page):
                idx.register(rp.hashes[i], rp.row_ids[i])
        self.row_pages[slot] = rp.row_ids
        self.lengths[slot] = req.prompt_len
        self.table[slot, :] = shard * self.pages_per_shard
        self.table[slot, :n_used] = rp.row_ids
        self._table_dirty = True

        first_tok = self._sample_first(rp.logits, req)
        req.slot = slot
        req.generated.append(first_tok)
        self.slots[slot] = req
        self.active[slot] = True
        self.temps[slot] = req.temperature
        self.top_ps[slot] = req.top_p
        self._flags_dirty = True
        # Defer the device token write: each .at[slot].set is a tunnel
        # dispatch, so a lockstep group finishing G rows paid G round
        # trips. _flush_tokens applies the whole set as ONE scatter
        # before the next decode dispatch (request identity re-checked —
        # a released-and-reused slot drops its stale write).
        self._tok_writes.append((slot, first_tok, req))
        done = (
            first_tok == self.eos_id
            or len(req.generated) >= req.max_new_tokens
        )
        self._on_admitted(slot, req, first_tok, done)
        if done:
            req.done = True
            self._release_slot(slot)
        return [(req.request_id, first_tok, done)]

    def _cache_salt(self, plan, req: Request) -> str:
        """Prefix-cache partition key: everything beyond token/pixel
        content that changes the KV a prompt produces. Today that is the
        LoRA adapter (same tokens under adapters X and Y must not share
        pages) and the text-embedding route — a seg-carrying request
        embeds its TEXT positions through vcoder_lm_emb (multimodal.py
        use_vcoder_emb=has_seg) while a text/image-only request uses
        embed_tokens, so identical leading text produces different KV."""
        use_vemb = plan.use_vcoder_emb and self.cfg.use_vcoder_lm_emb
        return f"{req.lora or ''}|e{int(bool(use_vemb))}"

    def _prefill(self, req: Request, slot: int) -> int:
        # The previous occupant may have finished at admission and this
        # slot is being reused within the same _admit loop — reclaim.
        if self.row_pages[slot]:
            self._free_row(slot)

        pp = self._prefill_params(req)  # adapter view (ValueError early)
        plan, arrays, px = self._plan_request(
            req, pad_round=self.page_size
        )
        page = self.page_size
        shard = self._shard_of(slot)
        n_used = -(-req.prompt_len // page)

        # ---- prefix-cache lookup ----
        idx = self.prefix_idx[shard] if self.prefix_idx is not None else None
        reused: List[int] = []
        hashes: List[bytes] = []
        if idx is not None:
            hashes = chain_hashes(
                content_key_ids(plan, req), page,
                salt=self._cache_salt(plan, req),
            )
            # Keep >= 1 suffix token so first-token logits exist even
            # when the whole prompt is cached.
            reused = idx.match(hashes[: (req.prompt_len - 1) // page])
            if reused and (n_used - len(reused)) * page > self.prefix_max_suffix:
                # Long suffix: the fused dense prefill beats many chunked
                # verify dispatches — drop the reuse, re-prefill densely.
                for pid in reused:
                    idx.release(pid)
                reused = []
        m = len(reused)

        try:
            ids = self._alloc(n_used - m, shard)
        except PoolExhausted as e:
            for pid in reused:
                idx.release(pid)
            if not any(self.active):
                # Nothing running that could ever free pages: the pool is
                # simply too small for this request — fail it.
                raise ValueError(str(e))
            # Defer: requeue at the front and let the caller proceed with
            # whatever is running; pages free as requests finish.
            self.queue.insert(0, req)
            raise DeferAdmission()
        row_ids = reused + ids

        if m:
            logits = self._suffix_prefill(
                pp, req, plan, arrays, px, row_ids, m
            )
        else:
            logits = self._dense_prefill_scatter(
                pp, req, plan, arrays, px, ids
            )

        if idx is not None:
            # Publish this prompt's fully-covered pages (decode writes
            # land at positions >= prompt_len, so they stay immutable).
            for i in range(m, req.prompt_len // page):
                idx.register(hashes[i], row_ids[i])

        self.row_pages[slot] = row_ids
        self.lengths[slot] = req.prompt_len
        self.table[slot, :] = shard * self.pages_per_shard
        self.table[slot, :n_used] = row_ids
        self._table_dirty = True
        return self._sample_first(logits, req)

    def _dense_prefill_scatter(
        self, pp, req, plan, arrays, px, ids
    ) -> "jnp.ndarray":
        n_used = len(ids)
        with self._mesh_ctx():
            logits, tmp_k, tmp_v = _dense_prefill(
                pp,
                self.cfg,
                arrays,
                px(req.images),
                px(req.segs),
                px(req.depths),
                use_vcoder_emb=plan.use_vcoder_emb
                and self.cfg.use_vcoder_lm_emb,
                has_images=req.images is not None,
                has_segs=req.segs is not None,
                has_depths=req.depths is not None,
                attn_impl=self.attn_impl,
            )
            if self.kv_quant:
                (
                    self.k_pages,
                    self.v_pages,
                    self.k_scale,
                    self.v_scale,
                ) = _scatter_pages_q8(
                    self.k_pages,
                    self.v_pages,
                    self.k_scale,
                    self.v_scale,
                    tmp_k,
                    tmp_v,
                    jnp.asarray(ids, jnp.int32),
                    n_pages_used=n_used,
                )
            else:
                self.k_pages, self.v_pages = _scatter_pages(
                    self.k_pages,
                    self.v_pages,
                    tmp_k,
                    tmp_v,
                    jnp.asarray(ids, jnp.int32),
                    n_pages_used=n_used,
                )
        return logits

    def _suffix_prefill(self, pp, req, plan, arrays, px, row_ids, m):
        """Prefill only the suffix [m*page, ceil(prompt/page)*page) over
        the ``m`` reused prefix pages, in page-multiple chunks through the
        paged verify forward. Pads (tail of the last page) write garbage
        KV into this row's own pages at positions >= prompt_len — never
        attended (lengths bound reads) and overwritten by decode."""
        page = self.page_size
        rp = _RegionRow(
            req=req,
            row_ids=row_ids,
            m=m,
            start=m * page,
            region=(len(row_ids) - m) * page,
            last_idx=req.prompt_len - 1 - m * page,
        )
        g = self._form_groups(
            [(rp, plan, pp, req)], chunk=self._chunk, admit=False
        )[0]
        while not g.done:
            self._advance_group(g)
        return rp.logits

    def _form_groups(self, staged, *, chunk: int,
                     admit: bool) -> List["_PrefillGroup"]:
        """Partition staged admissions into lockstep-batchable groups.

        A group shares one compiled `[G, kc]` chunk graph, so rows must
        agree on everything that shapes it: padded plan length, the
        modality signature (which pixel stacks exist and their shapes —
        they stack into ONE batched vision encode), the text-embedding
        route, and the LoRA adapter (chunks run under the adapter's
        params view). Homogeneous traffic (the production shape) collapses
        into one group; mixed traffic degrades to smaller groups, worst
        case singletons — never an error."""
        by_key = {}
        for st in staged:
            rp, plan, pp, req = st
            T_pad = plan.safe_ids.shape[1]
            end = min(rp.start + rp.region, T_pad)
            # Skip the vision encode when every VALID region position is
            # text (the multi-turn hot path — images sit in the cached
            # prefix). Pad positions (>= seq_len) are is_text=False in
            # the plan but carry no content: including them routed pure-
            # text prompts with page-rounded tails into the vision-mode
            # graph (with no pixels to encode).
            end_valid = min(end, int(plan.seq_lens[0]))
            text_only = bool(
                plan.is_text[0, rp.start:end_valid].all()
            )
            use_vemb = plan.use_vcoder_emb and self.cfg.use_vcoder_lm_emb
            mods = (
                None
                if text_only
                else tuple(
                    np.asarray(x).shape if x is not None else None
                    for x in (req.images, req.segs, req.depths)
                )
            )
            key = (text_only, T_pad, use_vemb, req.lora, mods)
            by_key.setdefault(key, []).append(st)
        groups = []
        cap = _G_BUCKETS[-1]
        for (text_only, T_pad, use_vemb, _lora, _mods), items in (
            by_key.items()
        ):
            for i0 in range(0, len(items), cap):
                part = items[i0 : i0 + cap]
                if admit:
                    self.admit_group_sizes.append(len(part))
                groups.append(
                    self._build_group(
                        part,
                        text_only=text_only,
                        T_pad=T_pad,
                        use_vemb=use_vemb,
                        chunk=chunk,
                        admit=admit,
                    )
                )
        return groups

    def _group_vis_tables(self, items, gb: int, pp) -> jnp.ndarray:
        """Per-row vision tables [gb, N_vis, D] for a vision-mode group,
        through a device-resident LRU keyed by pixel digest (+ adapter).

        A full-prefix-hit turn paid the FULL three-modality tower encode
        plus the pixel H2D (~215 ms fixed per tunnel transfer) for a one-
        or-two-page suffix; repeated media (multi-turn, shared images)
        now reuses the cached table and ships nothing. Misses batch into
        one bucketed encode dispatch + ONE fused [n_mod, mb, H, W, C]
        raw-f32 transfer (host-side ml_dtypes casts cost >1 s; the jit
        casts on device). Pad rows repeat row 0 — their positions are
        is_text and never select vision values."""
        import hashlib

        keys = []
        for (_rp, _plan, _pp, req) in items:
            h = hashlib.sha256()
            for arr in (req.images, req.segs, req.depths):
                if arr is not None:
                    a = np.ascontiguousarray(arr)
                    h.update(str(a.shape).encode())
                    h.update(a.tobytes())
            keys.append((h.digest(), req.lora))

        getters = [
            ("images", lambda r: r.images),
            ("segs", lambda r: r.segs),
            ("depths", lambda r: r.depths),
        ]
        req0 = items[0][3]
        present = [
            (name, g) for name, g in getters if g(req0) is not None
        ]
        miss = [
            i for i, k in enumerate(keys) if k not in self._vis_cache
        ]
        if miss:
            mb = _g_bucket(len(miss))
            first = np.asarray(present[0][1](req0))
            stacked = np.zeros(
                (len(present), mb) + first.shape[1:], np.float32
            )
            for m, (_name, getter) in enumerate(present):
                for j, i in enumerate(miss):
                    stacked[m, j] = np.asarray(getter(items[i][3]))[0]
            dev = jnp.asarray(stacked)
            mod = {name: dev[m] for m, (name, _g) in enumerate(present)}
            with self._mesh_ctx():
                tbl = _encode_vision_group(
                    pp,
                    self.cfg,
                    mod.get("images"),
                    mod.get("segs"),
                    mod.get("depths"),
                    has_images="images" in mod,
                    has_segs="segs" in mod,
                    has_depths="depths" in mod,
                    attn_impl=self.attn_impl,
                )
            for j, i in enumerate(miss):
                self._vis_cache[keys[i]] = tbl[j]
        rows = []
        for k in keys:
            rows.append(self._vis_cache[k])
            self._vis_cache.move_to_end(k)
        # Evict AFTER touching the group's keys (cap >= max group size,
        # so the rows just gathered can never be evicted here).
        while len(self._vis_cache) > self._vis_cache_cap:
            self._vis_cache.popitem(last=False)
        while len(rows) < gb:
            rows.append(rows[0])
        return jnp.stack(rows)

    def _build_group(self, items, *, text_only: bool, T_pad: int,
                     use_vemb: bool, chunk: int,
                     admit: bool) -> "_PrefillGroup":
        page = self.page_size
        G = len(items)
        gb = _g_bucket(G)  # pad to a bucket: few compiled batch shapes
        # A row's final chunk may overhang its region by up to
        # chunk - page positions. Widen the source so the lockstep slice
        # never clamps into valid data (dynamic_slice clamps the START,
        # which would silently SHIFT the chunk), and widen the tables so
        # overhang positions index real (sentinel) entries instead of
        # running the kernel's scalar reads out of bounds.
        #
        # SHAPE STABILITY: the jit key includes source/table shapes, and
        # a 7B chunk graph costs 15-40 s to compile — one compile per
        # prompt-length bucket stalled concurrent turn-1 admissions 33 s
        # p50 on the round-5 wire bench. Sources therefore pad to the
        # ENGINE-constant cap so group graphs key only on (gb, kc):
        # trivial for text ids ([G, cap] int32); for vision sources
        # ([G, cap, D] embeds) it costs a transient ~160 MB at gb=8 —
        # accepted, because a turn-1 region after a prefix hit usually
        # STRADDLES the vision span's tail (page granularity), so vision
        # groups are the production hot path and per-T_pad tower+verify
        # compiles (~30 s each) would stall live traffic.
        T_r = self._src_cap
        p_max = self._tbl_cap
        pp = items[0][2]
        tables = np.zeros((gb, p_max), np.int32)
        starts = np.zeros((gb,), np.int32)
        rows: List[_RegionRow] = []
        for i, (rp, plan, _pp, req) in enumerate(items):
            # All of a row's pages live in one shard's id range; its
            # shard's sentinel (local-first page) fills unused entries.
            shard = rp.row_ids[0] // self.pages_per_shard
            tables[i, :] = shard * self.pages_per_shard
            tables[i, : len(rp.row_ids)] = rp.row_ids
            starts[i] = rp.start
            rows.append(rp)

        if text_only:
            src = np.zeros((gb, T_r), np.int32)
            for i, (_rp, plan, _pp, _req) in enumerate(items):
                src[i, :T_pad] = plan.safe_ids[0]
            source = jnp.asarray(src)
        else:
            # ONE batched vision encode + splice for the whole group:
            # the tower takes the stacked [G*modalities, H, W, C] batch
            # in one dispatch (the round-4 per-admission encodes were a
            # visible slice of concurrent-admission TTFT).
            def stack_plan(field, fill):
                first = getattr(items[0][1], field)[0]
                out = np.full((gb, T_r), fill, dtype=first.dtype)
                for i, (_rp, plan, _pp, _req) in enumerate(items):
                    out[i, :T_pad] = getattr(plan, field)[0]
                return jnp.asarray(out)

            plan_arrays = {
                "safe_ids": stack_plan("safe_ids", 0),
                "is_text": stack_plan("is_text", True),
                "vis_idx": stack_plan("vis_idx", 0),
            }
            vis_table = self._group_vis_tables(items, gb, pp)
            with self._mesh_ctx():
                source = _assemble_group(
                    pp, plan_arrays, vis_table,
                    jnp.asarray(use_vemb, bool),
                )
        return _PrefillGroup(
            rows=rows,
            params=pp,
            source=source,
            text_mode=text_only,
            use_vemb=use_vemb,
            tables=jnp.asarray(tables),
            starts=jnp.asarray(starts),
            chunk=chunk,
            admit=admit,
        )

    def _advance_group(self, g: "_PrefillGroup") -> List[Tuple[int, int, bool]]:
        """Run ONE lockstep chunk for every live row of a group; rows
        whose region completes are finished into decode slots (admit
        groups) or left holding their first-token logits (the dense-path
        suffix prefill)."""
        kc = g.chunk
        with self._mesh_ctx():
            (
                hidden,
                self.k_pages,
                self.v_pages,
                self.k_scale,
                self.v_scale,
            ) = _group_chunk(
                g.params,
                self.cfg,
                g.source,
                self.k_pages,
                self.v_pages,
                self.k_scale,
                self.v_scale,
                g.tables,
                g.starts,
                jnp.asarray(g.off, jnp.int32),
                g.active_dev(),
                jnp.asarray(g.use_vemb, bool),
                kc=kc,
                text_mode=g.text_mode,
            )
            finishing: List[_RegionRow] = []
            landing = []  # rows whose last prompt token sits in this chunk
            for i, rp in enumerate(g.rows):
                if rp.done:
                    continue
                if g.off <= rp.last_idx < g.off + kc:
                    landing.append((i, rp))
                if g.off + kc >= rp.region:
                    rp.done = True
                    g._active_dirty = True
                    finishing.append(rp)
            if landing:
                # ONE batched lm_head over every landing row (idxs padded
                # to the group width so the graph keys only on the
                # bucket): the per-row dynamic-slice jits each paid a
                # tunnel dispatch (~1.2 s for 8 rows, round-5 probe).
                idxs = np.zeros((hidden.shape[0],), np.int32)
                for i, rp in landing:
                    idxs[i] = rp.last_idx - g.off
                logits = _hidden_logits_group(
                    g.params, hidden, jnp.asarray(idxs)
                )
                if finishing and g.admit:
                    # Every finisher that landed THIS chunk reads from
                    # one whole-array fetch (a per-row slice fetch pays
                    # a tunnel RTT each).
                    np_log = jax.device_get(logits)
                    for i, rp in landing:
                        rp.logits = np_log[i]
                else:
                    for i, rp in landing:
                        rp.logits = logits[i]
            if finishing and g.admit:
                # ONE fetch for every row finishing this step whose
                # logits still live on device (landed in an earlier
                # chunk).
                on_dev = [
                    rp for rp in finishing
                    if not isinstance(rp.logits, np.ndarray)
                ]
                if on_dev:
                    fetched = jax.device_get(
                        tuple(rp.logits for rp in on_dev)
                    )
                    for rp, lg in zip(on_dev, fetched):
                        rp.logits = lg
        g.off += kc
        events: List[Tuple[int, int, bool]] = []
        if g.admit:
            for rp in finishing:
                self.timer.record("ttft", time.perf_counter() - rp.t0)
                events += self._finish_admission(rp)
        return events

    def _ensure_pages(self, events) -> None:
        """Give every active row pages covering its write horizon (one
        token, or the speculative window). A row that cannot get one is
        preempted (ended) rather than corrupting the pool or killing the
        whole engine."""
        horizon = self.spec_k if self.spec_k else self.sync_every
        for slot in range(self.max_batch):
            if not self.active[slot]:
                continue
            pos_last = int(self.lengths[slot]) + horizon - 1
            needed_total = pos_last // self.page_size + 1
            if needed_total > self.p_max:
                ended = self._end_request(
                    slot, "context reached max_len"
                )
                events.append((ended.request_id, self.eos_id, True))
                continue
            while len(self.row_pages[slot]) < needed_total:
                try:
                    pid = self._alloc(1, self._shard_of(slot))[0]
                except PoolExhausted:
                    if sum(self.active) > 1 or self._pending is not None:
                        # Other rows (or a mid-chunked-prefill admission
                        # holding region pages) will free pages: requeue
                        # this one for recompute instead of killing it
                        # (its output so far is preserved).
                        self._preempt_requeue(slot)
                    else:
                        # Nothing else could ever free pages — the pool
                        # is simply too small for this request.
                        ended = self._end_request(
                            slot, "preempted: page pool exhausted"
                        )
                        events.append((ended.request_id, self.eos_id, True))
                    break
                idx = len(self.row_pages[slot])
                self.row_pages[slot].append(pid)
                self.table[slot, idx] = pid
                self._table_dirty = True

    def _flush_tokens(self) -> None:
        """Apply deferred first-token writes as one batched scatter (see
        _finish_admission). Writes whose slot has since been released or
        reused by a different request are dropped — the new occupant's
        token was set by its own admission path."""
        if not self._tok_writes:
            return
        live = [
            (s, t) for s, t, r in self._tok_writes if self.slots[s] is r
        ]
        self._tok_writes.clear()
        if live:
            # Fixed-shape masked update: a variable-length scatter would
            # compile one graph per distinct finisher count.
            mask = np.zeros((self.max_batch,), bool)
            vals = np.zeros((self.max_batch,), np.int32)
            for s, t in live:
                mask[s], vals[s] = True, t
            self.tokens = jnp.where(
                jnp.asarray(mask), jnp.asarray(vals), self.tokens
            )

    def step(self) -> List[Tuple[int, int, bool]]:
        events = self._admit()
        if not any(self.active):
            return events

        self._ensure_pages(events)
        if not any(self.active):
            return events
        self._flush_tokens()
        if self.spec_k:
            return events + self._step_speculative_paged()

        self.rng, sub = jax.random.split(self.rng)
        table_dev = self._device_table()
        active_dev, temps_dev, top_ps_dev = self._device_flags()
        # Adaptive window: while admissions are queued or mid-chunk,
        # decode ONE step per engine step so the waiting request sees
        # ~20 ms scheduling granularity instead of a full sync window
        # (~165 ms at sync_every=8/B=8 on v5e) between its chunks. Idle
        # queues keep the full fused window (fetch-amortized decode).
        steps = (
            1 if (self.queue or self._pending_groups) else self.sync_every
        )
        with self.timer.measure("decode_step"), self._mesh_ctx():
            (
                toks,
                self.tokens,
                self.k_pages,
                self.v_pages,
                self.k_scale,
                self.v_scale,
            ) = _paged_decode_all_n(
                self.params,
                self.cfg,
                self.tokens,
                self.k_pages,
                self.v_pages,
                self.k_scale,
                self.v_scale,
                table_dev,
                jnp.asarray(self.lengths),
                active_dev,
                temps_dev,
                top_ps_dev,
                sub,
                steps=steps,
                nucleus=self._nucleus(),
                sharded=self.mesh is not None,
            )
            toks_host = jax.device_get(toks)  # [N, B], ONE round trip
        self.lengths += steps * self.active.astype(np.int32)
        return events + self._emit_step_events(toks_host)

    def _release_slot(self, slot: int) -> None:
        super()._release_slot(slot)
        self._free_row(slot)

    def _step_speculative_paged(self) -> List[Tuple[int, int, bool]]:
        """One speculative verify dispatch over paged KV for all slots."""
        draft, budget = self._spec_host_inputs()
        # draft + budget ride ONE host->device transfer.
        db = jnp.asarray(np.concatenate([draft, budget[:, None]], axis=1))
        table_dev = self._device_table()
        active_dev, temps_dev, top_ps_dev = self._device_flags()
        self.rng, sub = jax.random.split(self.rng)
        with self.timer.measure("decode_step"), self._mesh_ctx():
            out = _paged_spec_decode_all(
                self.params,
                self.cfg,
                self.tokens,
                db[:, :-1],
                self.k_pages,
                self.v_pages,
                self.k_scale,
                self.v_scale,
                table_dev,
                jnp.asarray(self.lengths),
                active_dev,
                db[:, -1],
                temps_dev,
                top_ps_dev,
                sub,
                eos_id=self.eos_id,
                nucleus=self._nucleus(),
                sharded=self.mesh is not None,
            )
            outs, emit, self.tokens = out[0], out[1], out[2]
            pools = out[3:]
            if self.kv_quant:
                (
                    self.k_pages,
                    self.v_pages,
                    self.k_scale,
                    self.v_scale,
                ) = pools
            else:
                self.k_pages, self.v_pages = pools
            # ONE device->host sync (every fetch pays a tunnel RTT).
            outs_host, emit_host = jax.device_get((outs, emit))
        self.lengths += emit_host.astype(np.int32)
        return self._emit_window_events(outs_host, emit_host)

    def _preempt_requeue(self, slot: int) -> None:
        """vLLM-style preemption by recompute: vacate the slot, return
        its pages, fold the tokens generated so far into the prompt, and
        requeue at the FRONT. On re-admission the (longer) prompt
        re-prefills — cheaply, when the prefix cache is on and the
        original prompt's pages are still cached — and generation
        continues exactly where it stopped; the client's stream never
        sees the preemption. Sampling rows resample their continuation
        (already-emitted tokens are baked into the prompt)."""
        req = self.slots[slot]
        req.input_ids = list(req.input_ids) + [
            int(t) for t in req.new_ids()
        ]
        req.folded = len(req.generated)
        req.slot = -1
        self._release_slot(slot)  # frees the row's pages too
        self.queue.insert(0, req)
        self.preemptions += 1

    def _end_request(self, slot: int, reason: str) -> Request:
        req = self.slots[slot]
        req.done = True
        req.error = reason
        # Surface the reason to front-ends (pop_error) — without this
        # the client sees a clean EOS and a silently truncated
        # completion instead of an error payload.
        self._record_failure(req)
        self._release_slot(slot)
        return req


class PoolExhausted(RuntimeError):
    pass


class _WaitForPublish(Exception):
    """Staging bailout: most of this prompt's pages are being prefetched
    by an in-flight admission — wait for their publication instead of
    redundantly re-prefilling them in parallel."""
