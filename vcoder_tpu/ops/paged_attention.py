"""Pallas paged-attention decode kernel + page-pool utilities.

The continuous-batching engine's slot caches reserve ``max_len`` tokens
per slot; VCoder requests are ragged (1/2/3 modalities -> 576/1152/1728
vision tokens + text), so slots strand memory. Paged KV storage
(vLLM-style) packs each request's tokens into fixed-size pages referenced
through a page table; this module provides:

* a page pool layout ``[L, n_pages, KH, page_size, D]`` with host-side
  free-list allocation (serve/paged_engine.py),
* :func:`paged_attention` — single-token decode attention where the PAGE
  TABLE IS A SCALAR-PREFETCH INPUT: the BlockSpec index_map reads it to
  fetch exactly the pages each row owns, so the Pallas pipeline streams
  only live pages from HBM (no gather materialization),
* token/page scatter helpers used by prefill-insert and decode-append.

Online-softmax accumulation across the page grid dimension mirrors
ops/flash_attention.py. BASELINE.json's north star names this component
("continuous-batched decode with a Pallas paged KV-cache").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# Trace-time A/B knob (scripts/bench_paged_attrib.py): when True the q8
# kernels fold the per-token scales into the LOGITS (after the QK dot)
# and the PROBS (before PV) — the dense decode path's trick — instead of
# dequantizing the full [KH, page, D] K/V tiles elementwise in VMEM.
# Same math (scales are per token, the dots are over D). Measured effect
# on hardware: NEUTRAL (B=32 q8 full step 31.31 vs 31.24 ms, attend-only
# 21.56 vs 21.18 ms — docs/bench_logs/r4_paged_attrib_{fold,prefold}.txt):
# the kernel is DMA-bound, not VPU-bound, so the saved multiplies don't
# show. Kept at True for the lower VPU occupancy headroom; flip only
# with a new measurement.
FOLD_SCALES = True

# Scoped-VMEM ceiling for the multi-query (window>1) carry kernels. At
# serving chunked-prefill shapes (7B: KH=32, C=256, D=128) the per-row
# working set — q/out blocks, the f32 online-softmax accumulator, the
# [KH, C, page] logits, and the double-buffered page DMA scratch — is
# ~26 MB, past Mosaic's 16 MB default stack budget (compile-time
# "scoped vmem" OOM, hit live in bench_serving r4). v5e VMEM is 128 MB
# per core; 100 MB leaves margin for Mosaic internals.
_MULTI_VMEM_LIMIT = 100 * 1024 * 1024


def _paged_kernel(
    # scalar prefetch
    table_ref,  # [B, P_max] int32 page ids (garbage past the used count)
    lengths_ref,  # [B] int32 tokens per row
    # blocks
    q_ref,  # [1, H, D]
    k_ref,  # [1, KH, page, D]  (page chosen by index_map via table)
    v_ref,  # [1, KH, page, D]
    o_ref,  # [1, H, D]
    m_scr,  # [H, 128] f32
    l_scr,  # [H, 128] f32
    acc_scr,  # [H, D] f32
    *,
    scale: float,
    page_size: int,
    group: int,
):
    b = pl.program_id(0)
    j = pl.program_id(1)
    n_pages = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full(m_scr.shape, NEG_INF, jnp.float32)
        l_scr[:] = jnp.zeros(l_scr.shape, jnp.float32)
        acc_scr[:] = jnp.zeros(acc_scr.shape, jnp.float32)

    length = lengths_ref[b]
    page_start = j * page_size

    @pl.when(page_start < length)
    def _compute():
        q = q_ref[0]  # [H, D]
        k = k_ref[0]  # [KH, page, D]
        v = v_ref[0]
        H, D = q.shape
        KH = k.shape[0]
        # GQA: consecutive q heads share a KV head (h // group), so the
        # [H, D] -> [KH, group, D] reshape aligns each group with its
        # batched KV head. group == 1 is plain MHA.
        s = jax.lax.dot_general(
            q.reshape(KH, group, D),
            k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(H, page_size)
        s = s * scale
        tok_ids = page_start + jax.lax.broadcasted_iota(
            jnp.int32, (H, page_size), 1
        )
        mask = tok_ids < length
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scr[:, :1]
        l_prev = l_scr[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
        l_new = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p.reshape(KH, group, page_size).astype(v.dtype),
            v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(H, D)
        acc_scr[:] = acc_scr[:] * alpha + pv
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(j == n_pages - 1)
    def _finalize():
        l = l_scr[:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scr[:] / l_safe).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def paged_attention(
    q: jnp.ndarray,  # [B, H, D] single decode token per row
    k_pages: jnp.ndarray,  # [n_pages, KH, page_size, D]
    v_pages: jnp.ndarray,  # [n_pages, KH, page_size, D]
    page_table: jnp.ndarray,  # [B, P_max] int32
    lengths: jnp.ndarray,  # [B] int32
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """Decode attention over paged KV. Rows attend their first
    ceil(lengths/page) pages; table entries past that are never fetched
    thanks to the page_start < length predicate + index_map clamping."""
    B, H, D = q.shape
    KH, page_size = k_pages.shape[1], k_pages.shape[2]
    assert H % KH == 0, (H, KH)
    P_max = page_table.shape[1]
    scale = D**-0.5

    grid = (B, P_max)
    n_pages = k_pages.shape[0]
    kernel = functools.partial(
        _paged_kernel, scale=scale, page_size=page_size, group=H // KH
    )

    # index_map sees the scalar-prefetch refs: pick row b's j-th page.
    # Grid steps past the row's live pages CLAMP to the last live page:
    # the Pallas pipeline skips the DMA when the block index repeats, so
    # dead iterations fetch nothing (their compute is already predicated
    # off by page_start < length). Without the clamp every dead step
    # streamed a garbage page from HBM — bandwidth waste growing with
    # context raggedness. The clip guards rows with length 0 (empty
    # slots), whose table holds sentinel ids.
    def page_map(b, j, table, lengths):
        used = (lengths[b] + page_size - 1) // page_size
        jj = jnp.minimum(j, jnp.maximum(used - 1, 0))
        page = jnp.clip(table[b, jj], 0, n_pages - 1)
        return (page, 0, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, H, D), lambda b, j, t, l: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, KH, page_size, D), page_map, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, KH, page_size, D), page_map, memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, H, D), lambda b, j, t, l: (b, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((H, 128), jnp.float32),
            pltpu.VMEM((H, 128), jnp.float32),
            pltpu.VMEM((H, D), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, D), q.dtype),
        interpret=interpret,
    )(page_table, lengths, q, k_pages, v_pages)


# ---------------------------------------------------------------------------
# Carry-aliased decode kernel (STACKED pools, manual DMA, in-place)
# ---------------------------------------------------------------------------


def carry_paged_attention(
    q: jnp.ndarray,  # [B, H, D]
    k_pages: jnp.ndarray,  # [L, n_pages, KH, page, D] STACKED pool
    v_pages: jnp.ndarray,
    page_table: jnp.ndarray,  # [B, P_max] int32 LOCAL ids
    lengths: jnp.ndarray,  # [B] tokens incl. the one just appended
    layer: jnp.ndarray,  # scalar int32
    *,
    interpret: bool = False,
):
    """Single-token decode attention against the STACKED page pool,
    aliased in place.

    Returns (out [B, H, D], k_pages, v_pages) where the pools are the
    same buffers passed in (``input_output_aliases`` pass-through). This
    is what lets the decode loop carry the stacked pools with zero
    copies: a pallas operand that is merely READ but live-out makes XLA
    safety-copy the whole pool every layer (custom calls are assumed to
    mutate operands), while a declared alias donates the buffer through
    the call. Pages stream via a double-buffered manual DMA pipeline;
    the token append itself is a cheap jnp scatter outside
    (:func:`append_token_layer`).

    Implemented as :func:`carry_paged_attention_multi` at window=1 (the
    window mask ``tok <= (length-1)+t`` degenerates to ``tok < length``
    and the q layout [KH, group, D] is identical) — one kernel serves
    both the decode and speculative-verify paths.
    """
    out, k_pages, v_pages = carry_paged_attention_multi(
        q[:, None],
        k_pages,
        v_pages,
        page_table,
        lengths,
        layer,
        window=1,
        interpret=interpret,
    )
    return out[:, 0], k_pages, v_pages

def _online_softmax_page_step(
    q, k, v, j, carry, *, length, window, page_size, scale,
    k_scale=None, v_scale=None,
):
    """Shared online-softmax accumulation for ONE page of the
    multi-query (decode/verify) kernels: window-causal mask, running-max
    rescale, PV accumulate. Plain Python inlined at trace time by both
    the bf16 and q8 kernel bodies, so the mask/rescale math can never
    drift between them. q [KH, C, D]; k/v [KH, page, D].

    ``k_scale``/``v_scale`` ([KH, page] f32, q8 kernels with FOLD_SCALES)
    fold the per-token dequant scales into the logits / probs instead of
    the K/V tiles: sum_t softmax(q.k_t * ks_t) * (vs_t * v_t) — per-token
    scalars commute out of the D-dots, so the math is unchanged."""
    m, lsum, acc = carry
    KH, C, _ = q.shape
    s = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale  # [KH, C, page]
    if k_scale is not None:
        s = s * k_scale[:, None, :]
    tok = j * page_size + jax.lax.broadcasted_iota(
        jnp.int32, (KH, C, page_size), 2
    )
    # Query column c holds window token t = c % window at absolute
    # position length - window + t: it may attend tok <= that.
    t = jax.lax.broadcasted_iota(
        jnp.int32, (KH, C, page_size), 1
    ) % window
    mask = tok <= (length - window) + t
    s = jnp.where(mask, s, NEG_INF)
    m_new = jnp.maximum(m, jnp.max(s, axis=2, keepdims=True))
    alpha = jnp.exp(m - m_new)
    p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
    lsum = alpha * lsum + jnp.sum(p, axis=2, keepdims=True)
    if v_scale is not None:
        p = p * v_scale[:, None, :]
    pv = jax.lax.dot_general(
        p.astype(v.dtype),
        v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [KH, C, D]
    return m_new, lsum, acc * alpha + pv


def _carry_kernel_multi(
    # scalar prefetch
    table_ref,  # [B, P_max] int32 LOCAL page ids
    lengths_ref,  # [B] int32 tokens per row INCLUDING the k new ones
    layer_ref,  # [1] int32
    # inputs
    q_ref,  # [1, KH, C, D] VMEM (C = group * window; caller pre-arranged)
    kp_hbm,  # [L, n_pages, KH, page, D] ANY (aliased)
    vp_hbm,
    # outputs
    o_ref,  # [1, KH, C, D] VMEM
    kp_out,
    vp_out,
    # scratch
    kbuf,  # [2, KH, page, D]
    vbuf,
    ksem,
    vsem,
    *,
    scale: float,
    page_size: int,
    window: int,
):
    """Carry-aliased paged attention kernel (decode AND speculative
    verify — window=1 is the plain decode step): C = group*window
    query rows per KV head, where query
    column c verifies draft token t = c % window sitting at absolute
    position ``length - window + t`` (causal within the window). The
    caller lays q out as [KH, group*window, D] so the kernel is the same
    batched dot as the single-token path."""
    del kp_out, vp_out
    b = pl.program_id(0)
    l = layer_ref[0]
    length = lengths_ref[b]
    n_pages_total = kp_hbm.shape[1]
    n_live = (length + page_size - 1) // page_size

    def page_dma(slot, j, buf, sem, pool):
        pg = jnp.clip(table_ref[b, j], 0, n_pages_total - 1)
        return pltpu.make_async_copy(
            pool.at[l, pg], buf.at[slot], sem.at[slot]
        )

    @pl.when(n_live > 0)
    def _warmup():
        page_dma(0, 0, kbuf, ksem, kp_hbm).start()
        page_dma(0, 0, vbuf, vsem, vp_hbm).start()

    q = q_ref[0]  # [KH, C, D]
    KH, C, D = q.shape

    def body(j, carry):
        slot = j % 2
        nxt = (j + 1) % 2

        @pl.when(j + 1 < n_live)
        def _prefetch():
            page_dma(nxt, j + 1, kbuf, ksem, kp_hbm).start()
            page_dma(nxt, j + 1, vbuf, vsem, vp_hbm).start()

        page_dma(slot, j, kbuf, ksem, kp_hbm).wait()
        page_dma(slot, j, vbuf, vsem, vp_hbm).wait()
        return _online_softmax_page_step(
            q, kbuf[slot], vbuf[slot], j, carry,
            length=length, window=window, page_size=page_size,
            scale=scale,
        )

    m0 = jnp.full((KH, C, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((KH, C, 1), jnp.float32)
    a0 = jnp.zeros((KH, C, q_ref.shape[3]), jnp.float32)
    m, lsum, acc = jax.lax.fori_loop(0, n_live, body, (m0, l0, a0))
    l_safe = jnp.where(lsum == 0.0, 1.0, lsum)
    o_ref[0] = (acc / l_safe).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("window", "interpret"))
def carry_paged_attention_multi(
    q: jnp.ndarray,  # [B, k, H, D] the k window tokens per row
    k_pages: jnp.ndarray,  # [L, n_pages, KH, page, D] STACKED pool
    v_pages: jnp.ndarray,
    page_table: jnp.ndarray,  # [B, P_max] int32 LOCAL ids
    lengths: jnp.ndarray,  # [B] tokens INCLUDING the k just appended
    layer: jnp.ndarray,
    *,
    window: int,
    interpret: bool = False,
):
    """Speculative-verify attention against the paged pool: each of the
    ``window`` tokens per row attends the row's pages causally up to its
    own position. Same aliased pass-through contract as
    :func:`carry_paged_attention`. Returns (out [B, k, H, D], pools...)."""
    B, k, H, D = q.shape
    assert k == window
    L, n_pages, KH, page_size, _ = k_pages.shape
    assert H % KH == 0, (H, KH)
    group = H // KH
    scale = D**-0.5
    layer = jnp.asarray(layer, jnp.int32).reshape(1)
    # [B, k, H, D] -> [B, KH, group*k, D]: query column c = g*k + t.
    qt = (
        q.reshape(B, k, KH, group, D)
        .transpose(0, 2, 3, 1, 4)
        .reshape(B, KH, group * k, D)
    )

    kernel = functools.partial(
        _carry_kernel_multi,
        scale=scale,
        page_size=page_size,
        window=window,
    )
    C = group * k
    pool_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    row_block = pl.BlockSpec(
        (1, KH, C, D), lambda b, *_: (b, 0, 0, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B,),
        in_specs=[row_block, pool_spec, pool_spec],
        out_specs=[row_block, pool_spec, pool_spec],
        scratch_shapes=[
            pltpu.VMEM((2, KH, page_size, D), k_pages.dtype),
            pltpu.VMEM((2, KH, page_size, D), v_pages.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out, k_pages, v_pages = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, KH, C, D), q.dtype),
            jax.ShapeDtypeStruct(k_pages.shape, k_pages.dtype),
            jax.ShapeDtypeStruct(v_pages.shape, v_pages.dtype),
        ],
        input_output_aliases={4: 1, 5: 2},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=_MULTI_VMEM_LIMIT
        ),
        interpret=interpret,
    )(page_table, lengths, layer, qt, k_pages, v_pages)
    out = (
        out.reshape(B, KH, group, k, D)
        .transpose(0, 3, 1, 2, 4)
        .reshape(B, k, H, D)
    )
    return out, k_pages, v_pages


def sharded_carry_paged_attention_multi(
    q, k_pages, v_pages, page_table, lengths, layer, mesh, *,
    window: int, interpret: bool = False,
):
    """shard_map'd :func:`carry_paged_attention_multi`."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    row = P(ROW_AXES)
    pool = P(None, ROW_AXES, "model", None, None)
    layer = jnp.asarray(layer, jnp.int32).reshape(1)

    def local(q, kp, vp, table, lengths, layer):
        local_table = table - _row_offset(kp.shape[1])
        return carry_paged_attention_multi(
            q, kp, vp, local_table, lengths, layer[0], window=window,
            interpret=interpret,
        )

    bkh = P(ROW_AXES, None, "model", None)
    return shard_map(
        local,
        mesh=mesh,
        in_specs=(bkh, pool, pool, row, row, P(None)),
        out_specs=(bkh, pool, pool),
        check_vma=False,
    )(q, k_pages, v_pages, page_table, lengths, layer)


def append_tokens_layer(
    pages_all: jnp.ndarray,  # [L, n_pages, KH, page, D]
    l: jnp.ndarray,
    token_kv: jnp.ndarray,  # [B, k, KH, D] the window's K or V rows
    positions: jnp.ndarray,  # [B, k] absolute positions
    page_table: jnp.ndarray,  # [B, P_max] page id per position block
    active: jnp.ndarray,  # [B] bool
) -> jnp.ndarray:
    """Multi-token variant of :func:`append_token_layer`: scatter a
    speculative window's K/V (the window may straddle a page boundary —
    each token looks its page up in the table). Inactive rows target the
    shard's scratch page (last local page)."""
    L, n_pages, KH, page, D = pages_all.shape
    B, k = positions.shape
    pages_per_tok = jnp.take_along_axis(
        page_table, positions // page, axis=1
    )  # [B, k]
    offsets = positions % page
    safe_pages = jnp.where(active[:, None], pages_per_tok, n_pages - 1)
    flat_idx = (
        (l * n_pages + safe_pages)[:, :, None] * KH
        + jnp.arange(KH, dtype=jnp.int32)[None, None, :]
    ) * page + offsets[:, :, None]  # [B, k, KH]
    out = (
        pages_all.reshape(-1, D)
        .at[flat_idx]
        .set(token_kv.astype(pages_all.dtype))
    )
    return out.reshape(pages_all.shape)


def sharded_append_tokens_layer(
    pages_all, l, token_kv, positions, page_table, active, mesh
):
    """shard_map'd :func:`append_tokens_layer` (global ids rebased)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    row = P(ROW_AXES)
    pool = P(None, ROW_AXES, "model", None, None)

    def local(pages_all, l, token_kv, positions, table, active):
        local_table = table - _row_offset(pages_all.shape[1])
        local_table = jnp.clip(local_table, 0, pages_all.shape[1] - 1)
        return append_tokens_layer(
            pages_all, l, token_kv, positions, local_table, active
        )

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(
            pool, P(), P(ROW_AXES, None, "model", None), row, row, row,
        ),
        out_specs=pool,
        check_vma=False,
    )(pages_all, l, token_kv, positions, page_table, active)


def append_pages_layer(
    pages_all: jnp.ndarray,  # [L, n_pages, KH, page, D]
    l: jnp.ndarray,
    token_kv: jnp.ndarray,  # [B, k, KH, D], k % page == 0
    positions: jnp.ndarray,  # [B, k]; positions[:, 0] % page == 0
    page_table: jnp.ndarray,  # [B, P_max]
    active: jnp.ndarray,  # [B] bool
) -> jnp.ndarray:
    """PAGE-granular window append for page-ALIGNED chunk windows.

    :func:`append_tokens_layer` lowers to one scattered [D]-row write per
    (token, head) — ~65k advanced indices for a G=8, kc=256 chunk,
    measured **179 ms per int8 pool per chunk** on v5e
    (scripts/bench_group_chunk.py, round 5) and ~independent of G: the
    scatter row count, not the bytes, is the cost. When the window is
    page-aligned (positions[:, 0] % page == 0 and k % page == 0 — the
    lockstep chunk-prefill case: region starts are ``m * page`` and the
    chunk size is a page multiple), the same write is k//page whole
    pages per row: ONE scatter of B*(k//page) contiguous [KH*page, D]
    rows on the page-major flat view (single leading advanced index,
    the fast pattern). Caller must guarantee the alignment; overhang
    positions land on table sentinel entries exactly like the token
    scatter, and inactive rows write their (duplicate) blocks to the
    scratch page."""
    L, n_pages, KH, page, D = pages_all.shape
    B, k = positions.shape
    npg = k // page
    pg_of = jnp.take_along_axis(
        page_table, positions[:, ::page] // page, axis=1
    )  # [B, npg]
    safe = jnp.where(active[:, None], pg_of, n_pages - 1)
    blocks = (
        token_kv.reshape(B, npg, page, KH, D)
        .transpose(0, 1, 3, 2, 4)
        .reshape(B * npg, KH * page, D)
    )
    flat = pages_all.reshape(L * n_pages, KH * page, D)
    idx = (l * n_pages + safe).reshape(-1)
    out = flat.at[idx].set(blocks.astype(pages_all.dtype))
    return out.reshape(pages_all.shape)


def append_page_scales_layer(
    scales_all: jnp.ndarray,  # [L, n_pages, KH, page] f32
    l: jnp.ndarray,
    token_scales: jnp.ndarray,  # [B, k, KH] or [B, k, KH, 1]
    positions: jnp.ndarray,
    page_table: jnp.ndarray,
    active: jnp.ndarray,
) -> jnp.ndarray:
    """Page-granular variant of :func:`append_token_scales_layer`."""
    L, n_pages, KH, page = scales_all.shape
    B, k = positions.shape
    out = append_pages_layer(
        scales_all.reshape(L, n_pages, KH, page, 1),
        l,
        token_scales.reshape(B, k, KH, 1),
        positions,
        page_table,
        active,
    )
    return out.reshape(scales_all.shape)


def sharded_append_pages_layer(
    pages_all, l, token_kv, positions, page_table, active, mesh
):
    """shard_map'd :func:`append_pages_layer` (global ids rebased)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    row = P(ROW_AXES)
    pool = P(None, ROW_AXES, "model", None, None)

    def local(pages_all, l, token_kv, positions, table, active):
        local_table = table - _row_offset(pages_all.shape[1])
        local_table = jnp.clip(local_table, 0, pages_all.shape[1] - 1)
        return append_pages_layer(
            pages_all, l, token_kv, positions, local_table, active
        )

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(
            pool, P(), P(ROW_AXES, None, "model", None), row, row, row,
        ),
        out_specs=pool,
        check_vma=False,
    )(pages_all, l, token_kv, positions, page_table, active)


def sharded_append_page_scales_layer(
    scales_all, l, token_scales, positions, page_table, active, mesh
):
    """shard_map'd :func:`append_page_scales_layer`."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    row = P(ROW_AXES)
    spool = P(None, ROW_AXES, "model", None)

    def local(scales_all, l, token_scales, positions, table, active):
        local_table = table - _row_offset(scales_all.shape[1])
        local_table = jnp.clip(local_table, 0, scales_all.shape[1] - 1)
        return append_page_scales_layer(
            scales_all, l, token_scales, positions, local_table, active
        )

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(
            spool, P(), P(ROW_AXES, None, "model"), row, row, row,
        ),
        out_specs=spool,
        check_vma=False,
    )(
        scales_all,
        l,
        token_scales.reshape(token_scales.shape[0],
                             token_scales.shape[1], -1),
        positions,
        page_table,
        active,
    )


def _carry_kernel_multi_q8(
    # scalar prefetch
    table_ref,
    lengths_ref,  # [B] tokens INCLUDING the k new ones
    layer_ref,
    # inputs
    q_ref,  # [1, KH, C, D]
    kp_hbm,  # int8 pools (aliased)
    vp_hbm,
    ks_hbm,  # f32 scale pools (aliased)
    vs_hbm,
    # outputs
    o_ref,
    kp_out,
    vp_out,
    ks_out,
    vs_out,
    # scratch
    kbuf,
    vbuf,
    ksbuf,
    vsbuf,
    ksem,
    vsem,
    kssem,
    vssem,
    *,
    scale: float,
    page_size: int,
    window: int,
):
    """int8 multi-query verify kernel: :func:`_carry_kernel_multi`'s
    window masking with int8 pages + per-token-per-head f32 scales
    (the dense cache's ``_kv_quantize`` scheme) dequantized in VMEM
    right after the page DMA — half the HBM bytes per page."""
    del kp_out, vp_out, ks_out, vs_out
    b = pl.program_id(0)
    l = layer_ref[0]
    length = lengths_ref[b]
    n_pages_total = kp_hbm.shape[1]
    n_live = (length + page_size - 1) // page_size

    streams = (
        (kbuf, ksem, kp_hbm),
        (vbuf, vsem, vp_hbm),
        (ksbuf, kssem, ks_hbm),
        (vsbuf, vssem, vs_hbm),
    )

    def page_dma(slot, j, buf, sem, pool):
        pg = jnp.clip(table_ref[b, j], 0, n_pages_total - 1)
        return pltpu.make_async_copy(
            pool.at[l, pg], buf.at[slot], sem.at[slot]
        )

    @pl.when(n_live > 0)
    def _warmup():
        for buf, sem, pool in streams:
            page_dma(0, 0, buf, sem, pool).start()

    q = q_ref[0]  # [KH, C, D]
    KH, C, D = q.shape
    dt = q.dtype

    def body(j, carry):
        slot = j % 2
        nxt = (j + 1) % 2

        @pl.when(j + 1 < n_live)
        def _prefetch():
            for buf, sem, pool in streams:
                page_dma(nxt, j + 1, buf, sem, pool).start()

        for buf, sem, pool in streams:
            page_dma(slot, j, buf, sem, pool).wait()
        if FOLD_SCALES:
            # Upcast only; the per-token scales fold into logits/probs
            # inside the shared step (page_size x fewer VPU multiplies).
            return _online_softmax_page_step(
                q, kbuf[slot].astype(dt), vbuf[slot].astype(dt), j, carry,
                length=length, window=window, page_size=page_size,
                scale=scale, k_scale=ksbuf[slot], v_scale=vsbuf[slot],
            )
        # In-VMEM dequant right after the DMA, then the shared step.
        k = kbuf[slot].astype(dt) * ksbuf[slot][:, :, None].astype(dt)
        v = vbuf[slot].astype(dt) * vsbuf[slot][:, :, None].astype(dt)
        return _online_softmax_page_step(
            q, k, v, j, carry,
            length=length, window=window, page_size=page_size,
            scale=scale,
        )

    m0 = jnp.full((KH, C, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((KH, C, 1), jnp.float32)
    a0 = jnp.zeros((KH, C, q_ref.shape[3]), jnp.float32)
    m, lsum, acc = jax.lax.fori_loop(0, n_live, body, (m0, l0, a0))
    l_safe = jnp.where(lsum == 0.0, 1.0, lsum)
    o_ref[0] = (acc / l_safe).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("window", "interpret"))
def carry_paged_attention_multi_q8(
    q: jnp.ndarray,  # [B, k, H, D]
    k_pages: jnp.ndarray,  # int8 pools
    v_pages: jnp.ndarray,
    k_scale: jnp.ndarray,  # [L, n_pages, KH, page] f32
    v_scale: jnp.ndarray,
    page_table: jnp.ndarray,
    lengths: jnp.ndarray,  # [B] tokens INCLUDING the window
    layer: jnp.ndarray,
    *,
    window: int,
    interpret: bool = False,
):
    """int8 multi-query verify attention over paged KV (speculative
    decoding x kv_quant). Same contracts as the siblings."""
    B, k, H, D = q.shape
    assert k == window
    L, n_pages, KH, page_size, _ = k_pages.shape
    assert H % KH == 0, (H, KH)
    assert k_pages.dtype == jnp.int8, k_pages.dtype
    assert interpret or page_size % 128 == 0, (
        f"int8 paged KV requires page_size % 128 == 0 on TPU, got"
        f" {page_size}"
    )
    group = H // KH
    scale = D**-0.5
    layer = jnp.asarray(layer, jnp.int32).reshape(1)
    qt = (
        q.reshape(B, k, KH, group, D)
        .transpose(0, 2, 3, 1, 4)
        .reshape(B, KH, group * k, D)
    )

    kernel = functools.partial(
        _carry_kernel_multi_q8,
        scale=scale,
        page_size=page_size,
        window=window,
    )
    C = group * k
    pool_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    row_block = pl.BlockSpec(
        (1, KH, C, D), lambda b, *_: (b, 0, 0, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B,),
        in_specs=[row_block] + [pool_spec] * 4,
        out_specs=[row_block] + [pool_spec] * 4,
        scratch_shapes=[
            pltpu.VMEM((2, KH, page_size, D), jnp.int8),
            pltpu.VMEM((2, KH, page_size, D), jnp.int8),
            pltpu.VMEM((2, KH, page_size), jnp.float32),
            pltpu.VMEM((2, KH, page_size), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out, k_pages, v_pages, k_scale, v_scale = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, KH, C, D), q.dtype),
            jax.ShapeDtypeStruct(k_pages.shape, k_pages.dtype),
            jax.ShapeDtypeStruct(v_pages.shape, v_pages.dtype),
            jax.ShapeDtypeStruct(k_scale.shape, k_scale.dtype),
            jax.ShapeDtypeStruct(v_scale.shape, v_scale.dtype),
        ],
        input_output_aliases={4: 1, 5: 2, 6: 3, 7: 4},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=_MULTI_VMEM_LIMIT
        ),
        interpret=interpret,
    )(page_table, lengths, layer, qt, k_pages, v_pages, k_scale, v_scale)
    out = (
        out.reshape(B, KH, group, k, D)
        .transpose(0, 3, 1, 2, 4)
        .reshape(B, k, H, D)
    )
    return out, k_pages, v_pages, k_scale, v_scale


def sharded_carry_paged_attention_multi_q8(
    q, k_pages, v_pages, k_scale, v_scale, page_table, lengths, layer,
    mesh, *, window: int, interpret: bool = False,
):
    """shard_map'd :func:`carry_paged_attention_multi_q8`."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    row = P(ROW_AXES)
    pool = P(None, ROW_AXES, "model", None, None)
    spool = P(None, ROW_AXES, "model", None)
    layer = jnp.asarray(layer, jnp.int32).reshape(1)

    def local(q, kp, vp, ks, vs, table, lengths, layer):
        local_table = table - _row_offset(kp.shape[1])
        return carry_paged_attention_multi_q8(
            q, kp, vp, ks, vs, local_table, lengths, layer[0],
            window=window, interpret=interpret,
        )

    bkh = P(ROW_AXES, None, "model", None)
    return shard_map(
        local,
        mesh=mesh,
        in_specs=(bkh, pool, pool, spool, spool, row, row, P(None)),
        out_specs=(bkh, pool, pool, spool, spool),
        check_vma=False,
    )(q, k_pages, v_pages, k_scale, v_scale, page_table, lengths, layer)


def append_token_scales_layer(
    scales_all: jnp.ndarray,  # [L, n_pages, KH, page] f32
    l: jnp.ndarray,
    token_scales: jnp.ndarray,  # [B, k, KH] or [B, k, KH, 1]
    positions: jnp.ndarray,  # [B, k]
    page_table: jnp.ndarray,
    active: jnp.ndarray,
) -> jnp.ndarray:
    """Multi-token scale scatter (the q8 window append)."""
    L, n_pages, KH, page = scales_all.shape
    B, k = positions.shape
    out = append_tokens_layer(
        scales_all.reshape(L, n_pages, KH, page, 1),
        l,
        token_scales.reshape(B, k, KH, 1),
        positions,
        page_table,
        active,
    )
    return out.reshape(scales_all.shape)


def sharded_append_token_scales_layer(
    scales_all, l, token_scales, positions, page_table, active, mesh
):
    """shard_map'd :func:`append_token_scales_layer`."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    row = P(ROW_AXES)
    spool = P(None, ROW_AXES, "model", None)

    def local(scales_all, l, token_scales, positions, table, active):
        local_table = table - _row_offset(scales_all.shape[1])
        local_table = jnp.clip(local_table, 0, scales_all.shape[1] - 1)
        return append_token_scales_layer(
            scales_all, l, token_scales, positions, local_table, active
        )

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(
            spool, P(), P(ROW_AXES, None, "model"), row, row, row,
        ),
        out_specs=spool,
        check_vma=False,
    )(
        scales_all,
        l,
        token_scales.reshape(token_scales.shape[0],
                             token_scales.shape[1], -1),
        positions,
        page_table,
        active,
    )


def carry_paged_attention_q8(
    q: jnp.ndarray,  # [B, H, D]
    k_pages: jnp.ndarray,  # [L, n_pages, KH, page, D] int8 STACKED pool
    v_pages: jnp.ndarray,
    k_scale: jnp.ndarray,  # [L, n_pages, KH, page] f32
    v_scale: jnp.ndarray,
    page_table: jnp.ndarray,  # [B, P_max] int32 LOCAL ids
    lengths: jnp.ndarray,  # [B] tokens incl. the one just appended
    layer: jnp.ndarray,  # scalar int32
    *,
    interpret: bool = False,
):
    """int8-page variant of :func:`carry_paged_attention`: all four pools
    are aliased pass-throughs, pages stream at half the HBM bytes and
    dequantize in VMEM. Returns (out, k_pages, v_pages, k_scale,
    v_scale). Implemented as :func:`carry_paged_attention_multi_q8` at
    window=1."""
    out, k_pages, v_pages, k_scale, v_scale = carry_paged_attention_multi_q8(
        q[:, None],
        k_pages,
        v_pages,
        k_scale,
        v_scale,
        page_table,
        lengths,
        layer,
        window=1,
        interpret=interpret,
    )
    return out[:, 0], k_pages, v_pages, k_scale, v_scale

def sharded_carry_paged_attention_q8(
    q, k_pages, v_pages, k_scale, v_scale, page_table, lengths, layer,
    mesh, *, interpret: bool = False,
):
    """shard_map'd :func:`carry_paged_attention_q8` (rows over data x
    fsdp, heads over model, GLOBAL page ids rebased per shard)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    row = P(ROW_AXES)
    pool = P(None, ROW_AXES, "model", None, None)
    spool = P(None, ROW_AXES, "model", None)
    layer = jnp.asarray(layer, jnp.int32).reshape(1)

    def local(q, kp, vp, ks, vs, table, lengths, layer):
        local_table = table - _row_offset(kp.shape[1])
        return carry_paged_attention_q8(
            q, kp, vp, ks, vs, local_table, lengths, layer[0],
            interpret=interpret,
        )

    bh = P(ROW_AXES, "model", None)
    return shard_map(
        local,
        mesh=mesh,
        in_specs=(bh, pool, pool, spool, spool, row, row, P(None)),
        out_specs=(bh, pool, pool, spool, spool),
        check_vma=False,
    )(q, k_pages, v_pages, k_scale, v_scale, page_table, lengths, layer)


def sharded_carry_paged_attention(
    q, k_pages, v_pages, page_table, lengths, layer, mesh, *,
    interpret: bool = False,
):
    """shard_map'd :func:`carry_paged_attention` (rows over data x fsdp,
    heads over model, GLOBAL page ids rebased per shard)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    row = P(ROW_AXES)
    pool = P(None, ROW_AXES, "model", None, None)
    layer = jnp.asarray(layer, jnp.int32).reshape(1)

    def local(q, kp, vp, table, lengths, layer):
        local_table = table - _row_offset(kp.shape[1])
        return carry_paged_attention(
            q, kp, vp, local_table, lengths, layer[0], interpret=interpret
        )

    bh = P(ROW_AXES, "model", None)
    return shard_map(
        local,
        mesh=mesh,
        in_specs=(bh, pool, pool, row, row, P(None)),
        out_specs=(bh, pool, pool),
        check_vma=False,
    )(q, k_pages, v_pages, page_table, lengths, layer)


# ---------------------------------------------------------------------------
# Multi-chip sharding (SURVEY §2.3 TP goal; 13B serving rides the model axis)
# ---------------------------------------------------------------------------

ROW_AXES = ("data", "fsdp")


def _row_offset(local_n_pages: int) -> jnp.ndarray:
    """Global-id offset of this row-shard's page-pool slice (row-major over
    the (data, fsdp) axes, matching PartitionSpec(('data', 'fsdp')))."""
    idx = 0
    for ax in ROW_AXES:
        idx = idx * jax.lax.axis_size(ax) + jax.lax.axis_index(ax)
    return idx * local_n_pages


def sharded_paged_attention(
    q: jnp.ndarray,  # [B, H, D] rows over (data, fsdp), heads over model
    k_pages: jnp.ndarray,  # [n_pages, KH, page, D] pages over rows, KH over model
    v_pages: jnp.ndarray,
    page_table: jnp.ndarray,  # [B, P_max] GLOBAL page ids, rows over (data, fsdp)
    lengths: jnp.ndarray,  # [B]
    mesh,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """shard_map'd paged decode attention.

    Each (row-shard, model-shard) runs the Pallas kernel over its own rows
    x heads against its local page-pool slice — a row's pages all live in
    its row-shard, so softmax needs no cross-shard reduction, and heads
    are embarrassingly parallel (the dense path's TP layout,
    ops/attention.py::sharded_flash_attention). The engine allocates pages
    per row-shard and stores GLOBAL ids; the wrapper rebases them to local
    pool indices with the shard's offset.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    row = P(ROW_AXES)

    def local(q, kp, vp, table, lengths):
        local_table = table - _row_offset(kp.shape[0])
        return paged_attention(
            q, kp, vp, local_table, lengths, interpret=interpret
        )

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(ROW_AXES, "model", None),
            P(ROW_AXES, "model", None, None),
            P(ROW_AXES, "model", None, None),
            row,
            row,
        ),
        out_specs=P(ROW_AXES, "model", None),
        check_vma=False,
    )(q, k_pages, v_pages, page_table, lengths)


def append_token_layer(
    pages_all: jnp.ndarray,  # [L, n_pages, KH, page, D] (loop carry)
    l: jnp.ndarray,  # scalar layer index
    token_kv: jnp.ndarray,  # [B, KH, D]
    page_ids: jnp.ndarray,  # [B]
    offsets: jnp.ndarray,  # [B]
    active: jnp.ndarray,  # [B] bool
) -> jnp.ndarray:
    """In-place decode-token scatter into layer ``l`` of the STACKED pool.

    The stacked pool must ride the decode loop's carry, never a scan
    xs->ys pair — XLA does not alias stacked scan outputs onto the
    consumed inputs, so threading pages through xs/ys re-copies the whole
    pool every decode step (see models/llama.py::llama_forward for the
    measured cost). Inactive rows are directed at the reserved scratch
    page (last page), whose contents are garbage by convention.

    The scatter is expressed on a flat [L*n_pages*KH*page, D] view with a
    single advanced index: the natural ``at[l, pg, :, off, :]`` form puts
    a slice BETWEEN advanced indices, which XLA lowers with a layout-
    converting copy of the whole pool on each side (the round-2 13x
    paged-decode regression, docs/PERFORMANCE.md).
    """
    L, n_pages, KH, page, D = pages_all.shape
    safe_pages = jnp.where(active, page_ids, n_pages - 1)
    flat_idx = (
        (l * n_pages + safe_pages)[:, None] * KH
        + jnp.arange(KH, dtype=jnp.int32)[None, :]
    ) * page + offsets[:, None]  # [B, KH]
    out = (
        pages_all.reshape(-1, D)
        .at[flat_idx]
        .set(token_kv.astype(pages_all.dtype))
    )
    return out.reshape(pages_all.shape)


def append_scale_layer(
    scales_all: jnp.ndarray,  # [L, n_pages, KH, page] f32 (loop carry)
    l: jnp.ndarray,
    token_scale: jnp.ndarray,  # [B, KH] or [B, KH, 1]
    page_ids: jnp.ndarray,
    offsets: jnp.ndarray,
    active: jnp.ndarray,
) -> jnp.ndarray:
    """Per-token quantization-scale scatter into the stacked scale pool
    (same flat single-advanced-index form as :func:`append_token_layer`)."""
    L, n_pages, KH, page = scales_all.shape
    out = append_token_layer(
        scales_all.reshape(L, n_pages, KH, page, 1),
        l,
        token_scale.reshape(-1, KH, 1),
        page_ids,
        offsets,
        active,
    )
    return out.reshape(scales_all.shape)


def sharded_append_scale_layer(
    scales_all, l, token_scale, page_ids, offsets, active, mesh
):
    """shard_map'd :func:`append_scale_layer` (global ids rebased)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    row = P(ROW_AXES)
    spool = P(None, ROW_AXES, "model", None)

    def local(scales_all, l, token_scale, page_ids, offsets, active):
        local_ids = page_ids - _row_offset(scales_all.shape[1])
        local_ids = jnp.clip(local_ids, 0, scales_all.shape[1] - 1)
        return append_scale_layer(
            scales_all, l, token_scale, local_ids, offsets, active
        )

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(spool, P(), P(ROW_AXES, "model"), row, row, row),
        out_specs=spool,
        check_vma=False,
    )(
        scales_all,
        l,
        token_scale.reshape(token_scale.shape[0], -1),
        page_ids,
        offsets,
        active,
    )


def sharded_append_token_layer(
    pages_all: jnp.ndarray,  # [L, n_pages, KH, page, D]
    l: jnp.ndarray,
    token_kv: jnp.ndarray,  # [B, KH, D] rows over (data, fsdp)
    page_ids: jnp.ndarray,  # [B] GLOBAL ids
    offsets: jnp.ndarray,
    active: jnp.ndarray,
    mesh,
) -> jnp.ndarray:
    """shard_map'd :func:`append_token_layer` (global ids rebased)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    row = P(ROW_AXES)
    pool = P(None, ROW_AXES, "model", None, None)

    def local(pages_all, l, token_kv, page_ids, offsets, active):
        local_ids = page_ids - _row_offset(pages_all.shape[1])
        local_ids = jnp.clip(local_ids, 0, pages_all.shape[1] - 1)
        return append_token_layer(
            pages_all, l, token_kv, local_ids, offsets, active
        )

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(pool, P(), P(ROW_AXES, "model", None), row, row, row),
        out_specs=pool,
        check_vma=False,
    )(pages_all, l, token_kv, page_ids, offsets, active)


# ---------------------------------------------------------------------------
# Page write helpers (jnp; scatters fuse into the surrounding jit)
# ---------------------------------------------------------------------------


def write_prompt_pages(
    pages: jnp.ndarray,  # [n_pages, KH, page_size, D]
    new_kv: jnp.ndarray,  # [T, KH, D] prompt K or V (T % page_size == 0)
    page_ids: jnp.ndarray,  # [T // page_size] int32 allocated pages
) -> jnp.ndarray:
    """Scatter a prompt's KV into its allocated pages."""
    T, KH, D = new_kv.shape
    page_size = pages.shape[2]
    chunks = new_kv.reshape(T // page_size, page_size, KH, D).transpose(
        0, 2, 1, 3
    )  # [n, KH, page, D]
    return pages.at[page_ids].set(chunks.astype(pages.dtype))


# ---------------------------------------------------------------------------
# Fused append+attend kernels. The decode/verify step previously wrote the
# window's K/V (+ scales) into the page pools with 2-4 XLA scatters per
# layer and then re-read them through the page DMAs — measured at 10.9 ms
# of the 31 ms B=32 q8 decode step (scripts/bench_paged_attrib.py,
# docs/bench_logs/r4_paged_attrib_prefold.txt). Here the window enters the
# kernel as VMEM operands instead: it is attended directly from VMEM (a
# "virtual page" after the real-page loop) and streamed OUT to its page
# slots with fire-and-forget DMAs that are only waited at program end, so
# new tokens never round-trip through HBM before being attended and the
# kernel reads one page less whenever the window opens a fresh page.
# Toggle: FUSED_APPEND (trace-time). llama_paged_decode honors it
# (window=1); llama_paged_verify honors it for windows <= 16 (speculative
# verify and small chunk prefills) — larger windows keep the scatter +
# multi-query kernels, since this kernel unrolls one write DMA per window
# token and holds the whole window as a VMEM operand.
#
# DEFAULT False: the kernels are parity-validated in interpret mode (and
# against the scatter oracle), but Mosaic CANNOT lower the per-token
# write DMAs on real v5e — a 1-token slice on the page (second-minor)
# dim of a tiled pool fails "Slice shape along dimension 2 must be
# aligned to tiling (4), but is 1" (hardware compile captured 2026-08-20,
# docs/ROADMAP.md). Recovering the measured 10.9 ms/step scatter cost
# needs a tile-aligned write strategy (e.g. a token-minor tail buffer),
# not this slice shape. Flip only after a hardware compile succeeds.
# ---------------------------------------------------------------------------

FUSED_APPEND = False


def _carry_kernel_fused(
    # scalar prefetch
    table_ref,  # [B, P_max] int32 LOCAL page ids
    lengths_ref,  # [B] tokens INCLUDING the window for ACTIVE rows
    pos_ref,  # [B] absolute position of window token 0 (storage slot)
    layer_ref,  # [1] int32
    active_ref,  # [B] int32 (0 = finished row: no writes, no window step)
    *refs,
    scale: float,
    page_size: int,
    window: int,
    quantized: bool,
):
    """Shared fused-append kernel body (bf16 pools and int8+scales pools).

    Mask split: pre-window tokens (all ``old = length - window*active`` of
    them) are visible to every query column, so the page loop runs the
    shared step with ``length=old, window=1``; the window itself is a
    virtual in-VMEM page with the intra-window causal mask (column c
    attends window token t <= c % window). Together these reproduce the
    non-fused kernels' ``tok <= (length - window) + t`` exactly."""
    if quantized:
        (q_ref, nk_ref, nv_ref, nks_ref, nvs_ref,
         kp_hbm, vp_hbm, ks_hbm, vs_hbm,
         o_ref, kp_out, vp_out, ks_out, vs_out,
         kbuf, vbuf, ksbuf, vsbuf,
         ksem, vsem, kssem, vssem,
         wksem, wvsem, wkssem, wvssem) = refs
    else:
        (q_ref, nk_ref, nv_ref,
         kp_hbm, vp_hbm,
         o_ref, kp_out, vp_out,
         kbuf, vbuf, ksem, vsem,
         wksem, wvsem) = refs
        nks_ref = nvs_ref = ks_hbm = vs_hbm = None
        ksbuf = vsbuf = kssem = vssem = wkssem = wvssem = None
        ks_out = vs_out = None

    b = pl.program_id(0)
    l = layer_ref[0]
    act = active_ref[b] != 0
    length = lengths_ref[b]
    base = pos_ref[b]
    n_pages_total = kp_hbm.shape[1]
    old = length - jnp.where(act, window, 0)
    n_read = (old + page_size - 1) // page_size

    # --- fire-and-forget writes of the window into its page slots -------
    def write_dma(t, src, pool, sem, *, scales):
        pos = base + t
        pg = jnp.clip(table_ref[b, pos // page_size], 0, n_pages_total - 1)
        # Finished rows park their (meaningless) writes on the scratch
        # page — same contract as append_tokens_layer.
        pg = jnp.where(act, pg, n_pages_total - 1)
        off = pos % page_size
        if scales:
            return pltpu.make_async_copy(
                src.at[0, :, pl.ds(t, 1)],
                pool.at[l, pg, :, pl.ds(off, 1)],
                sem.at[t],
            )
        return pltpu.make_async_copy(
            src.at[0, :, pl.ds(t, 1), :],
            pool.at[l, pg, :, pl.ds(off, 1), :],
            sem.at[t],
        )

    # Writes target the OUTPUT refs (the alias makes them the same HBM
    # buffer as the inputs on hardware; interpret mode copies in->out
    # before the body, so writes land on top either way).
    #
    # INVARIANT (hardware-only overlap): when ``old % page_size != 0``
    # these fire-and-forget writes land in the SAME HBM page the final
    # page-read DMA below fetches (aliased buffer), so that page's read
    # may observe pre- or post-write bytes for the window's slots. That
    # is benign ONLY because those slots sit at positions >= old and the
    # page-loop mask (`tok < old`) discards them — the window is attended
    # exclusively from its VMEM operand. Interpret mode reads the
    # pre-copy input and cannot exercise this; keep the mask split intact
    # under refactors.
    wstreams = [(nk_ref, kp_out, wksem, False), (nv_ref, vp_out, wvsem, False)]
    if quantized:
        wstreams += [
            (nks_ref, ks_out, wkssem, True),
            (nvs_ref, vs_out, wvssem, True),
        ]
    for t in range(window):
        for src, pool, sem, sc in wstreams:
            write_dma(t, src, pool, sem, scales=sc).start()

    # --- page loop over the pre-window tokens ---------------------------
    rstreams = [(kbuf, ksem, kp_hbm), (vbuf, vsem, vp_hbm)]
    if quantized:
        rstreams += [(ksbuf, kssem, ks_hbm), (vsbuf, vssem, vs_hbm)]

    def page_dma(slot, j, buf, sem, pool):
        pg = jnp.clip(table_ref[b, j], 0, n_pages_total - 1)
        return pltpu.make_async_copy(
            pool.at[l, pg], buf.at[slot], sem.at[slot]
        )

    @pl.when(n_read > 0)
    def _warmup():
        for buf, sem, pool in rstreams:
            page_dma(0, 0, buf, sem, pool).start()

    q = q_ref[0]  # [KH, C, D]
    KH, C, D = q.shape
    dt = q.dtype

    def body(j, carry):
        slot = j % 2
        nxt = (j + 1) % 2

        @pl.when(j + 1 < n_read)
        def _prefetch():
            for buf, sem, pool in rstreams:
                page_dma(nxt, j + 1, buf, sem, pool).start()

        for buf, sem, pool in rstreams:
            page_dma(slot, j, buf, sem, pool).wait()
        if quantized:
            k, v = kbuf[slot].astype(dt), vbuf[slot].astype(dt)
            ks, vs = ksbuf[slot], vsbuf[slot]
        else:
            k, v = kbuf[slot], vbuf[slot]
            ks = vs = None
        # All pre-window tokens are visible to every column: length=old
        # with window=1 gives the plain ``tok < old`` mask.
        return _online_softmax_page_step(
            q, k, v, j, carry,
            length=old, window=1, page_size=page_size,
            scale=scale, k_scale=ks, v_scale=vs,
        )

    m0 = jnp.full((KH, C, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((KH, C, 1), jnp.float32)
    a0 = jnp.zeros((KH, C, D), jnp.float32)
    carry = jax.lax.fori_loop(0, n_read, body, (m0, l0, a0))

    # --- virtual in-VMEM page: the window itself -------------------------
    # length = window iff active (else fully masked); page_size=window
    # makes the iota span the window; the helper's ``t = c % window``
    # yields the intra-window causal mask tok <= t.
    m, lsum, acc = _online_softmax_page_step(
        q, nk_ref[0].astype(dt), nv_ref[0].astype(dt), 0, carry,
        length=jnp.where(act, window, 0), window=window, page_size=window,
        scale=scale,
        k_scale=nks_ref[0] if quantized else None,
        v_scale=nvs_ref[0] if quantized else None,
    )
    l_safe = jnp.where(lsum == 0.0, 1.0, lsum)
    o_ref[0] = (acc / l_safe).astype(o_ref.dtype)

    # Writes were overlapped with the whole page loop; settle them before
    # the program ends (next layer / next row may touch those pages).
    for t in range(window):
        for src, pool, sem, sc in wstreams:
            write_dma(t, src, pool, sem, scales=sc).wait()


@functools.partial(jax.jit, static_argnames=("window", "interpret"))
def carry_paged_attention_fused(
    q: jnp.ndarray,  # [B, k, H, D]
    new_k: jnp.ndarray,  # [B, k, KH, D] pool dtype (int8: pre-quantized)
    new_v: jnp.ndarray,
    k_pages: jnp.ndarray,  # [L, n_pages, KH, page, D] STACKED pool
    v_pages: jnp.ndarray,
    page_table: jnp.ndarray,  # [B, P_max] int32 LOCAL ids
    lengths: jnp.ndarray,  # [B] tokens INCLUDING the window (active rows)
    positions: jnp.ndarray,  # [B] absolute position of window token 0
    active: jnp.ndarray,  # [B] bool
    layer: jnp.ndarray,
    *,
    window: int,
    interpret: bool = False,
    k_scale: jnp.ndarray | None = None,  # [L, n_pages, KH, page] f32
    v_scale: jnp.ndarray | None = None,
    new_ks: jnp.ndarray | None = None,  # [B, k, KH] f32
    new_vs: jnp.ndarray | None = None,
):
    """Fused append+attend over paged KV (decode at window=1, speculative
    verify at window=k). Appends ``new_k``/``new_v`` (+ scales for int8
    pools) into each active row's page slots from INSIDE the kernel and
    attends them from VMEM. Same pass-through aliasing contract as the
    non-fused kernels. Returns (out [B, k, H, D], k_pages, v_pages[,
    k_scale, v_scale])."""
    B, k, H, D = q.shape
    assert k == window
    L, n_pages, KH, page_size, _ = k_pages.shape
    assert H % KH == 0, (H, KH)
    quantized = k_scale is not None
    if quantized:
        assert k_pages.dtype == jnp.int8, k_pages.dtype
        assert interpret or page_size % 128 == 0, (
            f"int8 paged KV requires page_size % 128 == 0, got {page_size}"
        )
    group = H // KH
    scale = D**-0.5
    layer = jnp.asarray(layer, jnp.int32).reshape(1)
    active_i = jnp.asarray(active, jnp.int32)
    positions = jnp.asarray(positions, jnp.int32)
    qt = (
        q.reshape(B, k, KH, group, D)
        .transpose(0, 2, 3, 1, 4)
        .reshape(B, KH, group * k, D)
    )
    nk = new_k.transpose(0, 2, 1, 3)  # [B, KH, k, D]
    nv = new_v.transpose(0, 2, 1, 3)

    kernel = functools.partial(
        _carry_kernel_fused,
        scale=scale,
        page_size=page_size,
        window=window,
        quantized=quantized,
    )
    C = group * k
    pool_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    row_block = pl.BlockSpec(
        (1, KH, C, D), lambda b, *_: (b, 0, 0, 0), memory_space=pltpu.VMEM
    )
    new_block = pl.BlockSpec(
        (1, KH, k, D), lambda b, *_: (b, 0, 0, 0), memory_space=pltpu.VMEM
    )
    in_specs = [row_block, new_block, new_block]
    operands = [qt, nk, nv]
    if quantized:
        nscale_block = pl.BlockSpec(
            (1, KH, k), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM
        )
        in_specs += [nscale_block, nscale_block]
        operands += [
            new_ks.transpose(0, 2, 1),  # [B, KH, k]
            new_vs.transpose(0, 2, 1),
        ]
    n_pools = 4 if quantized else 2
    in_specs += [pool_spec] * n_pools
    pools = [k_pages, v_pages] + ([k_scale, v_scale] if quantized else [])
    operands += pools

    scratch = [
        pltpu.VMEM((2, KH, page_size, D), k_pages.dtype),
        pltpu.VMEM((2, KH, page_size, D), v_pages.dtype),
    ]
    if quantized:
        scratch += [
            pltpu.VMEM((2, KH, page_size), jnp.float32),
            pltpu.VMEM((2, KH, page_size), jnp.float32),
        ]
    scratch += [pltpu.SemaphoreType.DMA((2,))] * (4 if quantized else 2)
    scratch += [pltpu.SemaphoreType.DMA((window,))] * (4 if quantized else 2)

    # Alias each pool operand onto its output slot (output 0 is `out`).
    # Operand indices INCLUDE the 5 scalar-prefetch args.
    first_pool = 5 + len(in_specs) - n_pools
    aliases = {first_pool + i: 1 + i for i in range(n_pools)}

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(B,),
        in_specs=in_specs,
        out_specs=[row_block] + [pool_spec] * n_pools,
        scratch_shapes=scratch,
    )
    res = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, KH, C, D), q.dtype)]
        + [jax.ShapeDtypeStruct(p.shape, p.dtype) for p in pools],
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=_MULTI_VMEM_LIMIT
        ),
        interpret=interpret,
    )(page_table, lengths, positions, layer, active_i, *operands)
    out = (
        res[0]
        .reshape(B, KH, group, k, D)
        .transpose(0, 3, 1, 2, 4)
        .reshape(B, k, H, D)
    )
    return (out,) + tuple(res[1:])


def sharded_carry_paged_attention_fused(
    q, new_k, new_v, k_pages, v_pages, page_table, lengths, positions,
    active, layer, mesh, *, window: int, interpret: bool = False,
    k_scale=None, v_scale=None, new_ks=None, new_vs=None,
):
    """shard_map'd :func:`carry_paged_attention_fused` (rows over data x
    fsdp, heads over model, GLOBAL page ids rebased per shard)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    quantized = k_scale is not None
    row = P(ROW_AXES)
    pool = P(None, ROW_AXES, "model", None, None)
    spool = P(None, ROW_AXES, "model", None)
    bh = P(ROW_AXES, None, "model", None)
    bs = P(ROW_AXES, None, "model")
    layer = jnp.asarray(layer, jnp.int32).reshape(1)

    if quantized:

        def local(q, nk, nv, kp, vp, ks, vs, nks, nvs, table, lengths,
                  positions, active, layer):
            local_table = table - _row_offset(kp.shape[1])
            return carry_paged_attention_fused(
                q, nk, nv, kp, vp, local_table, lengths, positions,
                active, layer[0], window=window, interpret=interpret,
                k_scale=ks, v_scale=vs, new_ks=nks, new_vs=nvs,
            )

        return shard_map(
            local,
            mesh=mesh,
            in_specs=(bh, bh, bh, pool, pool, spool, spool, bs, bs,
                      row, row, row, row, P(None)),
            out_specs=(bh, pool, pool, spool, spool),
            check_vma=False,
        )(q, new_k, new_v, k_pages, v_pages, k_scale, v_scale, new_ks,
          new_vs, page_table, lengths, positions, active, layer)

    def local(q, nk, nv, kp, vp, table, lengths, positions, active, layer):
        local_table = table - _row_offset(kp.shape[1])
        return carry_paged_attention_fused(
            q, nk, nv, kp, vp, local_table, lengths, positions, active,
            layer[0], window=window, interpret=interpret,
        )

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(bh, bh, bh, pool, pool, row, row, row, row, P(None)),
        out_specs=(bh, pool, pool),
        check_vma=False,
    )(q, new_k, new_v, k_pages, v_pages, page_table, lengths, positions,
      active, layer)
