"""Prompt-lookup speculative decoding for greedy generation.

Additive TPU-native serving feature (no reference counterpart — the
reference decodes strictly one token per forward through HF
``GenerationMixin``, vcoder_llava/serve/cli.py:121-132). Greedy decoding
(the reference's eval setting, scripts/v1_5/eval/cost.sh ``--temperature
0``) is deterministic, so a cheap draft-and-verify scheme emits the
same tokens while running fewer decoder dispatches:

1. **Draft**: propose ``lookahead - 1`` continuation tokens by n-gram
   lookup in the token history (prompt + generated so far) — COST-style
   answers repeat object nouns from earlier context, so history matches
   are frequent. A 3-gram match is preferred over a 2-gram match; no
   match proposes junk (which simply fails verification).
2. **Verify**: ONE decoder dispatch over the ``lookahead`` tokens
   ``[current, draft...]`` (multi-token cache append via
   ``llama_forward``'s ``write_offset`` path). Decode at these batch
   sizes is weight-streaming bound, so a k-token verify costs nearly
   the same HBM traffic as a 1-token step.
3. **Accept**: the longest prefix of drafts matching the model's own
   greedy argmax is emitted, plus the model's token at the first
   mismatch — at least 1 and up to ``lookahead`` tokens per dispatch.
   The KV cache is trimmed back to the accepted length (mask + length;
   rejected slots are overwritten by the next dispatch).

Execution structure (shaped by two measured failure modes,
docs/PERFORMANCE.md): draft + verify + accept + history/output updates
all live in ONE single-step jit whose weights are ENTRY parameters —
a fused ``lax.while_loop`` closing over the params makes XLA's loop
layout assignment relayout the stacked q/k/v projections for the T=k
matmul (~1 GB copies each, the round-1 bf16 batched-decode OOM), while
entry parameters are never copied. The host loop dispatches steps
back-to-back with NO per-step fetch (every device->host sync costs a
full tunnel round trip); it polls ``done`` once per ``poll_every``
dispatches, and overshoot dispatches are harmless (done rows emit 0).

Exactness: by induction, ``pred[:, j]`` is computed from a context that
equals the sequential-greedy context whenever drafts ``0..j-1`` were
accepted, so emitted tokens match one-token-at-a-time greedy decoding
(asserted bit-exact on the f32 CPU tests; on-TPU bf16 matmuls for T=k
vs T=1 may round differently, which can flip argmax only at near-exact
logit ties — the same tie sensitivity any backend/batching change has).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vcoder_tpu.config import VCoderConfig
from vcoder_tpu.models import llama as llama_mod
from vcoder_tpu.models import vcoder as model_mod
from vcoder_tpu.models.llama import KVCache


# ---------------------------------------------------------------------------
# Drafting (vectorized, runs inside the step jit)
# ---------------------------------------------------------------------------


def _best_match(history: jnp.ndarray, hist_len: jnp.ndarray, n: int):
    """Latest start s with history[s:s+n] == the last n tokens and at
    least one continuation token before ``hist_len``. Returns [B] int32
    (-1 when no match)."""
    B, H = history.shape
    W = H - n
    key_idx = jnp.clip(
        hist_len[:, None] - n + jnp.arange(n)[None, :], 0, H - 1
    )
    key = jnp.take_along_axis(history, key_idx, axis=1)  # [B, n]
    m = jnp.ones((B, W), bool)
    for j in range(n):
        m &= history[:, j : j + W] == key[:, j : j + 1]
    starts = jnp.arange(W, dtype=jnp.int32)[None, :]
    m &= starts + n < hist_len[:, None]
    return jnp.max(jnp.where(m, starts, -1), axis=1)  # [B]


def ngram_draft(
    history: jnp.ndarray,  # [B, H] int32 (sentinels < 0 never match)
    hist_len: jnp.ndarray,  # [B]
    num_draft: int,
) -> jnp.ndarray:
    """Propose ``num_draft`` continuation tokens per row by prompt-lookup:
    find the most recent earlier occurrence of the trailing 3-gram (else
    2-gram) and return the tokens that followed it. Rows with no match
    get zeros — junk drafts are harmless, verification rejects them."""
    B, H = history.shape
    best3 = _best_match(history, hist_len, 3)
    best2 = _best_match(history, hist_len, 2)
    cont = jnp.where(best3 >= 0, best3 + 3, best2 + 2)  # [B]
    found = (best3 >= 0) | (best2 >= 0)
    raw = cont[:, None] + jnp.arange(num_draft, dtype=jnp.int32)[None, :]
    idx = jnp.clip(raw, 0, H - 1)
    draft = jnp.take_along_axis(history, idx, axis=1)
    # Clamp junk: positions at/after hist_len or unmatched rows. Test
    # the UNCLIPPED index — with a full buffer (hist_len == H) the
    # clipped idx stays < hist_len and would repeat history[H-1] where
    # the host twin (ngram_draft_np) correctly emits zeros.
    ok = found[:, None] & (raw < hist_len[:, None])
    return jnp.where(ok, draft, 0).astype(jnp.int32)


def _best_match_np(row: np.ndarray, length: int, n: int) -> int:
    """Host twin of :func:`_best_match` (numpy, one row)."""
    if length < n + 1:
        return -1
    key = row[length - n : length]
    W = length - n
    if W <= 0:
        return -1
    m = np.ones(W, bool)
    for j in range(n):
        m &= row[j : j + W] == key[j]
    idx = np.nonzero(m)[0]
    return int(idx[-1]) if idx.size else -1


def ngram_draft_np(
    history: np.ndarray,  # [B, H] int32
    hist_len: np.ndarray,  # [B]
    num_draft: int,
) -> np.ndarray:
    """Host twin of :func:`ngram_draft` for callers that already sync to
    the host every step (the serving engines fetch each step's tokens for
    event emission, so host drafting adds no extra device round trip)."""
    B = history.shape[0]
    out = np.zeros((B, num_draft), np.int32)
    for b in range(B):
        L = int(hist_len[b])
        s = _best_match_np(history[b], L, 3)
        n = 3
        if s < 0:
            s = _best_match_np(history[b], L, 2)
            n = 2
        if s < 0:
            continue
        cont = history[b, s + n : min(s + n + num_draft, L)]
        out[b, : cont.size] = cont
    return out


def draft_from_ids(
    rows: Sequence[Optional[Sequence[int]]], num_draft: int
) -> np.ndarray:
    """Per-row prompt-lookup drafts from python token lists (None rows ->
    zero drafts). Convenience for the serving engines' slot state."""
    B = len(rows)
    out = np.zeros((B, num_draft), np.int32)
    for b, ids in enumerate(rows):
        if not ids:
            continue
        row = np.asarray(ids, np.int32)
        out[b] = ngram_draft_np(row[None, :], np.asarray([len(ids)]),
                                num_draft)[0]
    return out


def build_history(
    input_ids: Sequence[Sequence[int]], max_new_tokens: int, lookahead: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side history buffer: prompt ids (sentinels < 0 act as match
    barriers — generated tokens are always >= 0) plus room for the
    generated tokens."""
    lens = np.asarray([len(r) for r in input_ids], np.int32)
    H = int(lens.max()) + max_new_tokens + lookahead
    hist = np.full((len(input_ids), H), -1, np.int32)
    for b, row in enumerate(input_ids):
        hist[b, : len(row)] = np.asarray(row, np.int32)
    return hist, lens


def accept_window(
    outs: jnp.ndarray,  # [B, k] model tokens per window position
    draft: jnp.ndarray,  # [B, k-1] proposed drafts
    no_accept: jnp.ndarray,  # [B] bool rows whose drafts never count
    inactive: jnp.ndarray,  # [B] bool rows that emit 0
    budget: jnp.ndarray,  # [B] int32 max tokens each row may emit
    eos_id: int,
):
    """Shared window-acceptance rule for every speculative jit
    (:func:`_spec_step_jit`, engine ``_spec_decode_all``, paged
    ``_paged_spec_decode_all`` — change it HERE so the paths never
    diverge): accept the longest prefix of drafts matching ``outs`` plus
    the model's correction token, cap at the first emitted EOS, then at
    ``budget``; ``inactive`` rows emit 0. Returns (emit [B], nxt [B])
    where ``nxt`` is the last emitted token (next step's input; a row
    that emitted its EOS has ``nxt == eos_id``)."""
    B, k = outs.shape
    rows = jnp.arange(B, dtype=jnp.int32)
    jpos = jnp.arange(k, dtype=jnp.int32)[None, :]
    match = (outs[:, :-1] == draft) & ~no_accept[:, None]
    accepted = jnp.cumprod(match.astype(jnp.int32), axis=1).sum(axis=1)
    emit = accepted + 1
    is_eos = (outs == eos_id) & (jpos < emit[:, None])
    has_eos = jnp.any(is_eos, axis=1)
    first_eos = jnp.min(jnp.where(is_eos, jpos, k), axis=1)
    emit = jnp.where(has_eos, jnp.minimum(emit, first_eos + 1), emit)
    emit = jnp.where(inactive, 0, jnp.minimum(emit, budget))
    last = jnp.clip(emit - 1, 0, k - 1)
    nxt = outs[rows, last]
    return emit, nxt


def trim_cache(cache: KVCache, new_len: jnp.ndarray) -> KVCache:
    """Trim rows to the accepted length after a verify dispatch: rejected
    slots stay as garbage but are masked out (prefix-contiguous contract
    — kv_mask is exactly pos < length) and overwritten by the next
    dispatch. Like :func:`accept_window`, this is THE trim rule for
    every speculative jit (this module's step and the engines' verify) —
    change it HERE so the paths can never diverge."""
    S = cache.k.shape[2]
    pos_s = jnp.arange(S, dtype=jnp.int32)[None, :]
    return KVCache(
        k=cache.k,
        v=cache.v,
        kv_mask=pos_s < new_len[:, None],
        length=new_len,
        k_scale=cache.k_scale,
        v_scale=cache.v_scale,
    )


# ---------------------------------------------------------------------------
# One speculative step: draft -> verify -> accept -> state update
# ---------------------------------------------------------------------------


@partial(
    jax.jit,
    static_argnames=("cfg", "lookahead", "max_new_tokens", "eos_id", "attn_impl"),
    donate_argnums=(3, 4, 5, 6, 7, 8),
)
def _spec_step_jit(
    params,
    cfg: VCoderConfig,
    tok,  # [B] current token (KV not yet written)
    cache: KVCache,
    done,  # [B] bool
    history,  # [B, H] int32
    hist_len,  # [B] int32
    cursor,  # [B] int32 tokens generated so far
    out_buf,  # [B, max_new_tokens + lookahead] int32 (slack absorbs drops)
    *,
    lookahead: int,
    max_new_tokens: int,
    eos_id: int,
    attn_impl: str,
):
    """Draft + one multi-token verify dispatch + accept + state update.

    The whole speculative step is one device dispatch with the params as
    entry arguments; the host chains these back-to-back without fetching.
    """
    B = tok.shape[0]
    k = lookahead
    H = history.shape[1]
    rows = jnp.arange(B, dtype=jnp.int32)
    jpos = jnp.arange(k, dtype=jnp.int32)[None, :]

    draft = ngram_draft(history, hist_len, k - 1)  # [B, k-1]
    positions0 = cache.length  # == prompt_len + generated - 1, per row
    ids = jnp.concatenate([tok[:, None], draft], axis=1)  # [B, k]
    embeds = llama_mod.embed_tokens(params["lm"], ids)
    positions = positions0[:, None] + jnp.arange(k, dtype=jnp.int32)[None, :]
    hidden, cache = llama_mod.llama_forward(
        params["lm"],
        cfg.text,
        embeds,
        attn_mask=jnp.ones((B, k), bool),
        position_ids=positions,
        cache=cache,
        write_offset=positions0,
        attn_impl=attn_impl,
    )
    logits = llama_mod.lm_head(params["lm"], hidden)  # [B, k, V]
    pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    emit, nxt = accept_window(
        pred,
        draft,
        jnp.zeros((B,), bool),  # all rows greedy here
        done,
        jnp.maximum(max_new_tokens - cursor, 0),
        eos_id,
    )

    live = jpos < emit[:, None]
    widx = jnp.where(live, cursor[:, None] + jpos, out_buf.shape[1])
    out_buf = out_buf.at[rows[:, None], widx].set(pred, mode="drop")
    hidx = jnp.where(live, hist_len[:, None] + jpos, H)
    history = history.at[rows[:, None], hidx].set(pred, mode="drop")
    hist_len = jnp.minimum(hist_len + emit, H)

    cache = trim_cache(cache, positions0 + emit)

    cursor = cursor + emit
    done = (
        done
        | ((emit > 0) & (nxt == eos_id))  # a row's EOS is its last emit
        | (cursor >= max_new_tokens)
    )
    nxt = jnp.where(done, eos_id, nxt)
    return nxt, cache, done, history, hist_len, cursor, out_buf


def generate_speculative(
    params: dict,
    cfg: VCoderConfig,
    input_ids: Sequence[Sequence[int]],
    images: Optional[jnp.ndarray] = None,
    segs: Optional[jnp.ndarray] = None,
    depths: Optional[jnp.ndarray] = None,
    *,
    max_new_tokens: int = 512,
    lookahead: int = 8,
    is_depth_zero: Optional[Sequence[bool]] = None,
    is_seg_zero: Optional[Sequence[bool]] = None,
    attn_impl: str = "auto",
    pad_to: Optional[int] = None,
    poll_every: int = 8,
    on_tokens=None,
):
    """Greedy generation via prompt-lookup speculative decoding.

    Drop-in for :func:`vcoder_tpu.generation.generate` at temperature 0
    (same splice plan, same outputs — fewer decoder dispatches). Returns
    (sequences [B, max_new_tokens], num_generated [B], n_dispatches).

    ``poll_every`` controls how many speculative steps are dispatched
    between ``done`` polls (each poll is a device->host sync; overshoot
    steps on finished rows emit nothing). ``on_tokens(b, tokens)`` —
    optional streaming callback invoked with each row's newly accepted
    token ids after every poll window; returning ``False`` aborts
    generation (stop-string support for streaming UIs).
    """
    from vcoder_tpu.generation import _prefill_jit
    from vcoder_tpu.multimodal import build_splice_plan, validate_features

    if lookahead < 2:
        raise ValueError("lookahead must be >= 2 (1 current + >=1 draft)")
    if on_tokens is not None:
        poll_every = 1
    plan = build_splice_plan(
        input_ids,
        num_patches=cfg.vision.num_patches,
        has_image=images is not None,
        has_seg=segs is not None,
        has_depth=depths is not None,
        ds_mode=cfg.model_type == "vcoder_ds_llava",
        it_mode=cfg.model_type == "vcoder_it_llava",
        is_depth_zero=is_depth_zero,
        is_seg_zero=is_seg_zero,
        pad_to=pad_to,
    )
    validate_features(plan, images, segs, depths)
    plan_arrays = model_mod.plan_to_arrays(plan)
    B, T = plan.safe_ids.shape
    k = lookahead
    eos = cfg.text.eos_token_id
    dummy = jnp.zeros((0,), jnp.float32)

    logits, cache = _prefill_jit(
        params,
        cfg,
        plan_arrays,
        images if images is not None else dummy,
        segs if segs is not None else dummy,
        depths if depths is not None else dummy,
        cache_len=T + max_new_tokens + k,
        use_vcoder_emb=plan.use_vcoder_emb and cfg.use_vcoder_lm_emb,
        attn_impl=attn_impl,
        has_images=images is not None,
        has_segs=segs is not None,
        has_depths=depths is not None,
    )
    first_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    history_np, hist_len_np = build_history(input_ids, max_new_tokens, k)
    H = history_np.shape[1]
    rows = jnp.arange(B, dtype=jnp.int32)

    tok = first_tok
    done = first_tok == eos
    history = jnp.asarray(history_np)
    hist_len = jnp.asarray(hist_len_np)
    # Record the first token in history + output buffer (device side).
    history = history.at[
        rows, jnp.where((hist_len < H) & ~done, hist_len, H)
    ].set(first_tok, mode="drop")
    hist_len = jnp.where(done, hist_len, jnp.minimum(hist_len + 1, H))
    out_buf = jnp.full((B, max_new_tokens + k), eos, jnp.int32)
    out_buf = out_buf.at[:, 0].set(first_tok)
    cursor = jnp.ones((B,), jnp.int32)
    done = done | (cursor >= max_new_tokens)

    streamed = np.zeros((B,), np.int64)  # tokens already sent to on_tokens
    aborted = False
    if on_tokens is not None:
        for b in range(B):
            t0 = int(np.asarray(first_tok)[b])
            if t0 != eos:
                if on_tokens(b, [t0]) is False:
                    # Abort means NO further callbacks — stop the fanout
                    # to the remaining rows, not just this one.
                    aborted = True
                    break
                streamed[b] = 1

    iters = 0
    # One upper bound on dispatches (every live step emits >= 1 token);
    # the done poll exits far earlier in practice.
    max_iters = max_new_tokens
    while iters < max_iters and not aborted:
        for _ in range(poll_every):
            tok, cache, done, history, hist_len, cursor, out_buf = (
                _spec_step_jit(
                    params,
                    cfg,
                    tok,
                    cache,
                    done,
                    history,
                    hist_len,
                    cursor,
                    out_buf,
                    lookahead=k,
                    max_new_tokens=max_new_tokens,
                    eos_id=eos,
                    attn_impl=attn_impl,
                )
            )
            iters += 1
        done_h = np.asarray(done)
        if on_tokens is not None:
            cur_h = np.asarray(cursor)
            buf_h = np.asarray(out_buf)
            for b in range(B):
                if aborted:
                    # No callbacks after a False return — the consumer
                    # may have torn down its per-request state.
                    break
                n = int(cur_h[b])
                while streamed[b] < n and buf_h[b, streamed[b]] != eos:
                    if on_tokens(b, [int(buf_h[b, streamed[b]])]) is False:
                        aborted = True
                        break
                    streamed[b] += 1
        if done_h.all():
            break

    seqs = np.asarray(out_buf[:, :max_new_tokens])
    cursor_h = np.asarray(cursor)
    num_gen = cursor_h.astype(np.int64).copy()
    # A trailing EOS is counted as generated only when it is the genuine
    # stop token (sequential greedy counts tokens before EOS).
    for b in range(B):
        row_eos = np.nonzero(seqs[b] == eos)[0]
        if row_eos.size:
            num_gen[b] = min(num_gen[b], int(row_eos[0]))
    return seqs, num_gen, iters
