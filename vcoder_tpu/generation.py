"""Autoregressive generation: fused prefill + on-device decode loop.

Replaces the reference's HF ``GenerationMixin`` loop (reference:
vcoder_llava/serve/cli.py:121-132, eval/model_seg_loader.py:127-149) with a
TPU-native design: prefill is one compiled graph, decode is a
``lax.while_loop`` that stays on device until every row hits EOS or the
token budget — no per-token host round-trips. Stop-*strings* (the
reference's ``KeywordsStoppingCriteria``, mm_utils.py:128-151) terminate
generation early: when a ``stopping_criteria`` is passed, decode runs in
fixed-size on-device windows and the criteria is evaluated host-side on
each window's tokens, halting a row within one window of its stop string
(matching the reference's per-step criteria without per-token host
round-trips). Without criteria, decode is one fused loop to EOS/budget.

Sampling matches HF semantics: temperature scaling then top-p nucleus
filtering (reference serve path uses temperature 0.2; eval uses greedy).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from vcoder_tpu.config import VCoderConfig
from vcoder_tpu.models import vcoder as model_mod
from vcoder_tpu.models.llama import KVCache
from vcoder_tpu.multimodal import build_splice_plan, validate_features


def nucleus_filter(
    logits: jnp.ndarray,  # [B, V] (already temperature-scaled)
    top_p: jnp.ndarray,  # [B] or scalar
) -> jnp.ndarray:
    """Mask logits outside each row's top-p nucleus to -inf.

    Keeps tokens until the cumulative prob exceeds top_p; the first token
    crossing the threshold is kept (HF convention). The single nucleus
    rule for every sampling path — generate(), the streaming path, and
    both serving engines — so they can never diverge."""
    top_p = jnp.asarray(top_p)
    if top_p.ndim == 1:
        top_p = top_p[:, None]
    sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
    sorted_probs = jax.nn.softmax(sorted_logits, axis=-1)
    cumprobs = jnp.cumsum(sorted_probs, axis=-1)
    keep = cumprobs - sorted_probs < top_p
    # HF's min_tokens_to_keep=1: top_p <= 0 (reachable from the gradio
    # slider / wire params) must degenerate to greedy, not mask the
    # whole vocabulary (which would emit token id 0 forever).
    keep = keep.at[:, 0].set(True)
    threshold = jnp.min(
        jnp.where(keep, sorted_logits, jnp.inf), axis=-1, keepdims=True
    )
    return jnp.where(logits >= threshold, logits, -jnp.inf)


def sample_token(
    logits: jnp.ndarray,  # [B, V] f32
    rng: jax.Array,
    *,
    temperature: float,
    top_p: float,
) -> jnp.ndarray:
    """Greedy when temperature == 0, else temperature + nucleus sampling."""
    if temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / temperature
    if top_p < 1.0:
        logits = nucleus_filter(logits, top_p)
    return jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)


def sample_token_batch(
    logits: jnp.ndarray,  # [B, V]
    rng: jax.Array,
    temperature: jnp.ndarray,  # [B] f32 — rows <= 0 are greedy
    top_p: jnp.ndarray,  # [B] f32 — rows >= 1 skip the nucleus filter
    *,
    nucleus: bool = True,
) -> jnp.ndarray:
    """Per-row sampling rule for the serving engines (the vectorized twin
    of :func:`sample_token` — per-request temperature AND top_p ride as
    vectors through one [B] decode dispatch). ``nucleus=False`` skips the
    vocab sort entirely when the engine knows no active row wants it."""
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    temp_safe = jnp.maximum(temperature, 1e-6)
    scaled = logits / temp_safe[:, None]
    if nucleus:
        # Rows with top_p >= 1 keep every token (the filter is identity
        # up to -inf on zero-probability tails, which categorical never
        # draws anyway).
        scaled = nucleus_filter(scaled, top_p)
    sampled = jax.random.categorical(rng, scaled, axis=-1).astype(jnp.int32)
    return jnp.where(temperature > 0.0, sampled, greedy)


@dataclasses.dataclass
class GenerationResult:
    sequences: np.ndarray  # [B, max_new_tokens] generated ids (pad after EOS)
    num_generated: np.ndarray  # [B]
    texts: Optional[list] = None


@partial(
    jax.jit,
    static_argnames=(
        "cfg",
        "max_new_tokens",
        "temperature",
        "top_p",
        "eos_id",
        "use_vcoder_emb",
        "attn_impl",
        "has_images",
        "has_segs",
        "has_depths",
    ),
)
def _generate_jit(
    params,
    cfg: VCoderConfig,
    plan_arrays,
    images,
    segs,
    depths,
    rng,
    *,
    max_new_tokens: int,
    temperature: float,
    top_p: float,
    eos_id: int,
    use_vcoder_emb: bool,
    attn_impl: str,
    has_images: bool,
    has_segs: bool,
    has_depths: bool,
):
    B, T = plan_arrays["safe_ids"].shape
    cache = KVCache.create(
        cfg.text,
        B,
        T + max_new_tokens,
        dtype=params["lm"]["embed_tokens"].dtype,
    )
    logits, cache = model_mod.prefill(
        params,
        cfg,
        plan_arrays,
        images if has_images else None,
        segs if has_segs else None,
        depths if has_depths else None,
        cache=cache,
        use_vcoder_emb=use_vcoder_emb,
        attn_impl=attn_impl,
    )

    rng0, rng = jax.random.split(rng)
    first_tok = sample_token(
        logits, rng0, temperature=temperature, top_p=top_p
    )

    # EOS-fill like every other decode path ("pad after EOS" contract):
    # an early all-done exit must not leave token id 0 past the end.
    out_buf = jnp.full((B, max_new_tokens), eos_id, jnp.int32)
    out_buf = out_buf.at[:, 0].set(first_tok)
    done = first_tok == eos_id

    def cond(state):
        step, _, _, done, _, _ = state
        return (step < max_new_tokens) & ~jnp.all(done)

    def body(state):
        step, tok, cache, done, out_buf, rng = state
        positions = plan_arrays["seq_lens"] + step - 1
        logits, cache = model_mod.decode_step(
            params, cfg, tok, positions, cache, attn_impl=attn_impl
        )
        rng, sub = jax.random.split(rng)
        nxt = sample_token(logits, sub, temperature=temperature, top_p=top_p)
        nxt = jnp.where(done, eos_id, nxt)
        out_buf = jax.lax.dynamic_update_slice_in_dim(
            out_buf, nxt[:, None], step, axis=1
        )
        done = done | (nxt == eos_id)
        return step + 1, nxt, cache, done, out_buf, rng

    step, _, cache, done, out_buf, _ = jax.lax.while_loop(
        cond, body, (1, first_tok, cache, done, out_buf, rng)
    )
    return out_buf, step


@partial(
    jax.jit,
    static_argnames=(
        "cfg",
        "max_new_tokens",
        "num_beams",
        "length_penalty",
        "eos_id",
        "use_vcoder_emb",
        "attn_impl",
        "has_images",
        "has_segs",
        "has_depths",
        "temperature",
        "top_p",
    ),
)
def _beam_generate_jit(
    params,
    cfg: VCoderConfig,
    plan_arrays,
    images,
    segs,
    depths,
    rng,
    *,
    max_new_tokens: int,
    num_beams: int,
    length_penalty: float,
    eos_id: int,
    use_vcoder_emb: bool,
    attn_impl: str,
    has_images: bool,
    has_segs: bool,
    has_depths: bool,
    temperature: float = 0.0,
    top_p: float = 1.0,
):
    """Beam search decode matching HF ``generate(num_beams=W)`` semantics
    (reference: vcoder_llava/eval/model_seg_loader.py:127-149 exposes
    ``--num_beams`` through HF's BeamSearchScorer; defaults
    length_penalty=1.0, early_stopping=False, do_sample=False).

    Semantics follow the REFACTORED transformers beam search (as
    installed, >=4.49; finished scores normalize by the generated length
    per PR #20901) and are token-matched against it in tests. The
    reference pins transformers 4.31, whose scorer normalized by
    prompt+generated length — a deliberate divergence that cannot affect
    any published number (every reference eval script runs
    ``--num_beams 1``).

    ``temperature > 0`` is HF's beam-sample mode: log-probs are scaled
    by 1/T (and nucleus-filtered when top_p < 1) exactly as HF's logits
    warpers do, and the 2W candidates are drawn WITHOUT replacement from
    the joint (beam, token) distribution — implemented as Gumbel top-k,
    which is distributionally identical to HF's `torch.multinomial`
    (different RNG, so sampled runs don't token-match HF). Accumulated
    beam scores keep the true (warped) log-probs, noise only steers
    selection, as in HF.

    One fused graph: prefill once at batch B, replicate the KV cache to
    B*W beam rows, then a ``lax.while_loop`` where each step (1) decodes
    one token per beam, (2) ranks the top 2W (parent, token) candidates
    per batch item — 2W so up-to-W EOS candidates can retire to the
    finished set and still leave W live continuations (HF's rule: only
    EOS candidates ranked < W are eligible), (3) folds retired hypotheses
    into a top-W finished set via a sorted merge (scores normalized by
    generated_length**length_penalty at retirement, HF's post-#20901
    convention), and (4) gathers cache rows by parent beam. A
    batch item is done when its worst finished score can't be beaten by
    the best live candidate (early_stopping=False heuristic). Returns the
    best sequence per batch item, EOS-filled past its end.

    The per-step cache gather is the same full-cache reorder HF's
    ``_reorder_cache`` pays; a shared-prefix two-segment cache (prefix at
    B rows, only the generated suffix at B*W) would cut it ~5x — noted in
    docs/PERFORMANCE.md, not built: every reference eval script runs
    ``--num_beams 1``, so this path is completeness, not a hot loop.
    """
    B, T = plan_arrays["safe_ids"].shape
    W, M = num_beams, max_new_tokens
    cache = KVCache.create(
        cfg.text,
        B,
        T + M,
        dtype=params["lm"]["embed_tokens"].dtype,
    )
    logits, cache = model_mod.prefill(
        params,
        cfg,
        plan_arrays,
        images if has_images else None,
        segs if has_segs else None,
        depths if has_depths else None,
        cache=cache,
        use_vcoder_emb=use_vcoder_emb,
        attn_impl=attn_impl,
    )
    # Beam rows live consecutively per batch item: row b*W + w.
    cache = KVCache(
        k=jnp.repeat(cache.k, W, axis=1),
        v=jnp.repeat(cache.v, W, axis=1),
        kv_mask=jnp.repeat(cache.kv_mask, W, axis=0),
        length=jnp.repeat(cache.length, W, axis=0),
    )
    V = logits.shape[-1]
    seq_lens = plan_arrays["seq_lens"]  # [B]
    barange = jnp.arange(B)
    warange = jnp.arange(W)
    neg_inf = jnp.float32(-jnp.inf)
    do_sample = temperature > 0.0

    def warp(lps):
        """HF's logits warpers on [N, V] log-probs: temperature scale,
        then nucleus filter (order matches TemperatureLogitsWarper →
        TopPLogitsWarper on the log-softmax output)."""
        if not do_sample:
            return lps
        lps = lps / jnp.float32(temperature)
        if top_p < 1.0:
            lps = nucleus_filter(lps, jnp.float32(top_p))
        return lps

    def select(s, logprobs, scores, out_buf, fin_scores, fin_out, done):
        """One HF BeamSearchScorer.process step at generated index ``s``.

        logprobs [B, W, V]; everything else per the loop carry. Returns
        the updated (scores, tokens, parent, out_buf, fin_scores,
        fin_out, done); done batches are frozen (identity parent so the
        cache gather is a no-op for them)."""
        total = scores[:, :, None] + logprobs  # [B, W, V]
        flat = total.reshape(B, W * V)
        if do_sample:
            # Sample 2W candidates without replacement from the joint
            # (beam, token) distribution: Gumbel top-k. True scores are
            # gathered back; noise only steers the selection.
            g = jax.random.gumbel(
                jax.random.fold_in(rng, s), flat.shape, jnp.float32
            )
            _, top_ix = jax.lax.top_k(flat + g, 2 * W)
            top_sc = jnp.take_along_axis(flat, top_ix, axis=1)
        else:
            top_sc, top_ix = jax.lax.top_k(flat, 2 * W)
        parent = top_ix // V  # [B, 2W]
        tok = top_ix % V
        is_eos = tok == eos_id
        # Retirement normalization: GENERATED length including the EOS,
        # (cur_len + 1 - decoder_prompt_len)**lp in HF's refactored beam
        # search (transformers PR #20901 semantics) — the prompt length
        # does not enter.
        gen_len = jnp.float32(s + 1)
        rank_ok = jnp.arange(2 * W)[None, :] < W
        cand_fin = jnp.where(
            is_eos & rank_ok & ~done[:, None],
            top_sc / gen_len**length_penalty,
            neg_inf,
        )  # [B, 2W]
        # Candidate buffers: the parent's sequence so far (positions >= s
        # are still EOS-filled — exactly the finished representation).
        cand_buf = out_buf[barange[:, None], parent]  # [B, 2W, M]
        merged = jnp.concatenate([fin_scores, cand_fin], axis=1)
        merged_buf = jnp.concatenate([fin_out, cand_buf], axis=1)
        new_fin_scores, sel_ix = jax.lax.top_k(merged, W)
        new_fin_out = merged_buf[barange[:, None], sel_ix]
        # Live beams: the first W non-EOS candidates in rank order.
        live_sc = jnp.where(is_eos, neg_inf, top_sc)
        new_scores, live_ix = jax.lax.top_k(live_sc, W)  # [B, W]
        new_parent = jnp.take_along_axis(parent, live_ix, axis=1)
        new_tok = jnp.take_along_axis(tok, live_ix, axis=1)
        new_out = out_buf[barange[:, None], new_parent]
        new_out = jax.lax.dynamic_update_slice_in_dim(
            new_out, new_tok[:, :, None], s, axis=2
        )
        # Done when W hypotheses are banked and even the best LIVE beam,
        # optimistically normalized at the current generated length,
        # can't displace the worst of them (HF's early_stopping=False
        # heuristic, computed after selection).
        best_possible = new_scores[:, 0] / gen_len**length_penalty
        new_done = done | (new_fin_scores[:, W - 1] >= best_possible)
        keep = done[:, None]
        return (
            jnp.where(keep, scores, new_scores),
            jnp.where(keep, jnp.zeros_like(new_tok), new_tok),
            jnp.where(keep, warange[None, :], new_parent),
            jnp.where(keep[:, :, None], out_buf, new_out),
            jnp.where(keep, fin_scores, new_fin_scores),
            jnp.where(keep[:, :, None], fin_out, new_fin_out),
            new_done,
        )

    lp0 = warp(jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1))
    scores0 = jnp.broadcast_to(
        jnp.where(warange == 0, 0.0, neg_inf)[None, :], (B, W)
    ).astype(jnp.float32)
    out_buf = jnp.full((B, W, M), eos_id, jnp.int32)
    fin_scores = jnp.full((B, W), neg_inf, jnp.float32)
    fin_out = jnp.full((B, W, M), eos_id, jnp.int32)
    done0 = jnp.zeros((B,), bool)
    scores, tokens, parent, out_buf, fin_scores, fin_out, done = select(
        0,
        jnp.broadcast_to(lp0[:, None, :], (B, W, V)),
        scores0,
        out_buf,
        fin_scores,
        fin_out,
        done0,
    )

    def cond(state):
        s = state[0]
        return (s < M) & ~jnp.all(state[8])

    def body(state):
        (s, tokens, parent, cache, scores, out_buf, fin_scores, fin_out,
         done) = state
        # Reorder cache rows so row (b, w) holds tokens[b, w]'s history.
        flat = (barange[:, None] * W + parent).reshape(-1)
        cache = KVCache(
            k=cache.k[:, flat],
            v=cache.v[:, flat],
            kv_mask=cache.kv_mask[flat],
            length=cache.length[flat],
        )
        positions = jnp.repeat(seq_lens, W) + (s - 1)
        logits, cache = model_mod.decode_step(
            params,
            cfg,
            tokens.reshape(-1),
            positions,
            cache,
            attn_impl=attn_impl,
        )
        lps = warp(jax.nn.log_softmax(logits.astype(jnp.float32), -1))
        scores, tokens, parent, out_buf, fin_scores, fin_out, done = select(
            s, lps.reshape(B, W, V), scores, out_buf, fin_scores, fin_out,
            done,
        )
        return (
            s + 1, tokens, parent, cache, scores, out_buf, fin_scores,
            fin_out, done,
        )

    state = (1, tokens, parent, cache, scores, out_buf, fin_scores,
             fin_out, done)
    (_, _, _, _, scores, out_buf, fin_scores, fin_out, done) = (
        jax.lax.while_loop(cond, body, state)
    )
    # Finalize: batches not done bank their live beams, normalized at the
    # full generated length (HF banks them through the max-length
    # stopping criteria at the last step), then the best hypothesis wins.
    live_norm = jnp.where(
        done[:, None],
        neg_inf,
        scores / jnp.float32(M) ** length_penalty,
    )
    all_scores = jnp.concatenate([fin_scores, live_norm], axis=1)
    all_out = jnp.concatenate([fin_out, out_buf], axis=1)
    best = jnp.argmax(all_scores, axis=1)
    return all_out[barange, best]


@partial(
    jax.jit,
    static_argnames=(
        "cfg",
        "cache_len",
        "use_vcoder_emb",
        "attn_impl",
        "has_images",
        "has_segs",
        "has_depths",
    ),
)
def _prefill_jit(
    params,
    cfg: VCoderConfig,
    plan_arrays,
    images,
    segs,
    depths,
    *,
    cache_len: int,
    use_vcoder_emb: bool,
    attn_impl: str,
    has_images: bool,
    has_segs: bool,
    has_depths: bool,
):
    B = plan_arrays["safe_ids"].shape[0]
    cache = KVCache.create(
        cfg.text, B, cache_len, dtype=params["lm"]["embed_tokens"].dtype
    )
    logits, cache = model_mod.prefill(
        params,
        cfg,
        plan_arrays,
        images if has_images else None,
        segs if has_segs else None,
        depths if has_depths else None,
        cache=cache,
        use_vcoder_emb=use_vcoder_emb,
        attn_impl=attn_impl,
    )
    return logits, cache


@partial(
    jax.jit,
    static_argnames=(
        "cfg",
        "window",
        "temperature",
        "top_p",
        "eos_id",
        "attn_impl",
    ),
    donate_argnums=(2,),
)
def _decode_window_jit(
    params,
    cfg: VCoderConfig,
    cache,
    tok,
    done,
    positions0,
    rng,
    *,
    window: int,
    temperature: float,
    top_p: float,
    eos_id: int,
    attn_impl: str,
):
    """``window`` decode steps on device; rows already ``done`` emit EOS.

    ``tok`` is the last sampled token per row, fed at ``positions0``; the
    window returns the next ``window`` tokens (EOS-filled once a row
    finishes) plus the carried state, so the host can inspect tokens
    between windows for stop-string termination.
    """
    B = tok.shape[0]
    buf = jnp.full((B, window), eos_id, jnp.int32)

    def cond(state):
        step, _, _, done, _, _ = state
        return (step < window) & ~jnp.all(done)

    def body(state):
        step, tok, cache, done, buf, rng = state
        logits, cache = model_mod.decode_step(
            params, cfg, tok, positions0 + step, cache, attn_impl=attn_impl
        )
        rng, sub = jax.random.split(rng)
        nxt = sample_token(logits, sub, temperature=temperature, top_p=top_p)
        nxt = jnp.where(done, eos_id, nxt)
        buf = jax.lax.dynamic_update_slice_in_dim(
            buf, nxt[:, None], step, axis=1
        )
        done = done | (nxt == eos_id)
        return step + 1, nxt, cache, done, buf, rng

    _, tok, cache, done, buf, rng = jax.lax.while_loop(
        cond, body, (0, tok, cache, done, buf, rng)
    )
    return buf, tok, done, cache, rng


@partial(
    jax.jit,
    static_argnames=("cfg", "temperature", "top_p", "attn_impl"),
    donate_argnums=(3,),
)
def _decode_one_jit(
    params,
    cfg: VCoderConfig,
    tok,
    cache,
    positions,
    rng,
    *,
    temperature: float,
    top_p: float,
    attn_impl: str,
):
    logits, cache = model_mod.decode_step(
        params, cfg, tok, positions, cache, attn_impl=attn_impl
    )
    nxt = sample_token(logits, rng, temperature=temperature, top_p=top_p)
    return nxt, cache


def generate_stream(
    params: dict,
    cfg: VCoderConfig,
    input_ids: Sequence[Sequence[int]],
    images: Optional[jnp.ndarray] = None,
    segs: Optional[jnp.ndarray] = None,
    depths: Optional[jnp.ndarray] = None,
    *,
    tokenizer,
    max_new_tokens: int = 512,
    temperature: float = 0.2,
    top_p: float = 1.0,
    seed: int = 0,
    stop_str: Optional[str] = None,
    is_depth_zero: Optional[Sequence[bool]] = None,
    is_seg_zero: Optional[Sequence[bool]] = None,
    attn_impl: str = "auto",
    lookahead: int = 0,
):
    """Token-streaming generation (batch 1): yields accumulated text after
    each decode step. Replaces the reference's HF ``TextStreamer`` /
    ``TextIteratorStreamer`` paths (reference: serve/cli.py:121-132,
    serve/chat.py:133-159). The fused :func:`generate` loop stays on
    device; this host loop trades ~1 dispatch/token for streaming UX.

    ``lookahead >= 2`` with greedy (temperature 0) streams through
    prompt-lookup speculative decoding instead — several tokens can
    arrive per decoder dispatch (vcoder_tpu.speculative).
    """
    if lookahead >= 2 and temperature <= 0.0:
        yield from _generate_stream_speculative(
            params,
            cfg,
            input_ids,
            images,
            segs,
            depths,
            tokenizer=tokenizer,
            max_new_tokens=max_new_tokens,
            lookahead=lookahead,
            stop_str=stop_str,
            is_depth_zero=is_depth_zero,
            is_seg_zero=is_seg_zero,
            attn_impl=attn_impl,
        )
        return
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
    )
    validate_features(plan, images, segs, depths)
    plan_arrays = model_mod.plan_to_arrays(plan)
    T = plan.seq_len
    dummy = jnp.zeros((0,), jnp.float32)
    logits, cache = _prefill_jit(
        params,
        cfg,
        plan_arrays,
        images if images is not None else dummy,
        segs if segs is not None else dummy,
        depths if depths is not None else dummy,
        cache_len=T + max_new_tokens,
        use_vcoder_emb=plan.use_vcoder_emb and cfg.use_vcoder_lm_emb,
        attn_impl=attn_impl,
        has_images=images is not None,
        has_segs=segs is not None,
        has_depths=depths is not None,
    )
    rng = jax.random.PRNGKey(seed)
    rng, sub = jax.random.split(rng)
    tok = sample_token(
        logits, sub, temperature=float(temperature), top_p=float(top_p)
    )
    eos = cfg.text.eos_token_id
    generated = []
    seq_lens = jnp.asarray(plan.seq_lens)
    for step in range(max_new_tokens):
        t = int(np.asarray(tok)[0])
        if t == eos:
            break
        generated.append(t)
        text = tokenizer.decode(generated, skip_special_tokens=True)
        if stop_str:
            # find, not endswith: one decoded step can add the stop
            # string PLUS trailing characters in a single token.
            cut = text.find(stop_str)
            if cut >= 0:
                yield text[:cut]
                break
        yield text
        if step == max_new_tokens - 1:
            break
        rng, sub = jax.random.split(rng)
        tok, cache = _decode_one_jit(
            params,
            cfg,
            tok,
            cache,
            seq_lens + step,
            sub,
            temperature=float(temperature),
            top_p=float(top_p),
            attn_impl=attn_impl,
        )


def _generate_stream_speculative(
    params,
    cfg: VCoderConfig,
    input_ids,
    images,
    segs,
    depths,
    *,
    tokenizer,
    max_new_tokens: int,
    lookahead: int,
    stop_str: Optional[str],
    is_depth_zero,
    is_seg_zero,
    attn_impl: str,
):
    """Streaming wrapper over :func:`speculative.generate_speculative`:
    the engine pushes accepted tokens through a queue from a worker
    thread (the HF ``TextIteratorStreamer`` inversion), the generator
    yields accumulated text and aborts generation at the stop string."""
    import queue
    import threading

    from vcoder_tpu.speculative import generate_speculative

    q: "queue.Queue" = queue.Queue()
    abort = threading.Event()

    def cb(b, toks):
        q.put(list(toks))
        return not abort.is_set()

    def worker():
        try:
            generate_speculative(
                params,
                cfg,
                input_ids,
                images,
                segs,
                depths,
                max_new_tokens=max_new_tokens,
                lookahead=lookahead,
                is_depth_zero=is_depth_zero,
                is_seg_zero=is_seg_zero,
                attn_impl=attn_impl,
                on_tokens=cb,
            )
        finally:
            q.put(None)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    generated: list = []
    try:
        while True:
            toks = q.get()
            if toks is None:
                break
            generated.extend(toks)
            text = tokenizer.decode(generated, skip_special_tokens=True)
            if stop_str:
                # find, not endswith: speculative chunks deliver several
                # tokens at once, so the stop string routinely lands
                # MID-chunk with accepted tokens after it.
                cut = text.find(stop_str)
                if cut >= 0:
                    abort.set()
                    yield text[:cut]
                    break
            yield text
    finally:
        abort.set()
        t.join()


def _criteria_fires(stopping_criteria, prompt_row, gen_ids) -> bool:
    """Evaluate a KeywordsStoppingCriteria on prompt + generated ids.

    HF-style criteria signatures ((input_ids, scores, **kw)) aren't
    supported host-side and are skipped — detected by SIGNATURE, not by
    catching TypeError around the call, which would also swallow errors
    raised INSIDE a compatible criteria and silently disable its stop
    strings for the whole generation."""
    import inspect

    try:
        sig = inspect.signature(stopping_criteria)
        required = [
            p
            for p in sig.parameters.values()
            if p.default is inspect.Parameter.empty
            and p.kind
            in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)
        ]
        if len(required) > 1:
            return False  # HF-style (input_ids, scores)
    except (TypeError, ValueError):
        pass  # uninspectable callable: try it
    return bool(stopping_criteria(list(prompt_row) + list(gen_ids)))


def _generate_windowed(
    params,
    cfg: VCoderConfig,
    plan,
    plan_arrays,
    images,
    segs,
    depths,
    *,
    max_new_tokens: int,
    temperature: float,
    top_p: float,
    seed: int,
    use_vcoder_emb: bool,
    attn_impl: str,
    has_images: bool,
    has_segs: bool,
    has_depths: bool,
    stopping_criteria,
    prompt_ids,
    window: int = 16,
):
    """Decode in on-device windows, checking stop strings between windows.

    Mirrors the reference's per-step ``KeywordsStoppingCriteria``
    (mm_utils.py:128-151) at window granularity: a row whose decoded tail
    hits a stop keyword at generated index j is frozen (its tokens after j
    are cleared to EOS and it is masked done on device) before the next
    window launches, so at most ``window - 1`` decode steps are wasted —
    versus the full remaining budget in the fused loop. Per-row, so it
    generalizes the reference's batch-1-only criteria.
    """
    eos = cfg.text.eos_token_id
    B, T = plan_arrays["safe_ids"].shape
    window = max(1, min(window, max_new_tokens))
    n_windows = -(-(max_new_tokens - 1) // window) if max_new_tokens > 1 else 0
    total = 1 + n_windows * window
    logits, cache = _prefill_jit(
        params,
        cfg,
        plan_arrays,
        images,
        segs,
        depths,
        cache_len=T + total,
        use_vcoder_emb=use_vcoder_emb,
        attn_impl=attn_impl,
        has_images=has_images,
        has_segs=has_segs,
        has_depths=has_depths,
    )
    rng = jax.random.PRNGKey(seed)
    rng, sub = jax.random.split(rng)
    tok = sample_token(
        logits, sub, temperature=float(temperature), top_p=float(top_p)
    )
    seqs = np.full((B, total), eos, np.int32)
    seqs[:, 0] = np.asarray(tok)
    done = seqs[:, 0] == eos
    for b in range(B):
        if not done[b] and _criteria_fires(
            stopping_criteria, prompt_ids[b], seqs[b, :1]
        ):
            done[b] = True

    seq_lens = jnp.asarray(plan.seq_lens)
    done_dev = jnp.asarray(done)
    g = 1
    while g < max_new_tokens and not done.all():
        rng, sub = jax.random.split(rng)
        buf, tok, done_dev, cache, _ = _decode_window_jit(
            params,
            cfg,
            cache,
            tok,
            done_dev,
            seq_lens + g - 1,
            sub,
            window=window,
            temperature=float(temperature),
            top_p=float(top_p),
            eos_id=eos,
            attn_impl=attn_impl,
        )
        buf_h = np.asarray(buf)
        seqs[:, g : g + window] = buf_h
        host_stopped = False
        for b in range(B):
            if done[b]:
                continue
            for j in range(window):
                if int(buf_h[b, j]) == eos:
                    done[b] = True
                    break
                if _criteria_fires(
                    stopping_criteria, prompt_ids[b], seqs[b, : g + j + 1]
                ):
                    # Keep the keyword tokens (callers strip the stop
                    # string from text, like the reference), drop the
                    # window's overshoot past it.
                    seqs[b, g + j + 1 :] = eos
                    done[b] = True
                    host_stopped = True
                    break
        if host_stopped:
            done_dev = jnp.asarray(done)
        g += window
    return seqs[:, :max_new_tokens], min(g, max_new_tokens)


def generate(
    params: dict,
    cfg: VCoderConfig,
    input_ids: Sequence[Sequence[int]],
    images: Optional[jnp.ndarray] = None,
    segs: Optional[jnp.ndarray] = None,
    depths: Optional[jnp.ndarray] = None,
    *,
    max_new_tokens: int = 512,
    temperature: float = 0.0,
    top_p: float = 1.0,
    seed: int = 0,
    tokenizer=None,
    stopping_criteria=None,
    is_depth_zero: Optional[Sequence[bool]] = None,
    is_seg_zero: Optional[Sequence[bool]] = None,
    attn_impl: str = "auto",
    pad_to: Optional[int] = None,
    lookahead: int = 0,
    num_beams: int = 1,
    length_penalty: float = 1.0,
) -> GenerationResult:
    """High-level generate mirroring ``model.generate(input_ids, images=,
    segs=, depths=, ...)`` of the reference (llava_llama.py forward kwargs).

    input_ids contain sentinel tokens; the splice plan is built here.

    ``lookahead >= 2`` enables prompt-lookup speculative decoding for
    greedy (temperature 0) requests without stop criteria — identical
    output tokens from fewer decoder dispatches (vcoder_tpu.speculative).

    ``num_beams > 1`` runs HF-semantics beam search: deterministic at
    temperature 0 (token-matched against transformers in tests), HF's
    beam-sample mode at temperature > 0 (Gumbel top-k candidate draws,
    temperature/top_p warping — matching in distribution, not tokens).
    Stop keywords are stripped from the decoded text post-hoc rather
    than halting beams early.
    """
    if (
        num_beams <= 1
        and lookahead >= 2
        and temperature <= 0.0
        and stopping_criteria is None
    ):
        from vcoder_tpu.speculative import generate_speculative

        seqs, _, _ = generate_speculative(
            params,
            cfg,
            input_ids,
            images,
            segs,
            depths,
            max_new_tokens=max_new_tokens,
            lookahead=lookahead,
            is_depth_zero=is_depth_zero,
            is_seg_zero=is_seg_zero,
            attn_impl=attn_impl,
            pad_to=pad_to,
        )
        # Fall through to the common num_gen/texts tail below: speculative
        # seqs are eos-filled past the generated region, so the shared
        # first-eos scan recovers identical num_generated.
        return _finalize_result(
            seqs, max_new_tokens, cfg, tokenizer, stopping_criteria
        )
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

    dummy = jnp.zeros((0,), jnp.float32)
    if num_beams > 1:
        seqs = _beam_generate_jit(
            params,
            cfg,
            plan_arrays,
            images if images is not None else dummy,
            segs if segs is not None else dummy,
            depths if depths is not None else dummy,
            jax.random.PRNGKey(seed),
            max_new_tokens=max_new_tokens,
            num_beams=num_beams,
            length_penalty=float(length_penalty),
            eos_id=cfg.text.eos_token_id,
            use_vcoder_emb=plan.use_vcoder_emb and cfg.use_vcoder_lm_emb,
            attn_impl=attn_impl,
            has_images=images is not None,
            has_segs=segs is not None,
            has_depths=depths is not None,
            temperature=float(temperature),
            top_p=float(top_p),
        )
        return _finalize_result(
            np.asarray(seqs), max_new_tokens, cfg, tokenizer,
            stopping_criteria,
        )
    # The criteria carries its own tokenizer (mm_tokens.py), so callers
    # wanting raw ids (tokenizer=None) still get early stopping — gating
    # on OUR tokenizer made their sequences silently overlong.
    use_windowed = bool(
        stopping_criteria is not None
        and getattr(stopping_criteria, "keywords", None)
    )
    if use_windowed:
        seqs, steps = _generate_windowed(
            params,
            cfg,
            plan,
            plan_arrays,
            images if images is not None else dummy,
            segs if segs is not None else dummy,
            depths if depths is not None else dummy,
            max_new_tokens=max_new_tokens,
            temperature=float(temperature),
            top_p=float(top_p),
            seed=seed,
            use_vcoder_emb=plan.use_vcoder_emb and cfg.use_vcoder_lm_emb,
            attn_impl=attn_impl,
            has_images=images is not None,
            has_segs=segs is not None,
            has_depths=depths is not None,
            stopping_criteria=stopping_criteria,
            prompt_ids=input_ids,
        )
    else:
        out_buf, steps = _generate_jit(
            params,
            cfg,
            plan_arrays,
            images if images is not None else dummy,
            segs if segs is not None else dummy,
            depths if depths is not None else dummy,
            jax.random.PRNGKey(seed),
            max_new_tokens=max_new_tokens,
            temperature=float(temperature),
            top_p=float(top_p),
            eos_id=cfg.text.eos_token_id,
            use_vcoder_emb=plan.use_vcoder_emb and cfg.use_vcoder_lm_emb,
            attn_impl=attn_impl,
            has_images=images is not None,
            has_segs=segs is not None,
            has_depths=depths is not None,
        )
        seqs = np.asarray(out_buf)
    return _finalize_result(seqs, steps, cfg, tokenizer, stopping_criteria)


def _finalize_result(
    seqs: np.ndarray, steps, cfg, tokenizer, stopping_criteria
) -> GenerationResult:
    """Shared generate() tail: per-row first-EOS scan -> num_generated,
    decode + stop-keyword strip -> texts."""
    eos = cfg.text.eos_token_id
    num_gen = np.zeros((seqs.shape[0],), np.int64)
    texts = [] if tokenizer is not None else None
    for b in range(seqs.shape[0]):
        row = seqs[b]
        stop = np.nonzero(row == eos)[0]
        n = int(stop[0]) if stop.size else int(steps)
        num_gen[b] = n
        if tokenizer is not None:
            text = tokenizer.decode(row[:n].tolist(), skip_special_tokens=True)
            if stopping_criteria is not None:
                for kw in getattr(stopping_criteria, "keywords", []):
                    if text.endswith(kw):
                        text = text[: -len(kw)]
            texts.append(text.strip())
    return GenerationResult(sequences=seqs, num_generated=num_gen, texts=texts)
