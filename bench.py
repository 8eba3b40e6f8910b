"""Headline benchmark: VCoder-DS-7B time-to-first-token on one TPU chip.

Measures the p50 latency of the full fused prefill graph — shared CLIP
tower over [RGB; seg; depth], three projector heads, static multimodal
splice, 7B Llama prefill (Pallas flash attention), next-token argmax —
against the BASELINE.json north-star of <250 ms p50 TTFT for VCoder-DS-7b
(target is v5e-8; this measures a single chip, so vs_baseline >= 1 beats
the target with 8x less hardware).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Secondary metrics (vision-encode images/sec/chip, decode tok/s) go to
stderr.
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial

import numpy as np


def _window(fn, args, iters):
    """Queue ``iters`` async dispatches back-to-back, then fetch the last
    result (in-order device execution fences the whole window). Amortizes
    per-dispatch host/tunnel latency out of the device-time measurement,
    and subtracts the adjacent trivial-fetch probe: the window is fenced
    by exactly ONE blocking fetch, so the probe measures the tunnel RTT
    (plus any degradation offset) embedded in the wall time. Floored at
    half the raw time to bound probe-spike overcorrection."""
    off = _probe_or_wait()
    r = None
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax_block(r)
    dt = time.perf_counter() - t0
    return max(dt - off, 0.5 * dt) / iters


def _p50(fn, *args, warmup=2, iters=5, windows=5):
    """Median per-call device time over pipelined windows. The benched fn
    must return a SMALL array; the window fetches it via device_get —
    block_until_ready alone does not reliably fence on the tunneled axon
    TPU platform."""
    for _ in range(warmup):
        r = fn(*args)
    jax_block(r)
    return float(
        np.median([_window(fn, args, iters) for _ in range(windows)])
    )


# Shared mid-run recovery budget: total extra seconds the whole bench may
# spend waiting out a degraded-tunnel stretch between sections (on top of
# the startup _wait_for_healthy_tunnel). Keeps the driver's run bounded.
_WAIT_BUDGET_S = [600.0]


def _probe_or_wait(threshold_s: float = 0.5) -> float:
    """Trivial-fetch probe; if it shows a degraded tunnel, wait (against
    the shared budget) for recovery before letting a timed window run.
    Returns the last probe value so callers can correct with it."""
    off = _fetch_probe_s()
    while off > threshold_s and _WAIT_BUDGET_S[0] > 0:
        print(
            f"bench: degraded tunnel mid-run (probe {off:.2f}s); waiting "
            f"(budget {_WAIT_BUDGET_S[0]:.0f}s left)",
            file=sys.stderr,
        )
        time.sleep(30.0)
        _WAIT_BUDGET_S[0] -= 30.0
        off = _fetch_probe_s()
    return off


def _best_window(run, units: float, repeats: int = 3) -> float:
    """Throughput (units/s) over the best of ``repeats`` timed windows.
    ``run()`` must queue work and end in ONE blocking fetch; each window
    is corrected by its adjacent trivial-fetch probe (see _window) and the
    best window is kept, so a transient tunnel hiccup costs a repeat, not
    the number."""
    best = float("inf")
    for _ in range(repeats):
        off = _probe_or_wait()
        t0 = time.perf_counter()
        run()
        dt = time.perf_counter() - t0
        best = min(best, max(dt - off, 0.5 * dt))
    return units / best


def jax_block(x):
    import jax

    jax.device_get(x)


def _reset_hbm():
    """Hard HBM reset between model-scale sections. Seven sections of
    multi-GB alloc/free churn fragment the device allocator enough that
    the NEXT model's largest contiguous leaves (13B int8 stacked MLP =
    2.8 GB; the train step's Adam state) fail with RESOURCE_EXHAUSTED
    even though total free HBM suffices — measured right at
    init_quantized_params. Each section builds its own params/caches and
    never touches earlier device state, so dropping every cached
    executable (their held constants included) and every live array is
    safe and leaves a clean heap."""
    import gc

    import jax

    jax.clear_caches()
    gc.collect()
    for a in jax.live_arrays():
        a.delete()


def _wait_for_healthy_tunnel(max_wait_s: float = 1500.0) -> None:
    """The tunneled TPU platform has multi-hour degraded windows (trivial
    ops taking 30-60 s). Benchmarks taken then are meaningless, so probe
    warm-op latency and wait (bounded) for a healthy window."""
    import jax
    import jax.numpy as jnp

    deadline = time.monotonic() + max_wait_s
    while True:
        x = jnp.ones((1024, 1024), jnp.bfloat16)
        y = (x @ x).sum()
        jax_block(y)
        t0 = time.perf_counter()
        for _ in range(5):
            y = (x @ x).sum()
        jax_block(y)
        warm = time.perf_counter() - t0
        if warm < 1.0:
            return
        if time.monotonic() > deadline:
            print(
                f"bench: tunnel still degraded ({warm:.1f}s warm probe) "
                "after max wait; numbers may be unrepresentative",
                file=sys.stderr,
            )
            return
        print(
            f"bench: tunnel degraded ({warm:.1f}s warm probe), waiting...",
            file=sys.stderr,
        )
        time.sleep(60)


def _fetch_probe_s() -> float:
    """Seconds for one trivial dispatch+fetch — the tunnel-health unit.
    Healthy: <0.1 s. Degraded windows add a constant ~1.4 s to EVERY
    blocking fetch, which collapses all decode/serving secondaries while
    leaving few-dispatch sections (TTFT, vision) looking normal."""
    import jax
    import jax.numpy as jnp

    x = jnp.zeros(8) + 1
    jax_block(x)
    t0 = time.perf_counter()
    jax_block(jnp.zeros(8) + 2)
    return time.perf_counter() - t0


def main():
    import jax
    import jax.numpy as jnp

    _wait_for_healthy_tunnel()
    probe_start_s = _fetch_probe_s()

    from __graft_entry__ import _example_batch
    from vcoder_tpu.config import VCoderConfig
    from vcoder_tpu.models import vcoder as model_mod
    from vcoder_tpu.models.llama import KVCache
    from vcoder_tpu.models import clip as clip_mod

    cfg = VCoderConfig.standard("vcoder_ds_llava", "7b")
    params = model_mod.init_vcoder_params(
        jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16
    )
    batch = _example_batch(cfg, batch_size=1)

    # --- TTFT: fused prefill -> first token ---
    @jax.jit
    def ttft_step(params, batch):
        logits, _ = model_mod.prefill(
            params,
            cfg,
            batch,
            batch["images"],
            batch["segs"],
            batch["depths"],
            use_vcoder_emb=cfg.use_vcoder_lm_emb,
        )
        return jnp.argmax(logits, axis=-1)

    ttft_s = _p50(ttft_step, params, batch)
    ttft_ms = ttft_s * 1e3

    # --- secondary: vision encode throughput (stderr) ---
    enc_batch = 16

    @jax.jit
    def encode(params, px):
        # Tiny reduction so the host fetch in _p50 is cheap but still
        # forces the whole encode.
        return clip_mod.clip_encode(
            params["vision_tower"], cfg.vision, px
        ).mean()

    px = jax.random.normal(
        jax.random.PRNGKey(1),
        (enc_batch, cfg.vision.image_size, cfg.vision.image_size, 3),
        jnp.bfloat16,
    )
    enc_s = _p50(encode, params, px, iters=10)
    img_per_s = enc_batch / enc_s

    # --- secondary: decode tok/s (stderr) ---
    # Decode against a synthetic populated cache: identical compute and
    # memory traffic to a real post-prefill cache, without holding a second
    # prefill executable + workspace in HBM. 704 slots (not the full 1344)
    # so params (14.5 GB) + cache + donated-update workspace fit the single
    # 16 GB chip; decode cost is weight-streaming dominated, so the
    # difference is <2%.
    T = 640
    S_cache = T + 64
    cache = KVCache.create(cfg.text, 1, S_cache, dtype=jnp.bfloat16)
    cache = KVCache(
        k=cache.k,
        v=cache.v,
        kv_mask=(jnp.arange(S_cache) < T)[None, :],
        length=jnp.full((1,), T, jnp.int32),
    )

    n_steps = 32

    @partial(jax.jit, donate_argnums=(3,))
    def decode_n(params, tok, pos, cache):
        # On-device decode loop: one dispatch for n_steps tokens, so the
        # tunnel's per-dispatch latency doesn't masquerade as decode time.
        def body(i, carry):
            tok, cache = carry
            logits, cache = model_mod.decode_step(
                params, cfg, tok, pos + i, cache
            )
            return jnp.argmax(logits, -1).astype(jnp.int32), cache

        return jax.lax.fori_loop(0, n_steps, body, (tok, cache))

    tok = jnp.zeros((1,), jnp.int32)
    pos = jnp.full((1,), T, jnp.int32)
    tok, cache = decode_n(params, tok, pos, cache)  # compile
    jax_block(tok)
    st = [tok, cache]

    def _run_b1():
        st[0], st[1] = decode_n(params, st[0], pos, st[1])
        jax_block(st[0])

    tok_per_s = _best_window(_run_b1, n_steps)
    del cache, st

    # --- secondary: bf16 BATCHED decode (B=4), windowed fori_loop ---
    # A fori-loop decode body at B>=2 makes XLA's while-loop layout
    # assignment re-lay the stacked bf16 q/k/v projections (~1 GB copy
    # each — the round-1 bf16 batched OOM). Pinning those projections to
    # the decode-preferred layout FIRST (serve.engine.apply_serving_layout,
    # what the windowed ServingEngine does at init) compiles the same loop
    # with zero weight copies, so bf16 gets the one-dispatch-per-window
    # amortization int8 always had. int8 KV keeps B=4x704-token cache
    # within the 16 GB chip next to 14.5 GB of bf16 weights (kv_quant
    # engine flag; weights stay full bf16).
    from vcoder_tpu.serve.engine import apply_serving_layout

    apply_serving_layout(params)
    B4 = 4
    cache = KVCache.create(cfg.text, B4, S_cache, quantized=True)
    cache = KVCache(
        k=cache.k, v=cache.v,
        kv_mask=jnp.broadcast_to(
            (jnp.arange(S_cache) < T)[None, :], (B4, S_cache)
        ),
        length=jnp.full((B4,), T, jnp.int32),
        k_scale=cache.k_scale, v_scale=cache.v_scale,
    )
    tok4 = jnp.zeros((B4,), jnp.int32)
    pos4 = jnp.full((B4,), T, jnp.int32)
    tok4, cache = decode_n(params, tok4, pos4, cache)  # compile
    jax_block(tok4)
    st4 = [tok4, cache]

    def _run_b4():
        st4[0], st4[1] = decode_n(params, st4[0], pos4, st4[1])
        jax_block(st4[0])

    bf16_b4_tok_per_s = _best_window(_run_b4, B4 * n_steps)
    del cache, st4

    # --- secondary: speculative decode, COST-like repetition regime ---
    # Random weights produce unrepetitive text (accept 1.3-1.6/dispatch,
    # docs/PERFORMANCE.md); COST answers repeat the prompt's object
    # nouns, which is what prompt-lookup speculation exploits. Surgery
    # turns the random decoder into a deterministic token-cycle seeded
    # by the prompt: o_proj/down_proj zeroed (every matmul still runs at
    # full shape — residual stream just stays the embedding) and lm_head
    # columns set to permuted embeddings so argmax(logits(t)) = perm(t).
    # The n-gram drafter then operates in the high-repetition regime the
    # COST workload lives in; with the random-weights number this
    # brackets realized speculative speedup. In-place on params: only
    # TIMING of later sections depends on weight values.
    from vcoder_tpu import speculative

    Lp = params["lm"]["layers"]
    # 14.5 GB of bf16 weights leave <1 GB HBM headroom: free each tensor
    # BEFORE allocating its replacement (zeros_like while the old o_proj/
    # down_proj are live peaks ~2-3 GB over budget -> RESOURCE_EXHAUSTED).
    for name in ("o_proj", "down_proj"):
        old = Lp[name]
        shape, dt, shard = old.shape, old.dtype, old.sharding
        old.delete()
        Lp[name] = jax.device_put(jnp.zeros(shape, dt), shard)
    emb = np.asarray(params["lm"]["embed_tokens"], np.float32)  # [V, D]
    Vv = emb.shape[0]
    period = 12
    cyc = np.arange(100, 100 + period)
    perm = np.arange(Vv)
    perm[cyc] = np.roll(cyc, -1)
    old_head = params["lm"]["lm_head"]
    head_shape, head_dt = old_head.shape, old_head.dtype
    head = np.zeros(head_shape, np.float32)  # [D, V]
    head[:, perm] = emb.T
    old_head.delete()
    params["lm"]["lm_head"] = jnp.asarray(head, head_dt)
    del head, emb
    spec_prompt = [1] + list(map(int, cyc)) * 2
    spec_stats = {}
    for k in (4, 8, 16):
        seqs, num_gen, iters = speculative.generate_speculative(
            params, cfg, [spec_prompt], max_new_tokens=96, lookahead=k,
        )  # compile + warm the drafter
        jax_block(seqs)
        # The spec loop host-syncs once per dispatch iteration (the n-gram
        # drafter reads accepted tokens), so tunnel RTT enters ``iters``
        # times — correct by iters+1 probes, floored, best of 2 runs.
        best = float("inf")
        for _ in range(2):
            off = _probe_or_wait()
            t0 = time.perf_counter()
            seqs, num_gen, iters = speculative.generate_speculative(
                params, cfg, [spec_prompt], max_new_tokens=96, lookahead=k,
            )
            jax_block(seqs)
            dt = time.perf_counter() - t0
            best = min(best, max(dt - off * (int(iters) + 1), 0.2 * dt))
        spec_stats[k] = (
            int(num_gen[0]) / best,
            int(num_gen[0]) / max(int(iters), 1),
        )
    spec_costlike_tok_s, spec_costlike_accept = spec_stats[8]

    # --- secondary: int8 weight-only decode (load_8bit path) ---
    from vcoder_tpu.quant import quantize_params

    qparams = quantize_params(params, bits=8)  # destructive: frees bf16
    del params
    cache = KVCache.create(cfg.text, 1, S_cache, dtype=jnp.bfloat16)
    cache = KVCache(
        k=cache.k,
        v=cache.v,
        kv_mask=(jnp.arange(S_cache) < T)[None, :],
        length=jnp.full((1,), T, jnp.int32),
    )
    tok = jnp.zeros((1,), jnp.int32)
    tok2, cache = decode_n(qparams, tok, pos, cache)
    jax_block(tok2)
    sti = [tok2, cache]

    def _run_i8():
        sti[0], sti[1] = decode_n(qparams, sti[0], pos, sti[1])
        jax_block(sti[0])

    tok_per_s_int8 = _best_window(_run_i8, n_steps)
    del cache, sti

    # --- secondary: continuous-batching aggregate decode (int8, B=8) ---
    Bcb = 8
    cache = KVCache.create(cfg.text, Bcb, S_cache, dtype=jnp.bfloat16)
    cache = KVCache(
        k=cache.k,
        v=cache.v,
        kv_mask=jnp.broadcast_to(
            (jnp.arange(S_cache) < T)[None, :], (Bcb, S_cache)
        ),
        length=jnp.full((Bcb,), T, jnp.int32),
    )
    tokb = jnp.zeros((Bcb,), jnp.int32)
    posb = jnp.full((Bcb,), T, jnp.int32)
    tokb, cache = decode_n(qparams, tokb, posb, cache)
    jax_block(tokb)
    stb = [tokb, cache]

    def _run_cb():
        stb[0], stb[1] = decode_n(qparams, stb[0], posb, stb[1])
        jax_block(stb[0])

    serve_tok_per_s = _best_window(_run_cb, Bcb * n_steps)
    del cache, stb

    # --- secondary: paged-KV decode aggregate (int8 weights, B=8) ---
    from vcoder_tpu.models.llama import llama_paged_decode

    page = 64
    Bp = 8
    p_max = (T + 64) // page
    n_pages = Bp * p_max + 2
    L = cfg.text.num_layers
    KH, HD = cfg.text.num_kv_heads, cfg.text.head_dim
    k_pages = jnp.zeros((L, n_pages, KH, page, HD), jnp.bfloat16)
    v_pages = jnp.zeros((L, n_pages, KH, page, HD), jnp.bfloat16)
    table = jnp.asarray(
        np.arange(1, Bp * p_max + 1).reshape(Bp, p_max).astype(np.int32)
    )
    lengths0 = jnp.full((Bp,), T, jnp.int32)
    active = jnp.ones((Bp,), bool)

    @partial(jax.jit, donate_argnums=(2, 3))
    def paged_decode_n(params, tok, k_pages, v_pages):
        def body(i, carry):
            tok, k_pages, v_pages = carry
            embeds = jnp.take(
                params["lm"]["embed_tokens"], tok[:, None], axis=0
            )
            hidden, k_pages, v_pages = llama_paged_decode(
                params["lm"], cfg.text, embeds, lengths0 + i, k_pages,
                v_pages, table, lengths0 + i, active,
            )
            logits = hidden[:, 0] @ (
                params["lm"]["lm_head"].q.astype(jnp.bfloat16)
                if hasattr(params["lm"]["lm_head"], "q")
                else params["lm"]["lm_head"]
            )
            return (
                jnp.argmax(logits, -1).astype(jnp.int32), k_pages, v_pages
            )

        return jax.lax.fori_loop(0, n_steps, body, (tok, k_pages, v_pages))

    tokp = jnp.zeros((Bp,), jnp.int32)
    tokp, k_pages, v_pages = paged_decode_n(qparams, tokp, k_pages, v_pages)
    jax_block(tokp)
    stp = [tokp, k_pages, v_pages]

    def _run_paged():
        stp[0], stp[1], stp[2] = paged_decode_n(qparams, *stp)
        jax_block(stp[0])

    paged_tok_per_s = _best_window(_run_paged, Bp * n_steps)
    del k_pages, v_pages, tokp, stp

    # --- secondary: int8-PAGE paged decode, B=16 (kv_quant pools halve
    # the cache bytes each step streams, so more rows amortize the int8
    # weight pass; page_size 128 per the Mosaic scale-DMA tiling) ---
    page_q = 128
    Bq = 32
    pq_max = (T + page_q) // page_q
    nq_pages = Bq * pq_max + 2
    kq_pages = jnp.zeros((L, nq_pages, KH, page_q, HD), jnp.int8)
    vq_pages = jnp.zeros((L, nq_pages, KH, page_q, HD), jnp.int8)
    kq_scale = jnp.zeros((L, nq_pages, KH, page_q), jnp.float32)
    vq_scale = jnp.zeros((L, nq_pages, KH, page_q), jnp.float32)
    tableq = jnp.asarray(
        np.arange(1, Bq * pq_max + 1).reshape(Bq, pq_max).astype(np.int32)
    )
    lengths0q = jnp.full((Bq,), T, jnp.int32)
    activeq = jnp.ones((Bq,), bool)

    @partial(jax.jit, donate_argnums=(2, 3, 4, 5))
    def paged_q8_decode_n(params, tok, k_pages, v_pages, k_scale, v_scale):
        def body(i, carry):
            tok, k_pages, v_pages, k_scale, v_scale = carry
            embeds = jnp.take(
                params["lm"]["embed_tokens"], tok[:, None], axis=0
            )
            hidden, k_pages, v_pages, k_scale, v_scale = (
                llama_paged_decode(
                    params["lm"], cfg.text, embeds, lengths0q + i,
                    k_pages, v_pages, tableq, lengths0q + i, activeq,
                    k_scale=k_scale, v_scale=v_scale,
                )
            )
            logits = hidden[:, 0] @ (
                params["lm"]["lm_head"].q.astype(jnp.bfloat16)
                if hasattr(params["lm"]["lm_head"], "q")
                else params["lm"]["lm_head"]
            )
            return (
                jnp.argmax(logits, -1).astype(jnp.int32),
                k_pages, v_pages, k_scale, v_scale,
            )

        return jax.lax.fori_loop(
            0, n_steps, body, (tok, k_pages, v_pages, k_scale, v_scale)
        )

    tokq = jnp.zeros((Bq,), jnp.int32)
    tokq, kq_pages, vq_pages, kq_scale, vq_scale = paged_q8_decode_n(
        qparams, tokq, kq_pages, vq_pages, kq_scale, vq_scale
    )
    jax_block(tokq)
    stq = [tokq, kq_pages, vq_pages, kq_scale, vq_scale]

    def _run_q8():
        stq[:] = paged_q8_decode_n(qparams, *stq)
        jax_block(stq[0])

    paged_q8_tok_per_s = _best_window(_run_q8, Bq * n_steps)
    del kq_pages, vq_pages, kq_scale, vq_scale, tokq, stq

    # --- secondary: 13B int8 weights + int8 KV (BASELINE.json asks for
    # TTFT + decode at 7B AND 13B; 13B bf16 is 26 GB and can only exist
    # quantized on one 16 GB chip — commit cea4bc3 feasibility) ---
    del qparams
    _reset_hbm()  # 13B's 2.8 GB stacked-MLP leaves need a defragged HBM
    cfg13 = VCoderConfig.standard("vcoder_ds_llava", "13b")
    from vcoder_tpu.quant import init_quantized_params

    params13 = init_quantized_params(jax.random.PRNGKey(3), cfg13, bits=8)
    batch13 = _example_batch(cfg13, batch_size=1)

    @jax.jit
    def ttft13_step(params, batch):
        logits, _ = model_mod.prefill(
            params,
            cfg13,
            batch,
            batch["images"],
            batch["segs"],
            batch["depths"],
            use_vcoder_emb=cfg13.use_vcoder_lm_emb,
        )
        return jnp.argmax(logits, axis=-1)

    ttft13_ms = _p50(ttft13_step, params13, batch13, iters=3, windows=3) * 1e3
    del batch13

    B13 = 2
    cache13 = KVCache.create(cfg13.text, B13, S_cache, quantized=True)
    cache13 = KVCache(
        k=cache13.k, v=cache13.v,
        kv_mask=jnp.broadcast_to(
            (jnp.arange(S_cache) < T)[None, :], (B13, S_cache)
        ),
        length=jnp.full((B13,), T, jnp.int32),
        k_scale=cache13.k_scale, v_scale=cache13.v_scale,
    )

    @partial(jax.jit, donate_argnums=(3,))
    def decode_n13(params, tok, pos, cache):
        # Fused window, same as the 7B decode_n: one dispatch per
        # n_steps tokens (a host loop of single steps pays ~15 ms tunnel
        # submit per token — it dominated this number through round 2).
        # int8 weights ride as entry args, so the bf16 while-loop
        # relayout issue doesn't apply.
        def body(i, carry):
            tok, cache = carry
            logits, cache = model_mod.decode_step(
                params, cfg13, tok, pos + i, cache
            )
            return jnp.argmax(logits, -1).astype(jnp.int32), cache

        return jax.lax.fori_loop(0, n_steps, body, (tok, cache))

    tok13 = jnp.zeros((B13,), jnp.int32)
    pos13 = jnp.full((B13,), T, jnp.int32)
    tok13, cache13 = decode_n13(params13, tok13, pos13, cache13)
    jax_block(tok13)
    st13 = [tok13, cache13]

    def _run_13():
        st13[0], st13[1] = decode_n13(params13, st13[0], pos13, st13[1])
        jax_block(st13[0])

    tok13_per_s = _best_window(_run_13, B13 * n_steps)
    del cache13, st13

    # --- secondary: 13B int8 weights + int8 PAGE pools (the stated
    # motivation for kv_quant: 13B serving capacity on one 16 GB chip —
    # docs/PERFORMANCE.md #11). B=4 x 640 ctx: ~13 GB weights + ~1.4 GB
    # q8 pools; page 128 per the Mosaic scale-DMA tiling. ---
    L13 = cfg13.text.num_layers
    KH13 = cfg13.text.num_kv_heads
    HD13 = cfg13.text.head_dim
    B13q = 4
    pq13 = (T + page_q) // page_q
    n13_pages = B13q * pq13 + 2
    k13_pages = jnp.zeros((L13, n13_pages, KH13, page_q, HD13), jnp.int8)
    v13_pages = jnp.zeros((L13, n13_pages, KH13, page_q, HD13), jnp.int8)
    k13_scale = jnp.zeros((L13, n13_pages, KH13, page_q), jnp.float32)
    v13_scale = jnp.zeros((L13, n13_pages, KH13, page_q), jnp.float32)
    table13 = jnp.asarray(
        np.arange(1, B13q * pq13 + 1).reshape(B13q, pq13).astype(np.int32)
    )
    lengths13 = jnp.full((B13q,), T, jnp.int32)
    active13 = jnp.ones((B13q,), bool)

    @partial(jax.jit, donate_argnums=(2, 3, 4, 5))
    def paged13_q8_decode_n(params, tok, k_pages, v_pages, k_scale, v_scale):
        def body(i, carry):
            tok, k_pages, v_pages, k_scale, v_scale = carry
            embeds = jnp.take(
                params["lm"]["embed_tokens"], tok[:, None], axis=0
            )
            hidden, k_pages, v_pages, k_scale, v_scale = (
                llama_paged_decode(
                    params["lm"], cfg13.text, embeds, lengths13 + i,
                    k_pages, v_pages, table13, lengths13 + i, active13,
                    k_scale=k_scale, v_scale=v_scale,
                )
            )
            logits = hidden[:, 0] @ (
                params["lm"]["lm_head"].q.astype(jnp.bfloat16)
                if hasattr(params["lm"]["lm_head"], "q")
                else params["lm"]["lm_head"]
            )
            return (
                jnp.argmax(logits, -1).astype(jnp.int32),
                k_pages, v_pages, k_scale, v_scale,
            )

        return jax.lax.fori_loop(
            0, n_steps, body, (tok, k_pages, v_pages, k_scale, v_scale)
        )

    tok13q = jnp.zeros((B13q,), jnp.int32)
    tok13q, k13_pages, v13_pages, k13_scale, v13_scale = paged13_q8_decode_n(
        params13, tok13q, k13_pages, v13_pages, k13_scale, v13_scale
    )
    jax_block(tok13q)
    st13q = [tok13q, k13_pages, v13_pages, k13_scale, v13_scale]

    def _run_13q():
        st13q[:] = paged13_q8_decode_n(params13, *st13q)
        jax_block(st13q[0])

    paged13_q8_tok_per_s = _best_window(_run_13q, B13q * n_steps)
    del k13_pages, v13_pages, k13_scale, v13_scale, tok13q, st13q, params13

    # --- secondary: stage-3 training step (vcoder_ds adapters over an
    # int8-frozen 7B base — the reference's `--bits 8` training path,
    # train/train.py:917-933). Trains seg+depth projectors + vcoder_lm_emb
    # with remat + Pallas flash fwd/bwd; reports step time and tokens/s.
    # Runs LAST: the backward's compile workspace + Adam state want a
    # clean HBM (13B init right after it OOMs on fragmentation). ---
    _reset_hbm()
    from vcoder_tpu.train.step import (
        init_opt_state,
        make_optimizer,
        make_train_step,
    )

    qparams7 = init_quantized_params(jax.random.PRNGKey(5), cfg, bits=8)
    B_tr = 2
    batch_tr = _example_batch(cfg, batch_size=B_tr, with_labels=True)
    optimizer = make_optimizer(1e-3, total_steps=100)
    opt_state = init_opt_state(qparams7, optimizer, "vcoder_ds")
    tstep = make_train_step(cfg, optimizer, stage="vcoder_ds", remat="dots")
    params_t, opt_state, metrics = tstep(qparams7, opt_state, batch_tr)
    jax_block(metrics["loss"])
    n_tr = 5
    stt = [params_t, opt_state, metrics]

    def _run_train():
        for _ in range(n_tr):
            stt[0], stt[1], stt[2] = tstep(stt[0], stt[1], batch_tr)
        jax_block(stt[2]["loss"])

    train_steps_per_s = _best_window(_run_train, n_tr, repeats=2)
    train_step_ms = 1e3 / train_steps_per_s
    T_tr = int(batch_tr["safe_ids"].shape[1])
    train_tok_s = B_tr * T_tr / (train_step_ms / 1e3)

    probe_end_s = _fetch_probe_s()
    if max(probe_start_s, probe_end_s) > 0.5:
        print(
            "bench: TUNNEL DEGRADED during run (trivial-fetch probe "
            f"{probe_start_s * 1e3:.0f} -> {probe_end_s * 1e3:.0f} ms). "
            "Windows are probe-corrected + best-of-N, but if the floor "
            "clamp engaged the secondaries still understate device "
            "throughput; prefer a healthy-window rerun",
            file=sys.stderr,
        )

    print(
        f"secondary: vision_encode={img_per_s:.1f} img/s/chip  "
        f"decode={tok_per_s:.1f} tok/s (7B bf16, B=1)  "
        f"decode_bf16_B4={bf16_b4_tok_per_s:.1f} tok/s aggregate "
        f"(fused {n_steps}-step window, serving layout, int8 KV)  "
        f"spec_costlike={spec_costlike_tok_s:.1f} tok/s "
        f"(B=1 bf16, lookahead=8, accept {spec_costlike_accept:.1f}/"
        f"dispatch; k=4 {spec_stats[4][0]:.1f}@{spec_stats[4][1]:.1f}, "
        f"k=16 {spec_stats[16][0]:.1f}@{spec_stats[16][1]:.1f})  "
        f"decode_int8={tok_per_s_int8:.1f} tok/s  "
        f"serve_int8_B8={serve_tok_per_s:.1f} tok/s aggregate  "
        f"paged_int8_B8={paged_tok_per_s:.1f} tok/s aggregate  "
        f"paged_q8kv_B32={paged_q8_tok_per_s:.1f} tok/s aggregate "
        f"(int8 pages, page=128, B=32)  "
        f"train_vcoder_ds_7b={train_step_ms:.0f} ms/step "
        f"({train_tok_s:.0f} tok/s, B={B_tr}, int8 base, remat)  "
        f"13b_ttft={ttft13_ms:.1f} ms p50 (int8)  "
        f"13b_decode_B2={tok13_per_s:.1f} tok/s aggregate (int8, int8 KV)  "
        f"13b_paged_q8_B4={paged13_q8_tok_per_s:.1f} tok/s aggregate "
        f"(int8 weights + int8 pages, page=128)",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": "vcoder_ds_7b_prefill_ttft_p50_single_chip",
                "value": round(ttft_ms, 2),
                "unit": "ms",
                "vs_baseline": round(250.0 / ttft_ms, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
