"""int4 weight-only decode on hardware: is the 4-bit path worth serving?

7B int4 weights are ~3.6 GB stored (vs 7.2 int8 / 14.5 bf16) as
nibble-PACKED int8 bytes (ops/quant.py — ``jnp.int4`` jit entry args
crash this backend in a device_put recursion, and measured in-graph
unpack does NOT fuse into the dot anyway, so int4's win is CAPACITY,
not decode bandwidth). Reference parity point: --load-4bit serving
(`/root/reference/vcoder_llava/model/builder.py:30-38` via
bitsandbytes NF4). Measures B=1 and B=4 fused 32-step decode windows
plus the W8A8 int4 prefill TTFT; prints one JSON line per metric.

    python scripts/bench_int4.py [--batch 1 4] [--ttft]
"""

import argparse
import json
import sys

sys.path.insert(0, ".")

from bench import (  # noqa: E402
    N_STEPS,
    T,
    _best_window,
    _make_decode_n,
    _p50,
    _populated_cache,
    _wait_for_healthy_tunnel,
    jax_block,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, nargs="+", default=[1, 4])
    ap.add_argument("--ttft", action="store_true",
                    help="also time int4 prefill TTFT")
    ap.add_argument("--cap13", type=int, default=0, metavar="B",
                    help="13B int4 + int8-page capacity case at batch B "
                    "(skips the 7B sections)")
    args = ap.parse_args()
    if args.cap13:
        cap13(args.cap13)
        return

    _wait_for_healthy_tunnel()

    import jax
    import jax.numpy as jnp

    from vcoder_tpu.config import VCoderConfig
    from vcoder_tpu.models import vcoder as model_mod
    from vcoder_tpu.quant import init_quantized_params

    cfg = VCoderConfig.standard("vcoder_ds_llava", "7b")
    qparams = init_quantized_params(jax.random.PRNGKey(5), cfg, bits=4)
    decode_n = _make_decode_n(cfg)

    for B in args.batch:
        cache = _populated_cache(cfg, B)
        tok = jnp.zeros((B,), jnp.int32)
        pos = jnp.full((B,), T, jnp.int32)
        tok2, cache = decode_n(qparams, tok, pos, cache)
        jax_block(tok2)
        sti = [tok2, cache]

        def _run():
            sti[0], sti[1] = decode_n(qparams, sti[0], pos, sti[1])
            jax_block(sti[0])

        tok_s = _best_window(_run, N_STEPS * B)
        print(
            json.dumps(
                {"metric": "decode_int4", "batch": B,
                 "tok_per_s": round(tok_s, 1)}
            ),
            flush=True,
        )
        del cache, sti

    if args.ttft:
        from __graft_entry__ import _example_batch

        batch = _example_batch(cfg, batch_size=1)

        @jax.jit
        def ttft_step(params, batch):
            logits, _ = model_mod.prefill(
                params, cfg, batch,
                batch["images"], batch["segs"], batch["depths"],
                use_vcoder_emb=cfg.use_vcoder_lm_emb,
            )
            return jnp.argmax(logits, axis=-1)

        ms = _p50(ttft_step, qparams, batch, iters=3, windows=3) * 1e3
        print(
            json.dumps({"metric": "ttft_7b_int4", "ms_p50": round(ms, 1)}),
            flush=True,
        )


def cap13(B):
    """13B serving CAPACITY on one 16 GB chip: int4 weights (6.6 GB) +
    int8 KV pages leave room for a B-row paged decode batch that int8
    weights (13 GB) cannot hold. Same synthetic paged-decode harness as
    bench.py's paged13_q8_b4 section."""
    _wait_for_healthy_tunnel()

    import bench as B_
    import jax

    from vcoder_tpu.quant import init_quantized_params

    class _Ctx:
        def __init__(self, d):
            self.d = d

        def get(self, k):
            return self.d[k]

    from vcoder_tpu.config import VCoderConfig

    cfg13 = VCoderConfig.standard("vcoder_ds_llava", "13b")
    params13 = init_quantized_params(jax.random.PRNGKey(7), cfg13, bits=4)
    ctx = _Ctx({"cfg13": cfg13, "params13": params13})
    out = B_._paged_section(
        ctx, params_key="params13", cfg_key="cfg13", B=B,
        page=B_.PAGE_Q, quantized=True, name="tok_per_s",
    )
    print(
        json.dumps(
            {
                "metric": "paged13_int4_q8",
                "batch": B,
                "tok_per_s": round(out["tok_per_s"], 1),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
