"""Training-at-scale evidence on one v5e chip (VERDICT r4 #2).

Sweeps the per-chip batch size for the stage-3 `vcoder_ds` train step
(adapters + vcoder_lm_emb over an int8-frozen 7B base, remat, Pallas
flash fwd/bwd — bench.py's sec_train config) until HBM runs out, and
reports ms/step, tok/s, MFU, and the projected v5e-8 epoch time against
the reference's 8xA100 table (BASELINE.md: VCoder-DS 7b = ~17 h for 1
epoch of COST+QA; reference shells run per-device batch 32 on A100-80GB,
/root/reference/scripts/v1_5/vcoder_ds_train.sh).

MFU convention: 6*N*B*T / (t * peak) with N = LM params touched by the
forward (the standard formula). Because the base is FROZEN (no dW for
base matmuls), the actual executed-FLOP utilisation is ~2/3 of the
reported MFU; both numbers are printed.

Usage: python scripts/bench_train_scaling.py [--bs 2,4,8,12,16] \
          [--steps 3] [--windows 2] [--samples 560000] [--json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_PEAK = 197e12  # bf16 FLOP/s per chip


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", default="2,4,8,12,16")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--windows", type=int, default=2)
    ap.add_argument("--samples", type=int, default=560_000,
                    help="stage-3 samples/epoch for the projection "
                    "(COST 280k images + 280k QA pairs, BASELINE.md)")
    ap.add_argument("--model", default="7b")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _example_batch
    from vcoder_tpu.config import VCoderConfig
    from vcoder_tpu.ops.quant import QuantizedTensor
    from vcoder_tpu.quant import init_quantized_params
    from vcoder_tpu.train.step import (
        init_opt_state,
        make_optimizer,
        make_train_step,
    )

    cfg = VCoderConfig.standard("vcoder_ds_llava", args.model)
    tc = cfg.text

    # LM params for the 6N convention (matmul-dominated leaves).
    n_lm = (
        tc.num_layers
        * (4 * tc.hidden_size * tc.hidden_size
           + 3 * tc.hidden_size * tc.intermediate_size)
        + tc.vocab_size * tc.hidden_size
    )

    params = init_quantized_params(jax.random.PRNGKey(5), cfg, bits=8)
    optimizer = make_optimizer(1e-3, total_steps=100)
    tstep = make_train_step(cfg, optimizer, stage="vcoder_ds", remat="dots")

    results = {}
    for B in [int(b) for b in args.bs.split(",")]:
        try:
            batch = _example_batch(cfg, batch_size=B, with_labels=True)
            T = int(batch["safe_ids"].shape[1])
            opt_state = init_opt_state(params, optimizer, "vcoder_ds")
            p, o, m = tstep(params, opt_state, batch)
            jax.device_get(m["loss"])
            st = [p, o, m]

            def run():
                for _ in range(args.steps):
                    st[0], st[1], st[2] = tstep(st[0], st[1], batch)
                jax.device_get(st[2]["loss"])

            best = float("inf")
            for _ in range(args.windows):
                t0 = time.perf_counter()
                run()
                best = min(best, (time.perf_counter() - t0) / args.steps)
            # The step jits DONATE (params, opt_state): the entry params
            # are dead after the first call — carry the updated pytree
            # into the next batch size.
            params = st[0]
            del st, p, o, m, opt_state, batch
            tok_s = B * T / best
            mfu6 = 6 * n_lm * B * T / best / V5E_PEAK
            # v5e-8 data-parallel projection: 8 chips, per-chip B.
            steps_ep = args.samples / (8 * B)
            epoch_h = steps_ep * best / 3600
            results[f"B{B}"] = {
                "step_ms": round(best * 1e3, 1),
                "tok_s": round(tok_s),
                "T": T,
                "mfu_6N": round(mfu6, 3),
                "mfu_executed": round(mfu6 * 2 / 3, 3),
                "v5e8_epoch_h": round(epoch_h, 2),
            }
            print(f"B={B:3d}: {best*1e3:8.1f} ms/step  {tok_s:7.0f} tok/s"
                  f"  MFU(6N)={mfu6:.1%} (executed ~{mfu6*2/3:.1%})"
                  f"  v5e-8 epoch ~{epoch_h:.1f} h", flush=True)
        except Exception as e:  # OOM ends the sweep
            msg = str(e).splitlines()[0][:160]
            print(f"B={B}: FAILED — {msg}", flush=True)
            results[f"B{B}"] = {"error": msg}
            break

    if args.json:
        print(json.dumps(results))


if __name__ == "__main__":
    main()
