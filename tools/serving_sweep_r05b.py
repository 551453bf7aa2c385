"""Round-5b serving slots ladder: amortize the per-step weight read.

Decode is weight-bandwidth-bound (3.37 GB of int4 nibbles per step at 7B).
A step serves ``n_slots`` tokens at once, so the weight cost per token
falls ~linearly with occupied slots until the KV-cache reads and the
per-sync scheduler overhead take over. serving_r05.jsonl measured only
n_slots=8 (529 tok/s aggregate); this ladder sweeps 8/16/32 slots at
decode_quantum=8 with the int8 KV cache (halves the per-slot cache read,
exactness-tested in tests/test_kv_quant.py) to find the knee.

  python tools/serving_sweep_r05b.py [--slots 8 16 32]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--prompt_len", type=int, default=64)
    ap.add_argument("--max_new_tokens", type=int, default=96)
    ap.add_argument("--slots", type=int, nargs="+", default=[8, 16, 32])
    ap.add_argument("--quantum", type=int, default=8)
    ap.add_argument("--requests_per_slot", type=int, default=3)
    ap.add_argument("--cache", choices=["bf16", "int8"], default="bf16")
    ap.add_argument("--arrival_rate", type=float, default=0.0,
                    help="requests/sec Poisson arrivals; 0 = closed loop")
    ap.add_argument("--model", default="Llama-2-7b-hf")
    args = ap.parse_args()

    from fastmax_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    from bench import build_fake_7b_int4
    from fastmax_tpu.inference.bench_serving import run_load
    from fastmax_tpu.inference.continuous import ContinuousBatcher
    from fastmax_tpu.models.config import Config

    cfg = Config.from_name(args.model)
    # 128-aligned: the Pallas int8 decode-attention eligibility gate
    # (ops/decode_attention.int8_decode_eligible) requires S % 128 == 0
    seq_need = args.prompt_len + args.max_new_tokens + 16
    seq_need += (-seq_need) % 128
    cfg.block_size = seq_need
    t0 = time.perf_counter()
    params = build_fake_7b_int4(cfg)
    jax.block_until_ready(params)
    print(f"7B int4 build: {time.perf_counter()-t0:.0f}s", file=sys.stderr)

    rng = np.random.default_rng(0)

    for n_slots in args.slots:
        n_requests = args.requests_per_slot * n_slots
        prompts = [rng.integers(1, 32000, size=(args.prompt_len,)).astype(np.int32)
                   for _ in range(n_requests)]
        t0 = time.perf_counter()
        batcher = ContinuousBatcher(
            cfg, params, n_slots=n_slots, max_seq_length=seq_need,
            weights_mode="quantized",
            cache_dtype=jnp.int8 if args.cache == "int8" else None,
            decode_quantum=args.quantum,
        )
        w = batcher.submit(prompts[0], 4, temperature=0.0, return_request=True)
        while not w.done:
            batcher.step()
        compile_s = time.perf_counter() - t0
        res = run_load(batcher, prompts, args.max_new_tokens,
                       arrival_rate=args.arrival_rate)
        res = {
            "metric": "serving_aggregate_decode_7b_int4",
            "model": args.model,
            "n_slots": n_slots,
            "decode_quantum": args.quantum,
            "cache_dtype": args.cache,
            "prompt_len": args.prompt_len,
            "max_new_tokens": args.max_new_tokens,
            "max_seq": seq_need,
            "arrival_rate": args.arrival_rate,
            "compile_s": round(compile_s, 1),
            **res,
        }
        print(json.dumps(res), flush=True)
        del batcher

    # one open-loop row at the best slot count for a latency-under-load
    # view (arrival_rate chosen near the closed-loop knee)


if __name__ == "__main__":
    main()
