"""Round-3 serving re-measurement (VERDICT r02 #4): the 8-slot continuous
batching number predated decode_quantum and chunked prefill. Sweep
decode_quantum {1, 4, 8} and prompt-lookup speculation on the bench.py
fake-7B int8 build (identical per-token HBM traffic/compute to a real NF4
checkpoint served as int8; weights random either way).

  python tools/serving_sweep_r03.py [--quick]

One JSON line per config -> bench_results/serving_r03.jsonl.
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
    ap.add_argument("--n_requests", type=int, default=24)
    ap.add_argument("--prompt_len", type=int, default=64)
    ap.add_argument("--max_new_tokens", type=int, default=96)
    ap.add_argument("--n_slots", type=int, default=8)
    ap.add_argument("--only", type=int, default=-1,
                    help="run just config #N (process isolation: batcher "
                         "HBM accumulates across configs in one process)")
    args = ap.parse_args()

    from fastmax_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()

    import jax
    from bench import build_fake_7b_int8
    from fastmax_tpu.inference.bench_serving import run_load
    from fastmax_tpu.inference.continuous import ContinuousBatcher
    from fastmax_tpu.models.config import Config

    cfg = Config.from_name("Llama-2-7b-hf")
    seq_need = args.prompt_len + args.max_new_tokens + 16
    cfg.block_size = seq_need
    t0 = time.perf_counter()
    params = build_fake_7b_int8(cfg)
    jax.block_until_ready(params)
    print(f"7B int8 build: {time.perf_counter()-t0:.0f}s", file=sys.stderr)

    rng = np.random.default_rng(0)
    prompts = [rng.integers(1, 32000, size=(args.prompt_len,)).astype(np.int32)
               for _ in range(args.n_requests)]
    # speculation-friendly prompts: repeated n-grams the prompt-lookup
    # drafter can actually hit (random tokens accept ~nothing)
    period = rng.integers(1, 32000, size=(8,))
    rep = np.tile(period, args.prompt_len // 8 + 1)[: args.prompt_len].astype(np.int32)
    prompts_rep = [np.roll(rep, i) for i in range(args.n_requests)]

    configs = [
        {"decode_quantum": 1},
        {"decode_quantum": 4},
        {"decode_quantum": 8},
        {"decode_quantum": 1, "speculative_k": 4},
        {"decode_quantum": 1, "speculative_k": 4, "rep_prompts": True},
    ]
    if args.only >= 0:
        configs = configs[args.only : args.only + 1]
    for conf in configs:
        rep_prompts = conf.pop("rep_prompts", False)
        t0 = time.perf_counter()
        batcher = ContinuousBatcher(
            cfg, params, n_slots=args.n_slots, max_seq_length=seq_need,
            weights_mode="auto", **conf,
        )
        w = batcher.submit(prompts[0], 4, temperature=0.0, return_request=True)
        while not w.done:
            batcher.step()
        compile_s = time.perf_counter() - t0
        res = run_load(batcher, prompts_rep if rep_prompts else prompts,
                       args.max_new_tokens)
        res = {
            "metric": "serving_aggregate_decode_7b_int8",
            "n_slots": args.n_slots,
            **conf,
            "rep_prompts": rep_prompts,
            "compile_s": round(compile_s, 1),
            **res,
        }
        print(json.dumps(res), flush=True)
        del batcher


if __name__ == "__main__":
    main()
