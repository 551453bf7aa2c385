"""Round-5 serving re-measurement: the continuous batcher on the tiled
int4 representation, after the r05 decode fixes (carry cache, Pallas
int8-cache attention, stacked weight kernels).

The r03 serving record (bench_results/serving_r03.jsonl, docs/perf.md)
served int8 weights at decode_quantum=8 for 307.5 aggregate tok/s; the
batched decode path shares gpt.forward with the engine, so the r05 fixes
apply directly. This sweep re-runs the quantum ladder on the int4 build
(0.5 byte/param — now the default serving representation).

  python tools/serving_sweep_r05.py [--only N]
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
    ap.add_argument("--only", type=int, default=-1)
    args = ap.parse_args()

    from fastmax_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()

    import jax
    from bench import build_fake_7b_int4
    from fastmax_tpu.inference.bench_serving import run_load
    from fastmax_tpu.inference.continuous import ContinuousBatcher
    from fastmax_tpu.models.config import Config

    cfg = Config.from_name("Llama-2-7b-hf")
    seq_need = args.prompt_len + args.max_new_tokens + 16
    cfg.block_size = seq_need
    t0 = time.perf_counter()
    params = build_fake_7b_int4(cfg)
    jax.block_until_ready(params)
    print(f"7B int4 build: {time.perf_counter()-t0:.0f}s", file=sys.stderr)

    rng = np.random.default_rng(0)
    prompts = [rng.integers(1, 32000, size=(args.prompt_len,)).astype(np.int32)
               for _ in range(args.n_requests)]

    configs = [
        {"decode_quantum": 1},
        {"decode_quantum": 8},
    ]
    if args.only >= 0:
        configs = configs[args.only: args.only + 1]
    for conf in configs:
        t0 = time.perf_counter()
        batcher = ContinuousBatcher(
            cfg, params, n_slots=args.n_slots, max_seq_length=seq_need,
            weights_mode="quantized", **conf,
        )
        w = batcher.submit(prompts[0], 4, temperature=0.0, return_request=True)
        while not w.done:
            batcher.step()
        compile_s = time.perf_counter() - t0
        res = run_load(batcher, prompts, args.max_new_tokens)
        res = {
            "metric": "serving_aggregate_decode_7b_int4",
            "n_slots": args.n_slots,
            **conf,
            "compile_s": round(compile_s, 1),
            **res,
        }
        print(json.dumps(res), flush=True)
        del batcher


if __name__ == "__main__":
    main()
