"""Round-5c serving ladder extension: past 32 slots, mixed cache dtypes.

The r05b record is 32 slots / bf16 cache / quantum 24 -> 1158.8 tok/s
(bench_results/serving_r05b.jsonl). Two untried arms could still win:
48 slots bf16 (the 64-slot bf16 cache OOMs: 8.6 GB cache + 3.5 GB
weights; 48 slots is 6.4 GB and fits) and 64 slots int8 (4.3 GB cache --
int8 lost at 32 slots in the record window, but doubling tokens/step
amortizes the 3.37 GB weight read further).

This host's throughput window drifts run-to-run (the r05b record config
read 429 tok/s while a pytest suite shared the host; MFU drift up to
1.7x is documented in STATUS.md), so arms are interleaved ROUND-ROBIN in
one process and the decision metric is the same-round ratio vs the
record arm -- drift cancels within a round. Params are built once and
shared; batchers are rebuilt per round (three live caches would not fit
16 GB together) with the persistent compile cache keeping later rounds
warm.

  python tools/serving_ladder_r05c.py --rounds 2 --arms 32:bf16 48:bf16 64:int8
"""

from __future__ import annotations

import argparse
import json
import pathlib
import statistics
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--prompt_len", type=int, default=64)
    ap.add_argument("--max_new_tokens", type=int, default=96)
    ap.add_argument("--arms", nargs="+", default=["32:bf16", "48:bf16", "64:int8"],
                    help="slots:cache_dtype[:quantum] per arm; first arm is "
                         "the baseline; quantum defaults to --quantum")
    ap.add_argument("--quantum", type=int, default=24)
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--requests_per_slot", type=int, default=3)
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
    # S % 128 == 0: the Pallas int8 decode-attention eligibility gate
    seq_need = args.prompt_len + args.max_new_tokens + 16
    seq_need += (-seq_need) % 128
    cfg.block_size = seq_need
    t0 = time.perf_counter()
    params = build_fake_7b_int4(cfg)
    jax.block_until_ready(params)
    print(f"7B int4 build: {time.perf_counter()-t0:.0f}s", file=sys.stderr)

    rng = np.random.default_rng(0)
    arms = []
    for spec in args.arms:
        parts = spec.split(":")
        arms.append((int(parts[0]), parts[1],
                     int(parts[2]) if len(parts) > 2 else args.quantum))

    by_arm: dict = {spec: [] for spec in args.arms}
    rounds: list = []
    for rnd in range(args.rounds):
        this_round = {}
        for spec, (n_slots, cache, quantum) in zip(args.arms, arms):
            n_requests = args.requests_per_slot * n_slots
            prompts = [rng.integers(1, 32000, size=(args.prompt_len,)).astype(np.int32)
                       for _ in range(n_requests)]
            t0 = time.perf_counter()
            try:
                batcher = ContinuousBatcher(
                    cfg, params, n_slots=n_slots, max_seq_length=seq_need,
                    weights_mode="quantized",
                    cache_dtype=jnp.int8 if cache == "int8" else None,
                    decode_quantum=quantum,
                )
                w = batcher.submit(prompts[0], 4, temperature=0.0,
                                   return_request=True)
                while not w.done:
                    batcher.step()
                compile_s = time.perf_counter() - t0
                res = run_load(batcher, prompts, args.max_new_tokens)
                del batcher
            except Exception as e:  # noqa: BLE001 -- OOM arms stay in the record
                res = {"error": f"{type(e).__name__}: {e}"[:180]}
                compile_s = time.perf_counter() - t0
                # NOTE (measured round 0): after a RESOURCE_EXHAUSTED arm the
                # TPU allocator stays poisoned for every later arm in this
                # process -- even configs that fit when run first. Keep OOM
                # candidates LAST in --arms order; the baseline reading from
                # earlier in the round is still valid.
            res = {
                "metric": "serving_ladder_r05c", "model": args.model,
                "arm": spec, "round": rnd, "n_slots": n_slots,
                "cache_dtype": cache, "decode_quantum": quantum,
                "prompt_len": args.prompt_len,
                "max_new_tokens": args.max_new_tokens, "max_seq": seq_need,
                "compile_s": round(compile_s, 1), **res,
            }
            print(json.dumps(res), flush=True)
            if "aggregate_tok_s" in res:
                by_arm[spec].append(res["aggregate_tok_s"])
                this_round[spec] = res["aggregate_tok_s"]
        rounds.append(this_round)

    base = args.arms[0]
    for spec in args.arms:
        vals = by_arm[spec]
        summary = {
            "summary": spec, "n": len(vals),
            "median_tok_s": round(statistics.median(vals), 1) if vals else None,
        }
        if spec != base:
            ratios = [r[spec] / r[base] for r in rounds
                      if spec in r and base in r and r[base]]
            if ratios:
                summary["same_round_ratio_vs_" + base] = {
                    "median": round(statistics.median(ratios), 3),
                    "all": [round(x, 3) for x in ratios],
                }
        print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
