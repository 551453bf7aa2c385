"""Speculation acceptance on REAL trained weights (verdict r03 next #8).

The r03 speculative serving rows (345-360 tok/s) rode prompt-lookup
acceptance on degenerate random-model output. This sweep serves the
in-image-trained 51M byte-level code model (tools/make_code_corpus.py +
pretrain, the accuracy-eval model) on real code-corpus prompts and reports
the measured draft-acceptance rate beside tok/s — the honest footing for
any speculative throughput claim.

  python tools/serving_real_r04.py --ckpt out/code_model/final
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="out/code_model/final")
    ap.add_argument("--corpus", default="eval_assets/corpus.txt")
    ap.add_argument("--n_requests", type=int, default=24)
    ap.add_argument("--prompt_len", type=int, default=256)
    ap.add_argument("--max_new_tokens", type=int, default=96)
    ap.add_argument("--n_slots", type=int, default=8)
    args = ap.parse_args()

    from fastmax_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()

    from fastmax_tpu.inference.bench_serving import run_load
    from fastmax_tpu.inference.continuous import ContinuousBatcher
    from fastmax_tpu.utils.checkpoint import load_model_params

    cfg, params = load_model_params(pathlib.Path(args.ckpt))
    cfg.block_size = max(cfg.block_size, args.prompt_len + args.max_new_tokens + 16)

    # real code prompts from the tail (val region) of the training corpus
    corpus = pathlib.Path(args.corpus).read_bytes()
    tail = corpus[int(len(corpus) * 0.9):]
    rng = np.random.default_rng(0)
    prompts = []
    for _ in range(args.n_requests):
        lo = int(rng.integers(0, len(tail) - args.prompt_len - 1))
        prompts.append(
            np.frombuffer(tail[lo:lo + args.prompt_len], np.uint8).astype(np.int32)
        )

    seq_need = args.prompt_len + args.max_new_tokens + 16
    for conf in (
        {"decode_quantum": 1},
        {"decode_quantum": 8},
        {"speculative_k": 4},
        {"speculative_k": 6},
    ):
        t0 = time.perf_counter()
        batcher = ContinuousBatcher(
            cfg, params, n_slots=args.n_slots, max_seq_length=seq_need, **conf
        )
        w = batcher.submit(prompts[0], 4, temperature=0.0, return_request=True)
        while not w.done:
            batcher.step()
        compile_s = time.perf_counter() - t0
        res = run_load(batcher, prompts, args.max_new_tokens)
        res = {
            "metric": "serving_real_code_model_51m",
            "n_slots": args.n_slots,
            **conf,
            "compile_s": round(compile_s, 1),
            **res,
        }
        print(json.dumps(res), flush=True)
        del batcher


if __name__ == "__main__":
    main()
