"""A/B for ContinuousBatcher(adaptive_quantum=True) on the real chip.

The fixed quantum is a throughput/latency trade (docs/perf.md +
serving_ladder_r05c.jsonl): q48 wins closed-loop (1261 vs 1158 tok/s)
but collapses open-loop (230 tok/s, TTFT p95 23 s at 10 req/s) because
admission only happens at quantum boundaries. adaptive_quantum runs the
short quantum whenever a slot is free after admission and the full one
when every slot is busy — it should match fixed-q48 closed-loop AND
fixed-q24 open-loop without tuning.

Four arms, one process (drift cancels between adjacent arms; OOM-prone
rebuild accumulation means keep the count at 4):
  open-loop 10 req/s : adaptive(48/8) vs fixed q24
  closed-loop        : adaptive(48/8) vs fixed q48

  python tools/adaptive_quantum_ab_r05.py
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> None:
    from fastmax_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()

    import jax
    from bench import build_fake_7b_int4
    from fastmax_tpu.inference.bench_serving import run_load
    from fastmax_tpu.inference.continuous import ContinuousBatcher
    from fastmax_tpu.models.config import Config

    cfg = Config.from_name("Llama-2-7b-hf")
    seq_need = 64 + 96 + 16
    seq_need += (-seq_need) % 128
    cfg.block_size = seq_need
    t0 = time.perf_counter()
    params = build_fake_7b_int4(cfg)
    jax.block_until_ready(params)
    print(f"7B int4 build: {time.perf_counter()-t0:.0f}s", file=sys.stderr)

    rng = np.random.default_rng(0)
    arms = [
        ("open_adaptive48", dict(decode_quantum=48, adaptive_quantum=True), 10.0),
        ("open_q24", dict(decode_quantum=24), 10.0),
        ("closed_adaptive48", dict(decode_quantum=48, adaptive_quantum=True), 0.0),
        ("closed_q48", dict(decode_quantum=48), 0.0),
    ]
    for tag, kw, rate in arms:
        n_requests = 96 if rate == 0.0 else 128
        prompts = [rng.integers(1, 32000, size=(64,)).astype(np.int32)
                   for _ in range(n_requests)]
        t0 = time.perf_counter()
        try:
            b = ContinuousBatcher(cfg, params, n_slots=32,
                                  max_seq_length=seq_need,
                                  weights_mode="quantized", **kw)
            w = b.submit(prompts[0], 4, temperature=0.0, return_request=True)
            while not w.done:
                b.step()
            compile_s = time.perf_counter() - t0
            res = run_load(b, prompts, 96, arrival_rate=rate)
            del b
        except Exception as e:  # noqa: BLE001
            res = {"error": f"{type(e).__name__}: {e}"[:180]}
            compile_s = time.perf_counter() - t0
        print(json.dumps({
            "metric": "adaptive_quantum_ab", "arm": tag, "n_slots": 32,
            "arrival_rate": rate, "compile_s": round(compile_s, 1), **res,
        }), flush=True)


if __name__ == "__main__":
    main()
