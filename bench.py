"""Benchmark entry point for the driver.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Measures single-chip KV-cached decode throughput (tokens/sec) on the real
TPU for the flagship architecture with NF4-quantized weights — the
BASELINE.json north-star axis. Baseline: the reference's Llama-2 7B bnb.nf4
on 1xA100 = 19.98 tok/s (tutorials/resource-tables.md:141); since round-1
benching runs a reduced-depth model, vs_baseline is reported against a
FLOP/byte-scaled share of that number (see _scaled_baseline).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _model_bytes(params) -> float:
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))


def main() -> None:
    from fastmax_tpu.models.config import Config
    from fastmax_tpu.models import gpt
    from fastmax_tpu.ops.quant import quantize_model
    from fastmax_tpu.inference.engine import InferenceEngine

    # TinyLlama-1.1B architecture — the largest registry model that inits
    # quickly on one v5e chip; full 22 layers.
    cfg = Config.from_name("TinyLlama-1.1B-intermediate-step-1431k-3T")
    cfg.block_size = 1024

    params = gpt.init_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)
    qparams = quantize_model(params, "bnb.nf4")
    del params

    engine = InferenceEngine(cfg, qparams, max_seq_length=1024, batch_size=1)
    prompt = jnp.asarray(np.random.default_rng(0).integers(1, 32000, (64,)), jnp.int32)

    # warmup/compile
    out = engine.generate(prompt, 64 + 32, temperature=0.0, key=jax.random.PRNGKey(1))
    out.block_until_ready() if hasattr(out, "block_until_ready") else None

    # TTFT: prefill + first token (warm), reported to stderr as a secondary
    cache = engine.new_cache()
    t0 = time.perf_counter()
    logits, cache = engine._prefill(engine.params, prompt[None].astype(jnp.int32), cache, 0)
    logits.block_until_ready()
    ttft = time.perf_counter() - t0
    print(f"p50 TTFT (64-token prompt, warm): {ttft*1e3:.1f} ms", file=sys.stderr)
    del cache

    n_new = 256
    t0 = time.perf_counter()
    out = engine.generate(prompt, 64 + n_new, temperature=0.0, key=jax.random.PRNGKey(2))
    np.asarray(out)
    dt = time.perf_counter() - t0
    toks_per_s = (out.shape[1] - 64) / dt

    # Reference baseline: Llama-2 7B nf4 = 19.98 tok/s on A100. Decode is
    # weight-bandwidth-bound, so scale by model size ratio (7B/1.1B) for the
    # reduced benchmark model.
    baseline_7b = 19.98
    scale = 6.74 / 1.1
    vs_baseline = toks_per_s / (baseline_7b * scale)

    print(
        json.dumps(
            {
                "metric": "tinyllama_1.1b_nf4_decode",
                "value": round(float(toks_per_s), 2),
                "unit": "tok/s",
                "vs_baseline": round(float(vs_baseline), 3),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
