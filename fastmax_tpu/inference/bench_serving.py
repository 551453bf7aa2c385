"""Serving benchmark: aggregate throughput + latency over the batcher.

The reference publishes only batch-1 decode tok/s (tutorials/
resource-tables.md); this harness measures what a serving deployment
actually cares about on one chip: aggregate generated tok/s across
``n_slots`` continuous-batching lanes, time-to-first-token, and
per-request latency percentiles — under either a closed-loop load (all
requests queued up front) or an open-loop Poisson arrival process.

  python -m fastmax_tpu.inference.bench_serving --checkpoint_dir ckpt \\
      --quantize bnb.nf4 --n_slots 8 --decode_quantum 16 \\
      --n_requests 32 --prompt_len 64 --max_new_tokens 128

Prints one JSON line (same shape as bench.py / scaling_bench) so sweeps
are machine-readable.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Optional

import numpy as np


def run_load(
    batcher,
    prompts,
    max_new_tokens: int,
    *,
    arrival_rate: float = 0.0,
    seed: int = 0,
) -> dict:
    """Drive ``batcher`` through one load and measure it.

    arrival_rate: 0 = closed-loop (everything queued up front, the peak-
    throughput number); > 0 = open-loop Poisson arrivals at that many
    requests/sec (latency under load). Returns aggregate + percentile
    metrics. Timing is wall-clock around ``step()`` — the same scheduler
    loop a server runs, so dispatch overheads are included."""
    rng = np.random.default_rng(seed)
    n = len(prompts)
    gaps = rng.exponential(1.0 / arrival_rate, n) if arrival_rate > 0 else np.zeros(n)
    arrive_at = np.cumsum(gaps)

    reqs = []
    submit_t = {}
    first_t = {}
    done_t = {}
    t0 = time.perf_counter()
    next_i = 0
    while len(done_t) < n:
        now = time.perf_counter() - t0
        while next_i < n and arrive_at[next_i] <= now:
            r = batcher.submit(prompts[next_i], max_new_tokens, temperature=0.0,
                              return_request=True)
            submit_t[r.request_id] = time.perf_counter()
            reqs.append(r)
            next_i += 1
        if next_i < n and not batcher.inflight():
            # open-loop idle gap before the next arrival
            time.sleep(min(arrive_at[next_i] - now, 0.01))
            continue
        batcher.step()
        t = time.perf_counter()
        for r in reqs:
            if r.request_id not in first_t and r.generated:
                first_t[r.request_id] = t
            if r.request_id not in done_t and r.done:
                done_t[r.request_id] = t
    t_total = time.perf_counter() - t0

    gen_tokens = sum(len(r.generated) for r in reqs)
    lat = np.asarray([done_t[r.request_id] - submit_t[r.request_id] for r in reqs])
    ttft = np.asarray([first_t[r.request_id] - submit_t[r.request_id] for r in reqs])
    out = {
        "n_requests": n,
        "generated_tokens": int(gen_tokens),
        "aggregate_tok_s": round(gen_tokens / t_total, 2),
        "wall_s": round(t_total, 2),
        "ttft_p50_ms": round(float(np.percentile(ttft, 50)) * 1e3, 1),
        "ttft_p95_ms": round(float(np.percentile(ttft, 95)) * 1e3, 1),
        "latency_p50_s": round(float(np.percentile(lat, 50)), 3),
        "latency_p95_s": round(float(np.percentile(lat, 95)), 3),
    }
    drafted = getattr(batcher, "spec_drafted", 0)
    if drafted:
        # honesty term for speculative rows: how often drafts actually land
        out["spec_acceptance"] = round(batcher.spec_accepted / drafted, 3)
    return out


def run(
    checkpoint_dir: Optional[Path] = None,
    model_name: Optional[str] = None,
    quantize: Optional[str] = None,
    attn_alg: Optional[str] = None,
    precision: str = "bfloat16",
    weights_mode: str = "auto",
    n_slots: int = 8,
    decode_quantum: int = 1,
    speculative_k: int = 0,
    prefill_chunk: int = 0,
    kv_cache_dtype: Optional[str] = None,
    max_seq_length: Optional[int] = None,
    n_requests: int = 32,
    prompt_len: int = 64,
    max_new_tokens: int = 128,
    arrival_rate: float = 0.0,
    seed: int = 0,
) -> dict:
    """Build the model (random weights with --model_name, a real checkpoint
    with --checkpoint_dir), run one load, print one JSON line."""
    import jax
    import jax.numpy as jnp

    from ..models import gpt
    from ..models.config import Config
    from .continuous import ContinuousBatcher

    if checkpoint_dir is not None:
        from .generate import load_and_prepare

        cfg, params = load_and_prepare(
            Path(checkpoint_dir), quantize=quantize, attn_alg=attn_alg,
            precision=precision,
        )
    else:
        kw = {"attn_alg": attn_alg} if attn_alg else {}
        cfg = Config.from_name(model_name or "pythia-14m", **kw)
        params = gpt.init_params(cfg, jax.random.PRNGKey(seed),
                                 getattr(jnp, precision))
        if quantize:
            from ..ops.quant import quantize_model

            params = quantize_model(params, quantize)

    seq_need = prompt_len + max_new_tokens + max(speculative_k + 1, decode_quantum)
    cfg.block_size = max(cfg.block_size, seq_need)
    batcher = ContinuousBatcher(
        cfg, params, n_slots=n_slots,
        max_seq_length=max_seq_length or seq_need,
        weights_mode=weights_mode, decode_quantum=decode_quantum,
        speculative_k=speculative_k, prefill_chunk=prefill_chunk,
        cache_dtype=getattr(jnp, kv_cache_dtype) if kv_cache_dtype else None,
    )

    rng = np.random.default_rng(seed)
    vocab = cfg.padded_vocab_size
    prompts = [rng.integers(1, vocab, size=(prompt_len,)).astype(np.int32)
               for _ in range(n_requests)]

    # warmup: compile prefill + decode once outside the measured window
    w = batcher.submit(prompts[0], 4, temperature=0.0, return_request=True)
    while not w.done:
        batcher.step()

    result = run_load(batcher, prompts, max_new_tokens,
                      arrival_rate=arrival_rate, seed=seed)
    result = {
        "metric": "serving_aggregate_decode",
        "model": cfg.name,
        "n_slots": n_slots,
        "decode_quantum": decode_quantum,
        **result,
    }
    print(json.dumps(result))
    return result


def main() -> None:
    from ..utils.cli import CLI

    CLI(run)


if __name__ == "__main__":
    main()
