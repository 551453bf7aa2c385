"""Round-5 decode table: long-prompt TTFT axis + refreshed decode rows.

Two additions over tools/decode_table_r04.py (verdict r04 weak #7 / next #7):

1. **Prompt-length TTFT sweep** (7B int4, S=4096 cache): warm prefill
   latency at 64 / 512 / 2048 / 4000-token prompts, via BOTH paths —
   - "full": one engine._prefill call (flash attention over the padded
     cache at S >= 2048, ops/flash_attention.flash_attention);
   - "chunked": sequential 512-token engine._prefill chunk calls at
     offsets (the chunked-prefill building block inference/continuous.py
     interleaves with decode — its latency was previously untested).

2. **Refreshed decode rows** for the representations whose r04 numbers
   predate the r05 cache-in-carry + Pallas int8-cache-attention decode
   fixes (decode_profile_r05*.jsonl): 7b_nf4 (exact codebook), 13b_nf4,
   13b_int4.

Each row runs in its own subprocess (memory returned between rows).

  python tools/decode_table_r05.py                 # everything
  python tools/decode_table_r05.py ttft_7b_int4    # subset
"""

from __future__ import annotations

import json
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

PROMPT_LENS = (64, 512, 2048, 4000)
CHUNK = 512

TTFT_ROWS = ("ttft_7b_int4",)
DECODE_ROWS = ("7b_nf4", "13b_nf4", "13b_int4", "7b_int4")


def run_ttft_row(row: str) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench
    from fastmax_tpu.inference.engine import InferenceEngine
    from fastmax_tpu.models.config import Config

    cfg = Config.from_name("Llama-2-7b-hf")
    cfg.block_size = 4096
    out: dict = {"row": row, "model": "Llama-2-7b-hf", "rep": "int4",
                 "max_seq": 4096}
    t0 = time.perf_counter()
    params = bench.build_fake_7b_int4(cfg)
    jax.block_until_ready(params)
    out["build_s"] = round(time.perf_counter() - t0, 1)
    engine = InferenceEngine(cfg, params, max_seq_length=4096, batch_size=1,
                             weights_mode="quantized", cache_dtype=jnp.int8)
    rng = np.random.default_rng(0)

    def prefill_full(tokens):
        cache = engine.new_cache()
        logits, cache = engine._prefill(
            engine.params, tokens[None], cache, 0)
        np.asarray(logits[0, :8])

    def prefill_chunked(tokens):
        cache = engine.new_cache()
        n = tokens.shape[0]
        pos = 0
        while pos < n:
            chunk = tokens[pos: pos + CHUNK]
            logits, cache = engine._prefill(
                engine.params, chunk[None], cache, pos)
            pos += chunk.shape[0]
        np.asarray(logits[0, :8])

    def prefill_engine(tokens):
        # what generate() actually does (auto-chunked at PREFILL_CHUNK)
        cache = engine.new_cache()
        logits, cache = engine._chunked_prefill(tokens[None], cache)
        np.asarray(logits[0, :8])

    results = []
    for plen in PROMPT_LENS:
        tokens = jnp.asarray(rng.integers(1, 32000, (plen,)), jnp.int32)
        rec = {"prompt_len": plen}
        for arm, fn in (("full", prefill_full), ("chunked", prefill_chunked),
                        ("engine", prefill_engine)):
            try:
                fn(tokens)  # compile + warm (each distinct length compiles)
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    fn(tokens)
                    best = min(best, time.perf_counter() - t0)
                rec[f"ttft_{arm}_ms"] = round(best * 1e3, 1)
            except Exception as e:  # noqa: BLE001
                rec[f"ttft_{arm}_err"] = f"{type(e).__name__}: {e}"[:200]
        if "ttft_full_ms" in rec and plen > 0:
            rec["prefill_tok_s_full"] = round(plen / rec["ttft_full_ms"] * 1e3)
        results.append(rec)
        print(json.dumps({**out, **rec}), flush=True)


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--_child":
        row = sys.argv[2]
        if row in TTFT_ROWS:
            run_ttft_row(row)
        else:
            import tools.decode_table_r04 as r04

            r04.run_row(row)
        return
    rows = sys.argv[1:] or list(TTFT_ROWS) + list(DECODE_ROWS)
    for row in rows:
        rc = subprocess.call(
            [sys.executable, "-u", __file__, "--_child", row], cwd=REPO)
        if rc != 0:
            print(json.dumps({"row": row, "error": f"child rc={rc}"}),
                  flush=True)


if __name__ == "__main__":
    main()
