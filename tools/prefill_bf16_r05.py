"""Measure the bf16-operand prefill path in the rank-1 int4 kernels.

At prefill-sized m the kernel is MXU-bound, and f32 operands run the
systolic array at a fraction of its bf16 rate. _INT4_BF16_M switches the
dot operands to bf16 for m >= 64 (int4 codes are exact in bf16; the
rank-1 envelope stays f32 — see ops/quant_pallas._int4_r1_kernel).

Two measurements, slope protocol (chained iterations; the difference of
two chain lengths cancels the tunnel RTT and dispatch cost exactly —
tools/int4_opt_r05.py introduced this):

  1. kernel-scope: stacked rank-1 matmul at m=512 on the 7B shapes,
     f32 vs bf16 operands.
  2. model-scope: engine TTFT at 512/2048/4096-token prompts (the
     decode_table_r05 protocol) — rerun after the switch.

  python tools/prefill_bf16_r05.py [--out bench_results/prefill_bf16_r05.jsonl]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def slope_time(f, lo=32, hi=128, reps=3):
    """Median slope (seconds per call) between chained lo and hi calls."""
    import jax

    def run(n):
        t0 = time.perf_counter()
        jax.block_until_ready(f(n))
        return time.perf_counter() - t0

    for n in (lo, hi):
        run(n)  # compile + warm
    vals = []
    for _ in range(reps):
        a, b = run(lo), run(hi)
        vals.append((b - a) / (hi - lo))
    return float(np.median(vals))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="bench_results/prefill_bf16_r05.jsonl")
    ap.add_argument("--m", type=int, default=512)
    args = ap.parse_args()

    from fastmax_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    from fastmax_tpu.ops import quant_pallas as qp

    out = open(args.out, "a")

    def emit(rec):
        line = json.dumps(rec)
        print(line, flush=True)
        out.write(line + "\n")
        out.flush()

    # 7B shapes: attn qkv (4096 -> 3*4096 folded per-proj), mlp fc_12
    # (4096 -> 2*11008), proj (11008 -> 4096)
    L = 4
    for (k, n, tag) in [(4096, 22016, "fc12"), (11008, 4096, "proj")]:
        k_pad = k + (-k) % qp.INT4_PAD_K
        n_pad = n + (-n) % qp.INT4_TILE_N
        key = jax.random.PRNGKey(0)
        pw = jax.random.randint(key, (L, 1, n_pad // qp.INT4_TILE_N, k_pad, 128),
                                -2**31 + 1, 2**31 - 1, jnp.int32)
        u = jnp.full((L, 1, k_pad), 0.01, jnp.float32)
        v = jnp.ones((L, 1, n_pad), jnp.float32)
        x = jax.random.normal(jax.random.PRNGKey(1), (args.m, k_pad), jnp.float32)

        for bf16_dot in (False, True):
            def chain(nit, bf16_dot=bf16_dot, x=x, u=u, pw=pw, v=v):
                @jax.jit
                def go(x):
                    def body(i, acc):
                        y = qp.int4_matmul_rank1_tiled_stacked(
                            acc, u, pw, v, i % L, bf16_dot=bf16_dot)
                        # feed a k_pad-wide slice back so iterations chain
                        w = min(y.shape[1], k_pad)
                        yk = jnp.pad(y[:, :w], ((0, 0), (0, k_pad - w)))
                        return yk * 1e-3 + x * 0.5
                    return jax.lax.fori_loop(0, nit, body, x)
                return go(x)

            sec = slope_time(chain)
            flops = 2 * args.m * k_pad * n_pad
            emit({"metric": "int4_stacked_prefill_matmul", "shape": tag,
                  "m": args.m, "k": k_pad, "n": n_pad,
                  "bf16_dot": bf16_dot, "ms": round(sec * 1e3, 3),
                  "tflops": round(flops / sec / 1e12, 1)})


if __name__ == "__main__":
    main()
