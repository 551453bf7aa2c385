"""Measure this chip's achievable matmul ceiling at the train step's shapes.

MFU is quoted against the device's NOMINAL peak. On a tunneled/virtualized
chip the achievable fraction on real transformer shapes is well below 1.0,
so raw MFU under-states kernel quality. This probe measures:

  1. square    (8192, 8192) @ (8192, 8192)      — the chip's best case
  2. qkv       (B*T, E) @ (E, E + 2*kv)          — attention projections
  3. mlp_up    (B*T, E) @ (E, 2*I)               — fused gate+up
  4. mlp_down  (B*T, I) @ (I, E)                 — down projection

each as a single-dispatch on-device fori_loop (chained carries defeat
call memoization; result fetched, not just block_until_ready — tunneled
runtimes ack early). Prints achieved TFLOP/s and the fraction of nominal
peak per shape, plus the FLOP-weighted ceiling for the model — divide a
measured train MFU by this to get MFU-of-achievable.

  python tools/matmul_ceiling.py --model_name tiny-llama-1.1b \
      --micro_batch 16 --seq_len 1024
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def bench_matmul(m: int, k: int, n: int, iters: int = 24) -> float:
    """Achieved FLOP/s for (m,k)@(k,n) bf16, single dispatch."""
    a = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.bfloat16)

    def many(a, n_iter):
        def body(_, x):
            y = jnp.dot(x, b, preferred_element_type=jnp.bfloat16)
            # fold back to (m, k) so the loop chains without shape growth
            return jnp.dot(y, b.T[: y.shape[1], :k], preferred_element_type=jnp.bfloat16)

        return jax.lax.fori_loop(0, n_iter, body, a)

    f = jax.jit(many)
    out = f(a, 1)
    np.asarray(out[:1, :8])  # fetch
    t0 = time.perf_counter()
    out = f(a, iters)
    np.asarray(out[:1, :8])
    dt = time.perf_counter() - t0
    # two matmuls per body: m*k*n and m*n*k
    return 2 * (2 * m * k * n) * iters / dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_name", default="tiny-llama-1.1b")
    ap.add_argument("--micro_batch", type=int, default=16)
    ap.add_argument("--seq_len", type=int, default=1024)
    args = ap.parse_args()

    from fastmax_tpu.models.config import Config
    from fastmax_tpu.utils.flops import device_peak_flops

    cfg = Config.from_name(args.model_name)
    peak = device_peak_flops(jax.devices()[0].device_kind)
    print(f"device={jax.devices()[0].device_kind} nominal_peak={peak/1e12:.1f} TFLOP/s")

    bt = args.micro_batch * args.seq_len
    e = cfg.n_embd
    i = cfg.intermediate_size
    kv = cfg.n_query_groups * cfg.head_size
    shapes = {
        "square_8192": (8192, 8192, 8192),
        "qkv": (bt, e, e + 2 * kv),
        "attn_proj": (bt, e, e),
        "mlp_up(gate+up)": (bt, e, 2 * i),
        "mlp_down": (bt, i, e),
        "lm_head_chunk": (args.micro_batch * 128, e, cfg.padded_vocab_size),
    }
    # FLOP weights per layer (fwd; bwd doubles every term equally)
    weights = {
        "qkv": e * (e + 2 * kv),
        "attn_proj": e * e,
        "mlp_up(gate+up)": e * 2 * i,
        "mlp_down": i * e,
    }
    fracs = {}
    for name, (m, k, n) in shapes.items():
        fl = bench_matmul(m, k, n)
        fracs[name] = fl / peak
        print(f"{name:16s} ({m:6d},{k:5d},{n:5d}): {fl/1e12:7.1f} TFLOP/s "
              f"= {fl/peak:6.1%} of nominal")
    wsum = sum(weights.values())
    ceiling = sum(fracs[k_] * w for k_, w in weights.items()) / wsum
    print(f"\nFLOP-weighted transformer matmul ceiling: {ceiling:.1%} of nominal")
    print("=> a train-step MFU of X means X/{:.3f} of ACHIEVABLE compute".format(ceiling))


if __name__ == "__main__":
    main()
