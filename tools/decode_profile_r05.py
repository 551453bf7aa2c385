"""Decode-step decomposition on the real chip, round 5.

r05 finding (int4_opt_r05b.jsonl): the tiled int4 kernel already streams at
600-692 GB/s — the r04 "kernel at 450 GB/s" was the tunnel-RTT timing
artifact. The true gap is IN-MODEL: 87 tok/s = 11.5 ms/token vs ~5.5 ms of
summed kernel time, so ~6 ms/token hides in the decode step outside the
weight matmuls. This tool splits it:

  full       one decode step: forward (int8 KV cache @1024) + argmax sample
  fwd        forward only (no sampling)
  fwd_bf16   forward with a bf16 KV cache (isolates int8-cache dequant cost)
  fwd_nokv   forward with kv_cache=None, t=1 (weights + per-op overhead
             only — no attention-cache traffic at all)
  sample     argmax over (1, 32000) logits alone
  unrollN    fwd with scan unroll N over the 32 layers

Timing: differential chained fori_loop (slope between two iteration
counts; cancels the ~25 ms tunnel RTT exactly — see int4_opt_r05.py).

  python tools/decode_profile_r05.py [--variants ...] [--out f]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np


def diff_time(step, carry0, params, lo=20, hi=80, reps=3):
    """step: (carry, i, params) -> carry. Returns s/iter via two-point
    slope. ``params`` rides as an explicit jit argument — closure-capturing
    a 3.8 GB pytree makes XLA lower it as inline constants, which the first
    run of this tool spent >25 min compiling."""

    def many(carry, n, params):
        def body(i, c):
            return step(c, i, params)

        return jax.lax.fori_loop(0, n, body, carry)

    f = jax.jit(many)

    def run(n):
        out = f(carry0, n, params)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = f(carry0, n, params)
            np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = run(lo), run(hi)
    return (t_hi - t_lo) / (hi - lo)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants",
                    default="full,fwd,fwd_bf16,fwd_nokv,sample,unroll2,unroll4")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    sys.path.insert(0, str(REPO))
    import bench
    from fastmax_tpu.models.config import Config
    from fastmax_tpu.models import gpt
    from fastmax_tpu.inference.engine import InferenceEngine

    cfg = Config.from_name("Llama-2-7b-hf")
    cfg.block_size = 1024
    params = bench.build_fake_7b_int4(cfg)
    jax.block_until_ready(params)
    print("7B int4 built", file=sys.stderr, flush=True)

    out_f = open(args.out, "a") if args.out else None

    def emit(rec):
        line = json.dumps(rec)
        print(line, flush=True)
        if out_f:
            out_f.write(line + "\n")
            out_f.flush()

    engines = {}

    def get_engine(cache_dtype, unroll=1):
        key = (str(cache_dtype), unroll)
        if key not in engines:
            engines[key] = InferenceEngine(
                cfg, params, max_seq_length=1024, batch_size=1,
                weights_mode="quantized", cache_dtype=cache_dtype,
                scan_unroll=unroll,
            )
        return engines[key]

    tok0 = jnp.zeros((1, 1), jnp.int32)
    pos = jnp.int32(512)

    for v in args.variants.split(","):
        try:
            if v == "sample":
                logits = jnp.zeros((1, 32000), jnp.float32)

                def step(c, i, lg):
                    nxt = jnp.argmax(c + lg, axis=-1).astype(jnp.float32)
                    return c + 1e-30 * nxt[0]

                dt = diff_time(step, jnp.float32(0.0), logits, lo=200, hi=1000)
            elif v == "fwd_nokv":
                eng = get_engine(jnp.int8)

                def step(c, i, p):
                    logits, _ = gpt.forward(
                        p, cfg, tok0 + c,
                        rope_cache=eng.rope_cache,
                    )
                    return c + (1e-30 * jnp.sum(logits)).astype(c.dtype)

                dt = diff_time(step, jnp.int32(0), eng.params, lo=10, hi=40)
            elif v == "mm_scan":
                # matmuls-only layer scan: isolates stacked-weight slicing +
                # Pallas kernel time from norms/rope/attention/cache. If this
                # alone reaches most of fwd_nokv, the gap is weight-side
                # (scan slicing), not the small ops between kernels.
                from fastmax_tpu.ops.linear import linear

                eng = get_engine(jnp.int8)

                def layer(x, bp):
                    a = bp["attn"]
                    qkv = linear(a["attn"], x)
                    h = qkv[:, : x.shape[-1]]
                    o = linear(a["proj"], h)
                    m = bp["mlp"]
                    up = linear(m["fc_12"], o)
                    h1, h2 = jnp.split(up, 2, axis=-1)
                    return linear(m["proj"], jax.nn.silu(h1) * h2)

                def step(c, i, blocks):
                    def body(carry, bp):
                        return layer(carry, bp).astype(carry.dtype), None

                    y, _ = jax.lax.scan(body, c, blocks)
                    return y * 1e-30 + c

                x0 = jnp.ones((1, 4096), jnp.bfloat16)
                dt = diff_time(step, x0, eng.params["blocks"], lo=10, hi=40)
            elif v == "mm_unroll":
                # same matmul chain, python-unrolled with STATIC layer
                # indices: if this returns to isolated-kernel speed, the
                # cost is lax.scan's dynamic weight slicing
                from fastmax_tpu.ops.linear import linear

                eng = get_engine(jnp.int8)

                def layer(x, bp):
                    a = bp["attn"]
                    qkv = linear(a["attn"], x)
                    h = qkv[:, : x.shape[-1]]
                    o = linear(a["proj"], h)
                    m = bp["mlp"]
                    up = linear(m["fc_12"], o)
                    h1, h2 = jnp.split(up, 2, axis=-1)
                    return linear(m["proj"], jax.nn.silu(h1) * h2)

                def step(c, i, blocks):
                    y = c
                    for l in range(32):
                        bp = jax.tree.map(lambda a: a[l], blocks)
                        y = layer(y, bp).astype(c.dtype)
                    return y * 1e-30 + c

                x0 = jnp.ones((1, 4096), jnp.bfloat16)
                dt = diff_time(step, x0, eng.params["blocks"], lo=10, hi=40)
            else:
                if v == "fwd_bf16":
                    eng = get_engine(jnp.bfloat16)
                elif v.startswith("unroll"):
                    eng = get_engine(jnp.int8, unroll=int(v[6:]))
                else:
                    eng = get_engine(jnp.int8)
                cache0 = eng.new_cache()
                include_sample = v == "full"

                def step(carry, i, p):
                    tok, cache = carry
                    logits, cache = eng._model_step(p, tok, cache, pos)
                    if include_sample:
                        nxt = jnp.argmax(
                            logits[:, -1, :].astype(jnp.float32), axis=-1
                        ).astype(jnp.int32)[:, None]
                    else:
                        nxt = tok
                    return (nxt, cache)

                dt = diff_time(step, (tok0, cache0), eng.params, lo=10, hi=40)
            emit({"variant": v, "ms": round(dt * 1e3, 3),
                  "tok_s_equiv": round(1.0 / dt, 1)})
        except Exception as e:  # noqa: BLE001
            emit({"variant": v, "error": f"{type(e).__name__}: {e}"[:300]})


if __name__ == "__main__":
    main()

