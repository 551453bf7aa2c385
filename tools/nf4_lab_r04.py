"""Round-4 NF4 decode-kernel lab.

Measures per-matmul time and effective HBM bandwidth for candidate
implementations of the decode-critical quantized matmul at the Llama-2-7B
decode shapes (engine layout: fused qkv / proj / fused gate+up / mlp down).

Timing method: the tunneled chip has ~2 ms dispatch latency per executable,
so each measurement wraps R repetitions of the matmul in ONE jitted
lax.scan whose carry feeds a negligible perturbation of x back in (defeats
CSE without adding bandwidth), then divides by R. This mirrors how the
engine actually runs (all matmuls inside one while_loop executable).

Usage: python tools/nf4_lab_r04.py [impl ...] [--shapes qkv,proj,fc,down]
Each result prints one JSON line: {impl, m, k, n, us, gbps_read, gbps_per_param}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _repo)
jax.config.update("jax_compilation_cache_dir", os.path.join(_repo, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from fastmax_tpu.ops import quant
from fastmax_tpu.ops import quant_pallas

SHAPES = {
    "qkv": (4096, 12288),
    "proj": (4096, 4096),
    "fc": (4096, 22016),
    "down": (11008, 4096),
}

WSET = 384 * 2**20  # working set per scan sweep; must exceed ~128MB VMEM
TOTAL_REPS = 1024
_OVERHEAD = [0.050]  # measured dispatch+sync round-trip, set by calibrate()


def calibrate():
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8, 128), jnp.float32)
    y = f(x); jax.block_until_ready(y); np.asarray(y).ravel()[:1]
    best = float("inf")
    for _ in range(8):
        t0 = time.perf_counter()
        y = f(x); jax.block_until_ready(y); np.asarray(y).ravel()[:1]
        best = min(best, time.perf_counter() - t0)
    _OVERHEAD[0] = best
    print(f"# dispatch+sync overhead: {best*1e3:.1f} ms", file=sys.stderr)


def repeat_timer(matmul_stacked, weights, x, bytes_per, iters=5):
    """Time one matmul amortized over an engine-like layer scan.

    weights: pytree whose leaves carry a leading L axis (L stacked copies of
    the weight, L sized so one sweep exceeds VMEM — defeats XLA pinning the
    weight in VMEM across iterations, which fakes TB/s for small layers).
    The scan over L runs inside an outer fori_loop, all in ONE executable
    (the tunnel costs ~50 ms per dispatch+sync).
    """
    L = jax.tree_util.tree_leaves(weights)[0].shape[0]
    ro = max(1, TOTAL_REPS // L)

    @jax.jit
    def many(x, weights):
        def sweep(carry, w):
            y = matmul_stacked(carry, w)
            return carry + y.ravel()[0].astype(carry.dtype) * 1e-30, ()

        def outer(_, c):
            return jax.lax.scan(sweep, c, weights)[0]

        return jax.lax.fori_loop(0, ro, outer, x)

    y = many(x, weights)
    jax.block_until_ready(y)
    np.asarray(y).ravel()[:1]
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        y = many(x, weights)
        jax.block_until_ready(y)
        np.asarray(y).ravel()[:1]
        best = min(best, time.perf_counter() - t0)
    # subtract the measured fixed dispatch+sync cost of one executable call
    return max(best - _OVERHEAD[0], best * 0.25) / (L * ro)


def stack_weights(w, bytes_per):
    L = max(4, int(np.ceil(WSET / max(bytes_per, 1))))
    return jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (L,) + a.shape).copy(), w
    )


def make_q4(k, n, key):
    k1, k2 = jax.random.split(key)
    packed = jax.random.randint(k1, (k // 2, n), 0, 256, jnp.int32).astype(jnp.uint8)
    absmax = jax.random.uniform(k2, (k // 64, n), jnp.float32, 0.01, 0.03)
    code = jnp.asarray(quant.NF4_CODE)
    return {"q4": packed, "absmax": absmax, "code": code}


def bytes_read(impl, k, n):
    if impl == "bf16":
        return 2 * k * n
    if impl == "int8":
        return k * n + 4 * n
    if impl == "int4":
        return k * n // 2 + 4 * n
    return k * n // 2 + (k // 64) * n * 4


def run_one(impl, fn, weights, x, m, k, n, iters=5):
    rd = bytes_read(impl, k, n)
    stacked = stack_weights(weights, rd)
    us = repeat_timer(fn, stacked, x, rd, iters=iters) * 1e6
    line = {
        "impl": impl, "m": m, "k": k, "n": n, "us": round(us, 2),
        "gbps_read": round(rd / (us * 1e-6) / 1e9, 1),
        "gbps_per_param": round(k * n / (us * 1e-6) / 1e9, 1),
    }
    print(json.dumps(line), flush=True)
    return line


# ---------------------------------------------------------------- stream SOL

def _stream_kernel(packed_ref, absmax_ref, out_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    p = packed_ref[:].astype(jnp.int32)
    out_ref[:] += (jnp.sum(p, axis=0, keepdims=True).astype(jnp.float32)
                   + absmax_ref[0:1])


@partial(jax.jit, static_argnames=("tk", "tn"))
def stream_bytes(packed, absmax, tk=512, tn=256):
    k2, n = packed.shape
    grid = (n // tn, (2 * k2) // tk)
    return pl.pallas_call(
        _stream_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tk // 2, tn), lambda i, j: (j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk // 64, tn), lambda i, j: (j, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tn), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
    )(packed, absmax)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("impls", nargs="*", default=None)
    ap.add_argument("--shapes", default="qkv,proj,fc,down")
    ap.add_argument("--m", default="1")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--tk", type=int, default=512)
    ap.add_argument("--tn", type=int, default=256)
    args = ap.parse_args()
    impls = args.impls or ["bf16", "int8", "nf4_xla", "nf4_v0", "stream"]
    shapes = [SHAPES[s] for s in args.shapes.split(",")]
    ms_list = [int(x) for x in args.m.split(",")]

    print(f"# devices: {jax.devices()}", file=sys.stderr)
    calibrate()
    key = jax.random.PRNGKey(0)

    for (k, n) in shapes:
        kq, kx, kw = jax.random.split(jax.random.fold_in(key, k * n), 3)
        p4 = make_q4(k, n, kq)
        w_bf16 = (jax.random.normal(kw, (k, n), jnp.float32) * 0.02).astype(jnp.bfloat16)
        q8 = jax.random.randint(kw, (k, n), -127, 128, jnp.int8)
        scale8 = jnp.full((n,), 2e-3, jnp.float32)
        for m in ms_list:
            x = jax.random.normal(kx, (m, k), jnp.bfloat16)
            for impl in impls:
                try:
                    if impl == "bf16":
                        f = lambda x, w: x @ w["w"]
                        weights = {"w": w_bf16}
                    elif impl == "int8":
                        f = lambda x, w: quant.int8_matmul(x, w["q8"], w["scale8"])
                        weights = {"q8": q8, "scale8": scale8}
                    elif impl == "int4":
                        # XLA-native s4 storage: does convert-in-dot fuse at
                        # full BW like int8 does?
                        q4lin = jax.random.randint(kw, (k, n), -8, 8, jnp.int8).astype(jnp.int4)
                        f = lambda x, w: (jax.lax.dot_general(
                            x, w["q"].astype(x.dtype), (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) * w["s"]).astype(x.dtype)
                        weights = {"q": q4lin, "s": scale8}
                    elif impl == "nf4_xla":
                        f = lambda x, w: jnp.einsum(
                            "mk,kn->mn", x, quant.dequantize(w, x.dtype))
                        weights = p4
                    elif impl == "nf4_v0":
                        if not quant_pallas.pallas_eligible(p4, k, n):
                            print(json.dumps({"impl": impl, "m": m, "k": k, "n": n,
                                              "skip": "ineligible"}), flush=True)
                            continue
                        f = lambda x, w: quant_pallas.quantized_matmul_pallas(x, w)
                        weights = p4
                    elif impl == "stream":
                        f = lambda x, w: stream_bytes(
                            w["q4"], w["absmax"], tk=args.tk, tn=args.tn
                        ) + x.astype(jnp.float32).sum() * 1e-30
                        weights = p4
                    elif impl in ("v12", "v12b"):
                        import tools.nf4_variants_r04 as V
                        tk = args.tk
                        f = V.get_v12(k, n, tk=tk, tn=1024, bf16=impl == "v12b")
                        weights = {
                            "pw": jax.random.randint(
                                kq, (k // tk, n // 1024, tk, 128),
                                -2**31, 2**31 - 1, jnp.int32),
                            "u": jnp.ones((k,), jnp.float32),
                            "v": jnp.full((n,), 0.02, jnp.float32),
                        }
                    elif impl == "v9t":
                        import tools.nf4_variants_r04 as V
                        tk = args.tk
                        f = V.get_v9t(k, n, tk=tk, tn=1024)
                        weights = {
                            "pw": jax.random.randint(
                                kq, (k // tk, n // 1024, tk, 128),
                                -2**31, 2**31 - 1, jnp.int32),
                            "s": jax.random.uniform(
                                kq, (k // tk, n // 1024, tk // 64, 1024),
                                jnp.float32, 0.01, 0.03),
                        }
                    elif impl in ("v8", "v9", "v10", "v11"):
                        import tools.nf4_variants_r04 as V
                        tn = args.tn if args.tn >= 1024 else 1024
                        if impl == "v8":
                            f = V.get_v8(k, n, tk=args.tk, tn=tn)
                        elif impl == "v9":
                            f = V.get_v9(k, n, tk=args.tk, tn=tn)
                        else:
                            f = V.get_v10(impl, k, n, tk=args.tk, tn=tn)
                        weights = {
                            "pw": jax.random.randint(
                                kq, (k, n // 8), 0, 2**31 - 1, jnp.int32
                            ),
                            "s": p4["absmax"],
                        }
                    elif impl.startswith("v"):
                        import tools.nf4_variants_r04 as V
                        if impl in ("v6", "v7"):
                            f = V.get_int4(impl, k, n, tk=args.tk, tn=args.tn)
                        else:
                            f = V.get(impl, k, n, tk=args.tk, tn=args.tn)
                        weights = p4
                        if f is None:
                            print(json.dumps({"impl": impl, "k": k, "n": n,
                                              "skip": "n/a"}), flush=True)
                            continue
                    else:
                        raise ValueError(impl)
                    run_one(impl, f, weights, x, m, k, n, iters=args.iters)
                except Exception as e:
                    print(json.dumps({"impl": impl, "m": m, "k": k, "n": n,
                                      "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
