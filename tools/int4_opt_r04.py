"""int4 decode-kernel optimization lab, round 4 continuation.

The shipped tiled int4 kernel (ops/quant_pallas.py) measures 350-450 GB/s
read in-model while the pure Pallas streaming ceiling on this chip is
~609 GB/s — per-step compute (2 shifts + 1 convert + 1 dot-FMA per weight
on the VPU at m=1) exceeds the per-step DMA time, so the kernel is
COMPUTE-bound, not DMA-bound. Variants here attack ops/weight:

  base      shipped kernel (8 separate (1,tk)@(tk,128) plane dots)
  onedot    tk=1024: assemble all 8 planes into one (tk, 1024) f32 tile,
            single dot per step (fewer op launches, same ops/weight)
  m8        pad m 1->8: the dot rides the MXU, VPU does only dequant
  m8bf16    m8 + bf16 dequant target (half the convert/mult width)
  xla       unpack-in-dot in plain XLA (shift-shift-convert fused into the
            dot operand the way int8 convert-in-dot is)
  tk512/tk2048  grid-tile sweep on the shipped kernel

Each prints G params/s + effective GB/s read at decode shapes.

  python tools/int4_opt_r04.py [--variants base,onedot,m8,xla] [--shapes 7b]
"""

from __future__ import annotations

import argparse
import functools
import json
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fastmax_tpu.ops.quant_pallas import (
    INT4_TILE_N,
    int4_matmul_tiled,
    pack_int4_tiled,
)

SHAPES_7B = [(4096, 12288), (4096, 4096), (4096, 22016), (11008, 4096)]


def _time(fn, x0, iters=40):
    """Single-dispatch chained timing (the matmul_ceiling protocol).

    Two failure modes this avoids on the tunneled runtime: (a)
    block_until_ready acks EARLY (the first run of this lab measured
    1868 GB/s "read" — 2.3x physical HBM); (b) one fetch per dispatch
    costs a ~25 ms tunnel round-trip that swamps a ~30 us kernel (the
    second run measured every variant at ~900 us). So: iters kernel
    calls chained inside ONE fori_loop dispatch via an epsilon data
    dependency, fetch once."""

    def many(x, n):
        def body(_, x):
            y = fn(x)
            return x + (1e-30 * jnp.sum(y)).astype(x.dtype)

        return jax.lax.fori_loop(0, n, body, x)

    f = jax.jit(many)
    np.asarray(f(x0, 1)[0, :1])  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(f(x0, iters)[0, :1])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


# ---------------------------------------------------------------- variants


def _onedot_kernel(tk):
    def kernel(x_ref, pw_ref, out_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        x = x_ref[:].astype(jnp.float32)
        pw = pw_ref[0, 0]
        planes = [((pw << (28 - 4 * p)) >> 28).astype(jnp.float32)
                  for p in range(8)]
        w = jnp.concatenate(planes, axis=1)  # (tk, 1024)
        out_ref[:] += jnp.dot(x, w, preferred_element_type=jnp.float32)

    return kernel


@functools.partial(jax.jit, static_argnames=())
def onedot_matmul(x, pw_t):
    m, k_pad = x.shape
    gk, gn, tk, _ = pw_t.shape
    n_pad = gn * INT4_TILE_N
    return pl.pallas_call(
        _onedot_kernel(tk),
        grid=(gn, gk),
        in_specs=[
            pl.BlockSpec((m, tk), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tk, 128), lambda i, j: (j, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, INT4_TILE_N), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n_pad), jnp.float32),
    )(x.astype(jnp.float32), pw_t)
    # NOTE: onedot output column order is (plane-major) — same permutation
    # as the packed layout, so throughput comparison is exact; a shipping
    # version would pre-permute v4 to match.


def _m8_kernel(tk, out_dtype):
    def kernel(x_ref, pw_ref, out_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        x = x_ref[:]  # (8, tk) bf16/f32
        pw = pw_ref[0, 0]
        lanes = 128
        for p in range(8):
            w = ((pw << (28 - 4 * p)) >> 28).astype(out_dtype)
            out_ref[:, p * lanes:(p + 1) * lanes] += jnp.dot(
                x, w, preferred_element_type=jnp.float32)

    return kernel


def m8_matmul(x, pw_t, dtype=jnp.float32):
    m, k_pad = x.shape
    assert m == 8
    gk, gn, tk, _ = pw_t.shape
    n_pad = gn * INT4_TILE_N
    return pl.pallas_call(
        _m8_kernel(tk, dtype),
        grid=(gn, gk),
        in_specs=[
            pl.BlockSpec((m, tk), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tk, 128), lambda i, j: (j, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, INT4_TILE_N), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n_pad), jnp.float32),
        interpret=False,
    )(x.astype(dtype), pw_t)


m8_matmul_jit = jax.jit(m8_matmul, static_argnames=("dtype",))


def xla_unpack_matmul(x, w32):
    """w32 (k//8, n) int32, 8 nibbles packed ALONG K. XLA fuses the
    shift-shift-convert chain into the dot operand like int8
    convert-in-dot (that path measures ~707 GB/s)."""
    k8, n = w32.shape
    planes = [((w32 << (28 - 4 * p)) >> 28) for p in range(8)]
    w = jnp.stack(planes, axis=1).reshape(k8 * 8, n).astype(jnp.bfloat16)
    return jnp.dot(x.astype(jnp.bfloat16), w, preferred_element_type=jnp.float32)


xla_unpack_jit = jax.jit(xla_unpack_matmul)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants",
                    default="base,tk512,tk1024,tk2048,onedot,m8,m8bf16,xla")
    ap.add_argument("--m", type=int, default=1)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    for k, n in SHAPES_7B:
        codes = rng.integers(-8, 8, size=(k, n)).astype(np.int8)
        x1 = jnp.asarray(rng.standard_normal((args.m, k)), jnp.float32)
        k_pad = k + (-k) % 512
        x1p = jnp.pad(x1, ((0, 0), (0, k_pad - k)))
        x8 = jnp.concatenate([x1p] + [jnp.zeros_like(x1p)] * 7, axis=0)
        nbytes = k * n // 2

        for variant in args.variants.split(","):
            try:
                x0 = x1p
                if variant == "base":
                    pw = jnp.asarray(pack_int4_tiled(codes))
                    fn = lambda x, pw=pw: int4_matmul_tiled(x, pw)
                elif variant.startswith("tk"):
                    tk = int(variant[2:])
                    if k_pad % tk:
                        raise ValueError(f"k_pad {k_pad} % {tk}")
                    pw = jnp.asarray(pack_int4_tiled(codes, tile_k=tk))
                    fn = lambda x, pw=pw: int4_matmul_tiled(x, pw)
                elif variant == "onedot":
                    pw = jnp.asarray(pack_int4_tiled(codes, tile_k=1024))
                    fn = lambda x, pw=pw: onedot_matmul(x, pw)
                elif variant == "m8":
                    pw = jnp.asarray(pack_int4_tiled(codes))
                    fn = lambda x, pw=pw: m8_matmul(x, pw, dtype=jnp.float32)
                    x0 = x8
                elif variant == "m8bf16":
                    pw = jnp.asarray(pack_int4_tiled(codes))
                    fn = lambda x, pw=pw: m8_matmul(x, pw, dtype=jnp.bfloat16)
                    x0 = x8
                elif variant == "xla":
                    k8 = k_pad // 8
                    full = np.zeros((k_pad, n), np.int32)
                    full[:k] = codes
                    q = (full & 0xF).astype(np.uint32).reshape(k8, 8, n)
                    words = np.zeros((k8, n), np.uint32)
                    for p in range(8):
                        words |= q[:, p, :] << (4 * p)
                    w32 = jnp.asarray(words.view(np.int32))
                    fn = lambda x, w32=w32: xla_unpack_matmul(x, w32)
                else:
                    continue
                dt = _time(fn, x0)
                print(json.dumps({
                    "variant": variant, "k": k, "n": n,
                    "us": round(dt * 1e6, 2),
                    "g_params_s": round(k * n / dt / 1e9, 1),
                    "gbps_read": round(nbytes / dt / 1e9, 1),
                }), flush=True)
            except Exception as e:
                print(json.dumps({
                    "variant": variant, "k": k, "n": n,
                    "error": f"{type(e).__name__}: {e}"[:200],
                }), flush=True)


if __name__ == "__main__":
    main()
