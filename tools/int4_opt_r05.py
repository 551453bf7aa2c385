"""int4 decode-kernel optimization lab, round 5.

PROTOCOL FIX over the r04 lab: the tunneled runtime costs ~25 ms per
result fetch, and the r04 chained protocol divided that RTT over only 40
iterations — a ~625 us/iter floor that swamps a ~50 us kernel. Every r04
per-kernel number (and the "compute-bound at ~4 VPU ops/weight"
conclusion drawn from them) carried that artifact; the in-model effective
bandwidth (87 tok/s -> ~293 GB/s weight read) was the only honest number.
This lab times DIFFERENTIALLY: run the chained loop at two iteration
counts and take the slope — fixed dispatch+RTT cancels exactly.

Speed-of-light at m=1 per 2 MB weight block (tk=4096, 128 lanes):
  DMA  3.3 us  (609 GB/s measured tiled streaming ceiling)
  VPU  ~3 us   (3 ops/weight: shift, shift, convert; 4e12 ops/s)
  MXU  ~0.1 us
so a fully-overlapped pipeline lands at max(DMA, VPU) ~= DMA — any
measured time near DMA+VPU means the pipeline is NOT overlapping.

Variants (identical math to the shipped kernel unless noted):
  ship       shipped rank-1 kernel, packer default tk (= whole k)
  shipsem    + dimension_semantics ("parallel", "arbitrary")
  tk512/1024/2048  smaller k-tiles (finer pipeline grain)
  bf16dot    plane extract -> bf16, dot in bf16
  onedot16   all 8 planes assembled into one (tk, 1024) bf16 tile, 1 dot
  m8         x padded 1->8 sublanes explicitly
  stream     DMA-only reference: same blocks, body touches one row (the
             pipeline still copies every block -> pure streaming ceiling)

  python tools/int4_opt_r05.py [--variants ...] [--iters-hi 800] [--out f]
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


def make_timer(iters_lo, iters_hi, reps=3):
    def _time(fn, x0):
        def many(x, n):
            def body(_, x):
                y = fn(x)
                return x + (1e-30 * jnp.sum(y)).astype(x.dtype)

            return jax.lax.fori_loop(0, n, body, x)

        f = jax.jit(many)

        def run(n):
            np.asarray(f(x0, n)[0, :1])  # compile+warm this n
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                np.asarray(f(x0, n)[0, :1])
                best = min(best, time.perf_counter() - t0)
            return best

        t_lo, t_hi = run(iters_lo), run(iters_hi)
        return (t_hi - t_lo) / (iters_hi - iters_lo)

    return _time


# ---------------------------------------------------------------- variants


def _sem_kernel(nb, tk, lanes):
    def kernel(x_ref, pw_ref, out_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        x = x_ref[:].astype(jnp.float32)
        pw = pw_ref[0, 0]
        for p in range(8):
            qp = (pw << (28 - 4 * p)) >> 28
            out_ref[:, p * lanes:(p + 1) * lanes] += jnp.dot(
                x, qp.astype(jnp.float32), preferred_element_type=jnp.float32)

    return kernel


def sem_matmul(x, pw_t):
    m, k_pad = x.shape
    gk, gn, tk, _ = pw_t.shape
    n_pad = gn * INT4_TILE_N
    lanes = INT4_TILE_N // 8
    return pl.pallas_call(
        _sem_kernel(tk // 64, tk, lanes),
        grid=(gn, gk),
        in_specs=[
            pl.BlockSpec((m, tk), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tk, 128), lambda i, j: (j, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, INT4_TILE_N), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(x.astype(jnp.float32), pw_t)


def _bf16_kernel(lanes, onedot):
    def kernel(x_ref, pw_ref, out_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        x = x_ref[:]
        pw = pw_ref[0, 0]
        if onedot:
            planes = [((pw << (28 - 4 * p)) >> 28).astype(jnp.bfloat16)
                      for p in range(8)]
            w = jnp.concatenate(planes, axis=1)
            out_ref[:] += jnp.dot(x, w, preferred_element_type=jnp.float32)
        else:
            for p in range(8):
                qp = (pw << (28 - 4 * p)) >> 28
                out_ref[:, p * lanes:(p + 1) * lanes] += jnp.dot(
                    x, qp.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)

    return kernel


def bf16_matmul(x, pw_t, onedot=False):
    m, k_pad = x.shape
    gk, gn, tk, _ = pw_t.shape
    n_pad = gn * INT4_TILE_N
    lanes = INT4_TILE_N // 8
    return pl.pallas_call(
        _bf16_kernel(lanes, onedot),
        grid=(gn, gk),
        in_specs=[
            pl.BlockSpec((m, tk), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tk, 128), lambda i, j: (j, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, INT4_TILE_N), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(x.astype(jnp.bfloat16), pw_t)


def _stream_kernel(pw_ref, out_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)
    # touch one sublane of the block; the pipeline still DMAs all of it
    out_ref[:, :128] += pw_ref[0, 0][:1, :].astype(jnp.float32)


def stream_ref(pw_t):
    gk, gn, tk, _ = pw_t.shape
    n_pad = gn * INT4_TILE_N
    return pl.pallas_call(
        _stream_kernel,
        grid=(gn, gk),
        in_specs=[
            pl.BlockSpec((1, 1, tk, 128), lambda i, j: (j, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, INT4_TILE_N), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(pw_t)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants",
                    default="ship,shipsem,tk512,tk1024,tk2048,bf16dot,onedot16,m8,stream")
    ap.add_argument("--iters-lo", type=int, default=100)
    ap.add_argument("--iters-hi", type=int, default=500)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    timer = make_timer(args.iters_lo, args.iters_hi)
    variants = args.variants.split(",")
    rng = np.random.default_rng(0)
    out_f = open(args.out, "a") if args.out else None

    for k, n in SHAPES_7B:
        codes = rng.integers(-8, 8, size=(k, n), dtype=np.int64)
        packs = {}

        def pw_for(tk=None):
            if tk not in packs:
                packs[tk] = jnp.asarray(pack_int4_tiled(codes, tk))
            return packs[tk]

        for v in variants:
            try:
                pw_t = pw_for(None)
                k_pad = pw_t.shape[0] * pw_t.shape[2]
                x = jnp.asarray(rng.standard_normal((1, k_pad)), jnp.float32)
                if v == "ship":
                    fn, x0 = (lambda xx: int4_matmul_tiled(xx, pw_t)), x
                elif v == "shipsem":
                    fn, x0 = (lambda xx: sem_matmul(xx, pw_t)), x
                elif v.startswith("tk"):
                    tk = int(v[2:])
                    pw_v = pw_for(tk)
                    fn, x0 = (lambda xx: int4_matmul_tiled(xx, pw_v)), x
                elif v == "bf16dot":
                    fn, x0 = (lambda xx: bf16_matmul(xx, pw_t)), x
                elif v == "onedot16":
                    fn, x0 = (lambda xx: bf16_matmul(xx, pw_t, onedot=True)), x
                elif v == "m8":
                    x8 = jnp.tile(x, (8, 1))
                    fn, x0 = (lambda xx: int4_matmul_tiled(xx, pw_t)), x8
                elif v == "stream":
                    fn, x0 = (lambda xx: stream_ref(pw_t) + 0.0 * xx[:, :1]), x
                else:
                    continue
                dt = timer(fn, x0)
                params = k * n
                rec = {"variant": v, "k": k, "n": n,
                       "us": round(dt * 1e6, 2),
                       "g_params_s": round(params / dt / 1e9, 1),
                       "gbps_read": round(params * 0.5 / dt / 1e9, 1)}
            except Exception as e:  # noqa: BLE001
                rec = {"variant": v, "k": k, "n": n,
                       "error": f"{type(e).__name__}: {e}"[:200]}
            line = json.dumps(rec)
            print(line, flush=True)
            if out_f:
                out_f.write(line + "\n")
                out_f.flush()


if __name__ == "__main__":
    main()
