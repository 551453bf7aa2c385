"""Compile-and-compare every Pallas kernel on the REAL TPU chip.

Round-1 verdict: the Pallas kernels were validated only in interpret mode
on CPU. This drive compiles each one with Mosaic on the attached chip,
asserts numerical parity against the XLA formulation of the same math, and
times both — the numbers that decide each kernel's autotune default.

Run directly (plain `python` lands on the axon TPU):

    python tools/tpu_kernel_check.py

Exit code 0 = all kernels compiled and matched. Results are recorded in
docs/perf.md and gated into tests/test_tpu_kernels.py (subprocess wrapper,
skipped off-TPU).
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

FAILED = []


def check(name: str, got, want, atol, rtol=1e-3):
    got = np.asarray(got)
    want = np.asarray(want)
    err = np.max(np.abs(got - want) / (np.abs(want) + atol))
    ok = np.allclose(got, want, atol=atol, rtol=rtol)
    print(f"  parity {name}: max_rel_err={err:.2e} -> {'OK' if ok else 'FAIL'}")
    if not ok:
        FAILED.append(name)


def timeit(name: str, fn, *args, iters=8):
    out = jax.block_until_ready(fn(*args))  # compile
    # tunneled runtimes ack block_until_ready early: fetch a slice to sync
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf).ravel()[:8]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    jax.block_until_ready(out)
    np.asarray(leaf).ravel()[:8]
    dt = (time.perf_counter() - t0) / iters
    print(f"  time   {name}: {dt*1e3:.2f} ms/iter")
    return dt, out


def main():
    dev = jax.devices()[0]
    print(f"platform={dev.platform} device={dev}")
    if dev.platform not in ("tpu", "axon"):
        print("not a TPU — aborting")
        return 2

    key = jax.random.PRNGKey(0)

    # ---------------- flash attention forward (inference prefill) ----------
    print("[flash_attention fwd]")
    from fastmax_tpu.ops.flash_attention import (
        flash_attention, flash_attention_trainable)
    from fastmax_tpu.ops.attention import scaled_dot_product_attention

    b, h, t, d = 2, 8, 2048, 64
    q = jax.random.normal(key, (b, h, t, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, h, t, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, h, t, d), jnp.bfloat16)

    ref = scaled_dot_product_attention(q, k, v, is_causal=True)
    t_fl, out = timeit("flash fwd 2x8x2048x64", lambda: flash_attention(q, k, v))
    check("flash fwd", out.astype(jnp.float32), ref.astype(jnp.float32), atol=2e-2)
    t_xla, _ = timeit("xla sdpa same shape",
                      lambda: scaled_dot_product_attention(q, k, v, is_causal=True))

    # ---------------- flash attention trainable (fused bwd) ----------------
    print("[flash_attention_trainable fwd+bwd]")
    from fastmax_tpu.ops.blockwise_attention import blockwise_attention

    tg = jax.random.normal(jax.random.fold_in(key, 3), (b, h, t, d), jnp.bfloat16)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention_trainable(q, k, v).astype(jnp.float32)
                       * tg.astype(jnp.float32))

    def loss_block(q, k, v):
        return jnp.sum(blockwise_attention(q, k, v, None, 512).astype(jnp.float32)
                       * tg.astype(jnp.float32))

    gflash = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))
    gblock = jax.jit(jax.grad(loss_block, argnums=(0, 1, 2)))
    t_gf, gf = timeit("flash fwd+bwd", gflash, q, k, v, iters=4)
    t_gb, gb = timeit("blockwise fwd+bwd", gblock, q, k, v, iters=4)
    for name, a, bb in zip(("dq", "dk", "dv"), gf, gb):
        check(f"flash bwd {name}", a.astype(jnp.float32), bb.astype(jnp.float32),
              atol=5e-2, rtol=5e-2)

    # ---------------- fastmax pallas trainable -----------------------------
    print("[fastmax_pallas_trainable fwd+bwd, p=2]")
    from fastmax_tpu.ops.fastmax import fastmax
    from fastmax_tpu.ops.fastmax_pallas import fastmax_pallas_trainable

    b2, h2, n2, d2 = 2, 4, 1024, 64
    q2 = jax.random.normal(jax.random.fold_in(key, 4), (b2, h2, n2, d2), jnp.float32)
    k2 = jax.random.normal(jax.random.fold_in(key, 5), (b2, h2, n2, d2), jnp.float32)
    v2 = jax.random.normal(jax.random.fold_in(key, 6), (b2, h2, n2, d2), jnp.float32)
    g2 = jax.random.normal(jax.random.fold_in(key, 7), (b2, h2, n2, d2), jnp.float32)

    def loss_pal(q, k, v):
        return jnp.vdot(fastmax_pallas_trainable(q, k, v, 2, 8.0, 128, False), g2)

    def loss_scan(q, k, v):
        return jnp.vdot(fastmax(q, k, v, mask=True, p=2, head_group=1), g2)

    ref2 = fastmax(q2, k2, v2, mask=True, p=2, head_group=1)
    t_pf, out2 = timeit("fastmax pallas fwd",
                        jax.jit(lambda q, k, v: fastmax_pallas_trainable(
                            q, k, v, 2, 8.0, 128, False)), q2, k2, v2, iters=4)
    check("fastmax pallas fwd", out2, ref2, atol=2e-3)
    gpal = jax.jit(jax.grad(loss_pal, argnums=(0, 1, 2)))
    gscan = jax.jit(jax.grad(loss_scan, argnums=(0, 1, 2)))
    t_pg, gp = timeit("fastmax pallas fwd+bwd", gpal, q2, k2, v2, iters=4)
    t_sg, gs = timeit("fastmax scan fwd+bwd", gscan, q2, k2, v2, iters=4)
    for name, a, bb in zip(("dq", "dk", "dv"), gp, gs):
        check(f"fastmax bwd {name}", a, bb, atol=1e-2, rtol=1e-2)

    # ---------------- fused NF4 matmul -------------------------------------
    print("[quantized_matmul_pallas]")
    from fastmax_tpu.ops import quant

    w = jax.random.normal(jax.random.fold_in(key, 8), (2048, 2048), jnp.float32) * 0.02
    p4 = quant.quantize_4bit(np.asarray(w), "nf4")
    x = jax.random.normal(jax.random.fold_in(key, 9), (8, 2048), jnp.bfloat16)
    from fastmax_tpu.ops.quant_pallas import quantized_matmul_pallas

    y_ref = quant.quantized_matmul(x, p4)
    t_qp, y = timeit("nf4 pallas matmul 8x2048x2048",
                     jax.jit(lambda x: quantized_matmul_pallas(x, p4)), x, iters=8)
    t_qx, _ = timeit("nf4 xla matmul same",
                     jax.jit(lambda x: quant.quantized_matmul(x, p4)), x, iters=8)
    check("nf4 matmul", y.astype(jnp.float32), y_ref.astype(jnp.float32),
          atol=5e-2, rtol=5e-2)

    print()
    if FAILED:
        print(f"FAILED: {FAILED}")
        return 1
    print("ALL KERNELS COMPILED AND MATCHED ON", dev)
    return 0


if __name__ == "__main__":
    sys.exit(main())
