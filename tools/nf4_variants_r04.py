"""Candidate NF4 fused dequant+matmul kernels for the round-4 lab.

Each variant is get(name, k, n, tk, tn) -> f(x, w) where w is the quantized
param dict {"q4","absmax","code"}. All compute y = x @ dequant(w) exactly
(f32 codebook) unless the name says bf16.

Variants:
  v1  flexible tiles + reshape-broadcast scale (instead of jnp.repeat)
  v2  v1 + binary-tree select (15 selects vs 32 where-chains)
  v3  v1 + per-block partial-sum scaling: dot the UNSCALED code values,
      multiply each 64-row block's partial sum by absmax -- removes the
      per-weight scale multiply entirely
  v4  v3 + tree select (the minimal-VPU-work exact kernel)
  v5  v4 with bf16 select operands + bf16 dot (2x VPU packing)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tree_select(codes, code_vals, dtype=jnp.float32):
    """15-select binary tree lookup: codes int32 in [0,16) -> code_vals[c].

    Level l selects on bit l between pairs of partial tables. All constants
    fold into the kernel.
    """
    b0 = (codes & 1) != 0
    b1 = (codes & 2) != 0
    b2 = (codes & 4) != 0
    b3 = (codes & 8) != 0
    vals = [jnp.full(codes.shape, float(code_vals[i]), dtype) for i in range(16)]
    l1 = [jnp.where(b0, vals[2 * i + 1], vals[2 * i]) for i in range(8)]
    l2 = [jnp.where(b1, l1[2 * i + 1], l1[2 * i]) for i in range(4)]
    l3 = [jnp.where(b2, l2[2 * i + 1], l2[2 * i]) for i in range(2)]
    return jnp.where(b3, l3[1], l3[0])


def _chain_select(codes, code_vals, dtype=jnp.float32):
    out = jnp.zeros(codes.shape, dtype)
    for c in range(16):
        out = jnp.where(codes == c, jnp.asarray(code_vals[c], dtype), out)
    return out


def _make_kernel(variant, nb, tk, tn, code_vals):
    """nb = quant blocks per k-tile (tk/64)."""

    plane = tk // 2  # rows per nibble plane
    rows_per_block = 64 // 2  # plane rows per quant block

    def kernel(xe_ref, xo_ref, packed_ref, absmax_ref, out_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        packed = packed_ref[:].astype(jnp.int32)
        hi = packed >> 4
        lo = packed & 0xF

        if variant in ("v1",):
            w_hi = _chain_select(hi, code_vals)
            w_lo = _chain_select(lo, code_vals)
        elif variant in ("v2",):
            w_hi = _tree_select(hi, code_vals)
            w_lo = _tree_select(lo, code_vals)
        elif variant in ("v3",):
            w_hi = _chain_select(hi, code_vals)
            w_lo = _chain_select(lo, code_vals)
        elif variant in ("v4",):
            w_hi = _tree_select(hi, code_vals)
            w_lo = _tree_select(lo, code_vals)
        elif variant == "v5":
            w_hi = _tree_select(hi, code_vals, jnp.bfloat16)
            w_lo = _tree_select(lo, code_vals, jnp.bfloat16)

        absmax = absmax_ref[:]  # (nb, tn)

        if variant in ("v1", "v2"):
            # scale weights via reshape-broadcast, one fused multiply
            scale = jnp.broadcast_to(
                absmax[:, None, :], (nb, rows_per_block, absmax.shape[1])
            ).reshape(plane, -1)
            w_hi = w_hi * scale
            w_lo = w_lo * scale
            acc = jnp.dot(xe_ref[:], w_hi, preferred_element_type=jnp.float32)
            acc += jnp.dot(xo_ref[:], w_lo, preferred_element_type=jnp.float32)
            out_ref[:] += acc
        else:
            # per-block partial sums, scale applied to the (m, tn) partials
            acc = jnp.zeros_like(out_ref)
            for b in range(nb):
                sl = slice(b * rows_per_block, (b + 1) * rows_per_block)
                xd = jnp.bfloat16 if variant == "v5" else jnp.float32
                pb = jnp.dot(xe_ref[:, sl].astype(xd), w_hi[sl],
                             preferred_element_type=jnp.float32)
                pb += jnp.dot(xo_ref[:, sl].astype(xd), w_lo[sl],
                              preferred_element_type=jnp.float32)
                acc += pb * absmax[b][None, :]
            out_ref[:] += acc

    return kernel


@partial(jax.jit, static_argnames=("variant", "tk", "tn", "code_vals"))
def _run(variant, x, packed, absmax, code_vals, tk, tn):
    m, k = x.shape
    n = packed.shape[1]
    assert k % tk == 0 and n % tn == 0, (k, n, tk, tn)
    xf = x.astype(jnp.float32)
    x_even = xf[:, 0::2]
    x_odd = xf[:, 1::2]
    nb = tk // 64
    kernel = _make_kernel(variant, nb, tk, tn, code_vals)
    grid = (n // tn, k // tk)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, tk // 2), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, tk // 2), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk // 2, tn), lambda i, j: (j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, tn), lambda i, j: (j, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, tn), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
    )(x_even, x_odd, packed, absmax)


def get(name, k, n, tk=512, tn=256):
    import numpy as np

    if tk > k:
        tk = k
    while k % tk:
        tk //= 2
    while n % tn:
        tn //= 2
    from fastmax_tpu.ops.quant import NF4_CODE

    code_vals = tuple(float(v) for v in np.asarray(NF4_CODE))

    def f(x, w):
        return _run(name, x, w["q4"], w["absmax"], code_vals, tk, tn)

    return f


# ---------------------------------------------------------------- int4 linear

def _make_int4_kernel(variant, nb, tk, tn):
    plane = tk // 2
    rows_per_block = 32

    def kernel(xe_ref, xo_ref, packed_ref, absmax_ref, out_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        pi = packed_ref[:].astype(jnp.int32)
        hi = ((pi >> 4) - 8).astype(jnp.bfloat16)
        lo = ((pi & 0xF) - 8).astype(jnp.bfloat16)
        absmax = absmax_ref[:] * 0.125  # levels are (c-8)/8

        if variant == "v6":  # scale weights, one full-depth dot pair
            scale = jnp.broadcast_to(
                absmax[:, None, :], (nb, rows_per_block, absmax.shape[1])
            ).reshape(plane, -1)
            w_hi = hi.astype(jnp.float32) * scale
            w_lo = lo.astype(jnp.float32) * scale
            acc = jnp.dot(xe_ref[:].astype(jnp.float32), w_hi,
                          preferred_element_type=jnp.float32)
            acc += jnp.dot(xo_ref[:].astype(jnp.float32), w_lo,
                           preferred_element_type=jnp.float32)
            out_ref[:] += acc
        else:  # v7: per-block partial sums in bf16, scale on partials
            acc = jnp.zeros_like(out_ref)
            for b in range(nb):
                sl = slice(b * rows_per_block, (b + 1) * rows_per_block)
                pb = jnp.dot(xe_ref[:, sl], hi[sl], preferred_element_type=jnp.float32)
                pb += jnp.dot(xo_ref[:, sl], lo[sl], preferred_element_type=jnp.float32)
                acc += pb * absmax[b][None, :]
            out_ref[:] += acc

    return kernel


@partial(jax.jit, static_argnames=("variant", "tk", "tn"))
def _run_int4(variant, x, packed, absmax, tk, tn):
    m, k = x.shape
    n = packed.shape[1]
    assert k % tk == 0 and n % tn == 0, (k, n, tk, tn)
    xb = x.astype(jnp.bfloat16)
    x_even = xb[:, 0::2]
    x_odd = xb[:, 1::2]
    nb = tk // 64
    kernel = _make_int4_kernel(variant, nb, tk, tn)
    grid = (n // tn, k // tk)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, tk // 2), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, tk // 2), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk // 2, tn), lambda i, j: (j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, tn), lambda i, j: (j, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, tn), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
    )(x_even, x_odd, packed, absmax)


def get_int4(name, k, n, tk=2048, tn=512):
    if tk > k:
        tk = k
    while k % tk:
        tk //= 2
    while n % tn:
        tn //= 2

    def f(x, w):
        return _run_int4(name, x, w["q4"], w["absmax"], tk, tn)

    return f


# ------------------------------------------------- v8: u32 column-nibble pack

def pack_v8(q_codes, absmax, tn=1024):
    """Pack int4 codes (k, n) uint8 in [0,16) into u32 words along N.

    Within each tn-column tile, word lane l (of 128) at k-row r packs the 8
    codes of real columns {tile_base + p*128 + l : p in 0..7} in nibble p.
    absmax (k/64, n) is column-permuted identically.
    """
    import numpy as np

    k, n = q_codes.shape
    assert n % tn == 0 and tn % 128 == 0
    ntile = n // tn
    q = q_codes.astype(np.uint32).reshape(k, ntile, 8, 128)  # [k, t, p, l]
    words = np.zeros((k, ntile, 128), np.uint32)
    for p in range(8):
        words |= q[:, :, p, :] << (4 * p)
    pw = words.reshape(k, ntile * 128).view(np.int32)
    am = absmax.reshape(absmax.shape[0], ntile, 8, 128).reshape(absmax.shape[0], n)
    return pw, am


def _v8_kernel(nb, tk, tn):
    def kernel(x_ref, pw_ref, s_ref, out_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        x = x_ref[:].astype(jnp.float32)          # (m, tk)
        pw = pw_ref[:]                             # (tk, 128) int32
        for p in range(8):
            qp = ((pw >> (4 * p)) & 0xF) - 8       # (tk, 128) in [-8, 7]
            sp = s_ref[:, p * 128:(p + 1) * 128]   # (nb, 128)
            scale = jnp.broadcast_to(
                sp[:, None, :] * 0.125, (nb, 64, 128)).reshape(tk, 128)
            w = qp.astype(jnp.float32) * scale
            out_ref[:, p * 128:(p + 1) * 128] += jnp.dot(
                x, w, preferred_element_type=jnp.float32)

    return kernel


@partial(jax.jit, static_argnames=("tk", "tn"))
def _run_v8(x, pw, s_perm, tk, tn):
    m, k = x.shape
    n = pw.shape[1] * 8
    assert k % tk == 0 and n % tn == 0
    nb = tk // 64
    grid = (n // tn, k // tk)
    lanes = tn // 8
    return pl.pallas_call(
        _v8_kernel(nb, tk, tn),
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, tk), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, lanes), lambda i, j: (j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, tn), lambda i, j: (j, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, tn), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
    )(x, pw, s_perm)


def get_v8(k, n, tk=2048, tn=1024):
    if tk > k:
        tk = k
    while k % tk:
        tk //= 2

    def f(x, w):
        return _run_v8(x, w["pw"], w["s"], tk, tn)

    return f


# ------------------------------------------- v9: signed-nibble 2-shift unpack

def pack_v9(q_codes, absmax, tn=1024):
    """Like pack_v8 but nibbles stored as two's-complement (q-8), so the
    kernel extracts signed values with left-shift + arithmetic-right-shift
    (no mask, no subtract)."""
    import numpy as np

    signed = (q_codes.astype(np.int32) - 8) & 0xF
    return pack_v8(signed.astype(np.uint8), absmax, tn)


def _v9_kernel(nb, tk, tn):
    def kernel(x_ref, pw_ref, s_ref, out_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        x = x_ref[:].astype(jnp.float32)
        pw = pw_ref[:]
        for p in range(8):
            qp = (pw << (28 - 4 * p)) >> 28        # signed nibble in [-8, 7]
            sp = s_ref[:, p * 128:(p + 1) * 128]
            scale = jnp.broadcast_to(
                sp[:, None, :] * 0.125, (nb, 64, 128)).reshape(tk, 128)
            w = qp.astype(jnp.float32) * scale
            out_ref[:, p * 128:(p + 1) * 128] += jnp.dot(
                x, w, preferred_element_type=jnp.float32)

    return kernel


@partial(jax.jit, static_argnames=("tk", "tn"))
def _run_v9(x, pw, s_perm, tk, tn):
    m, k = x.shape
    n = pw.shape[1] * 8
    assert k % tk == 0 and n % tn == 0
    nb = tk // 64
    grid = (n // tn, k // tk)
    return pl.pallas_call(
        _v9_kernel(nb, tk, tn),
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, tk), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, tn // 8), lambda i, j: (j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, tn), lambda i, j: (j, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, tn), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
    )(x, pw, s_perm)


def get_v9(k, n, tk=2048, tn=1024):
    if tk > k:
        tk = k
    while k % tk:
        tk //= 2

    def f(x, w):
        return _run_v9(x, w["pw"], w["s"], tk, tn)

    return f


# --------------------------------- v10/v11: shaving the per-weight VPU work

def _v10_kernel(nb, tk, tn):
    lanes = tn // 8

    def kernel(x_ref, pw_ref, s_ref, out_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        x = x_ref[:].astype(jnp.bfloat16)
        pw = pw_ref[:]
        for p in range(8):
            qp = (pw << (28 - 4 * p)) >> 28
            sp = s_ref[:, p * lanes:(p + 1) * lanes] * 0.125
            scale = jnp.broadcast_to(
                sp[:, None, :].astype(jnp.bfloat16), (nb, 64, lanes)
            ).reshape(tk, lanes)
            w = qp.astype(jnp.bfloat16) * scale
            out_ref[:, p * lanes:(p + 1) * lanes] += jnp.dot(
                x, w, preferred_element_type=jnp.float32)

    return kernel


def _v11_kernel(nb, tk, tn):
    lanes = tn // 8

    def kernel(x_ref, pw_ref, s_ref, out_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        x = x_ref[:].astype(jnp.bfloat16)
        pw = pw_ref[:]
        for p in range(8):
            qp = ((pw << (28 - 4 * p)) >> 28).astype(jnp.bfloat16)
            sp = s_ref[:, p * lanes:(p + 1) * lanes] * 0.125  # (nb, lanes) f32
            acc = jnp.zeros((x.shape[0], lanes), jnp.float32)
            for b in range(nb):
                pb = jnp.dot(x[:, b * 64:(b + 1) * 64], qp[b * 64:(b + 1) * 64],
                             preferred_element_type=jnp.float32)
                acc += pb * sp[b][None, :]
            out_ref[:, p * lanes:(p + 1) * lanes] += acc

    return kernel


@partial(jax.jit, static_argnames=("variant", "tk", "tn"))
def _run_v10(variant, x, pw, s_perm, tk, tn):
    m, k = x.shape
    n = pw.shape[1] * 8
    assert k % tk == 0 and n % tn == 0
    nb = tk // 64
    kern = _v10_kernel(nb, tk, tn) if variant == "v10" else _v11_kernel(nb, tk, tn)
    grid = (n // tn, k // tk)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, tk), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, tn // 8), lambda i, j: (j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, tn), lambda i, j: (j, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, tn), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
    )(x, pw, s_perm)


def get_v10(variant, k, n, tk=2048, tn=1024):
    if tk > k:
        tk = k
    while k % tk:
        tk //= 2

    def f(x, w):
        return _run_v10(variant, x, w["pw"], w["s"], tk, tn)

    return f


# --------------------------------------------- v9t: v9 on tiled-block layout

def pack_v9t(q_codes, absmax, tk=2048, tn=1024):
    """pack_v9 + reorder into per-grid-step contiguous blocks:
    pw_t (k/tk, n/tn, tk, tn//8) int32, s_t (k/tk, n/tn, tk//64, tn) f32."""
    import numpy as np

    pw, s = pack_v9(q_codes, absmax, tn)
    k = pw.shape[0]
    n = pw.shape[1] * 8
    gk, gn = k // tk, n // tn
    pw_t = pw.reshape(gk, tk, gn, tn // 8).transpose(0, 2, 1, 3).copy()
    nb = tk // 64
    s_t = s.reshape(gk, nb, gn, tn).transpose(0, 2, 1, 3).copy()
    return pw_t, s_t


def _v9t_kernel(nb, tk, tn):
    lanes = tn // 8

    def kernel(x_ref, pw_ref, s_ref, out_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        x = x_ref[:].astype(jnp.float32)
        pw = pw_ref[0, 0]
        s = s_ref[0, 0]
        for p in range(8):
            qp = (pw << (28 - 4 * p)) >> 28
            sp = s[:, p * lanes:(p + 1) * lanes]
            scale = jnp.broadcast_to(
                sp[:, None, :] * 0.125, (nb, 64, lanes)).reshape(tk, lanes)
            w = qp.astype(jnp.float32) * scale
            out_ref[:, p * lanes:(p + 1) * lanes] += jnp.dot(
                x, w, preferred_element_type=jnp.float32)

    return kernel


@partial(jax.jit, static_argnames=("tk", "tn"))
def _run_v9t(x, pw_t, s_t, tk, tn):
    m, k = x.shape
    gk, gn = pw_t.shape[0], pw_t.shape[1]
    n = gn * tn
    nb = tk // 64
    grid = (gn, gk)
    return pl.pallas_call(
        _v9t_kernel(nb, tk, tn),
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, tk), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tk, tn // 8), lambda i, j: (j, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nb, tn), lambda i, j: (j, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, tn), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
    )(x, pw_t, s_t)


def get_v9t(k, n, tk=2048, tn=1024):
    if tk > k:
        tk = k
    while k % tk:
        tk //= 2

    def f(x, w):
        return _run_v9t(x, w["pw"], w["s"], tk, tn)

    return f


# ----------------------------- v12: rank-1 scale, 3-op/weight tiled kernel

def _v12_kernel(tk, tn, wdtype=jnp.float32):
    lanes = tn // 8

    def kernel(x_ref, pw_ref, out_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        x = x_ref[:].astype(wdtype)
        pw = pw_ref[0, 0]
        for p in range(8):
            qp = (pw << (28 - 4 * p)) >> 28
            out_ref[:, p * lanes:(p + 1) * lanes] += jnp.dot(
                x, qp.astype(wdtype), preferred_element_type=jnp.float32)

    return kernel


@partial(jax.jit, static_argnames=("tk", "tn", "bf16"))
def _run_v12(x, pw_t, u, v, tk, tn, bf16=False):
    """y = ((x * u_rows) @ Q) * v_cols / 8, Q = signed nibbles."""
    m, k = x.shape
    gk, gn = pw_t.shape[0], pw_t.shape[1]
    n = gn * tn
    xs = x.astype(jnp.float32) * u[None, :]
    grid = (gn, gk)
    y = pl.pallas_call(
        _v12_kernel(tk, tn, jnp.bfloat16 if bf16 else jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, tk), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tk, tn // 8), lambda i, j: (j, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, tn), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
    )(xs, pw_t)
    return y * (v[None, :] * 0.125)


def get_v12(k, n, tk=2048, tn=1024, bf16=False):
    if tk > k:
        tk = k
    while k % tk:
        tk //= 2

    def f(x, w):
        return _run_v12(x, w["pw"], w["u"], w["v"], tk, tn, bf16)

    return f


def rank1_envelope(absmax, iters=8):
    """Minimal-ish rank-1 envelope u (x) v >= absmax (per k-block x column)."""
    import numpy as np

    nb, n = absmax.shape
    u = np.maximum(absmax.max(axis=1), 1e-12)
    for _ in range(iters):
        v = np.max(absmax / u[:, None], axis=0)
        u = np.max(absmax / v[None, :], axis=1)
    return u.astype(np.float32), v.astype(np.float32)
