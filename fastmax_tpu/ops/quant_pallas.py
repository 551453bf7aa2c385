"""Pallas TPU kernels: fused 4-bit dequant + matmul (decode hot path).

The performance heart of the framework (BASELINE.json: "every dequant+matmul
kernel at speed-of-light per chip"; reference role: bitsandbytes' CUDA
dequant kernels fused into decode matmuls, generate/base.py:129-134).

Decode is weight-bandwidth-bound, so the figure of merit is
**dense-params-served per second** = k*n / wall-time. Measured on v5e with
the r05 differential-timing protocol (tools/int4_opt_r05.py — the r04
figures divided a ~25 ms tunnel RTT over 40 iterations and understated
every kernel; bench_results/int4_opt_r05b.jsonl is the honest record):

  bf16 dense (XLA)              ~365 G params/s   (2 B/param @ ~730 GB/s)
  int8 fused (XLA)              ~710 G params/s   (1 B/param, convert-in-dot)
  exact NF4 (this file)         ~150 G params/s   (VPU select-bound, below)
  int4 rank-1  (this file)   1100-1460 G params/s (0.50 B/param, 550-730
                                GB/s read at 7B shapes) <- fastest

Speed-of-light analysis (v5e: ~819 GB/s HBM, VPU ~4e12 elementwise ops/s):
at B bytes/param and V VPU-ops/weight the kernel serves min(BW/B, VPU/V)
params/s. The rank-1 kernel (3 VPU ops/weight: two shifts + convert,
pipelined against the DMA) runs at 67-89% of physical HBM bandwidth — at
kernel scope it is essentially AT the streaming ceiling; remaining decode
headroom is in the step around it (see decode_profile_r05*.jsonl). An
exact NF4 codebook lookup costs ~15 selects + ~8 bit-mask/compare +
extraction ops per weight (binary tree over 16 arbitrary float values),
capping it at ~170-190 G params/s no matter how it is tiled — the TPU VPU
has no per-element table-gather at rate, unlike the CUDA LOP3-based
dequant the reference leans on. (The r04 header's "~260" ceiling counted
only the selects.) The fast TPU-native representations therefore make
dequant LINEAR:

  * int4 blockwise:  w = (q-8)/8 * absmax[k-block, n]  (5 VPU ops/weight)
  * int4 rank-1:     w = (q-8)/8 * u[k] * v[n]         (3 VPU ops/weight)
    u rides on the activation (x*u before the kernel), v on the output,
    so the kernel body is shift-shift-convert-dot only.

Both store signed two's-complement nibbles packed 8-per-int32 **along the
output axis** (column c = tile*1024 + nibble*128 + lane), so unpacking is
pure 32-bit lane arithmetic — no sub-word relayout (the uint8 high/low-
nibble layout of the exact kernel costs a sublane widening that alone
halves throughput). Blocks are pre-tiled into per-grid-step contiguous
regions: flat layouts cap Pallas DMA at ~445 GB/s, tiled reaches ~609.

The exact NF4/FP4 kernel below is kept for bit-faithful serving of 4-bit
checkpoints (no re-quantization); ops/quant.py's serving re-representation
helpers (requantize_int8_model / requantize_int4_model) produce the fast
formats, with accuracy deltas measured in docs/accuracy.md.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .quant import DEFAULT_BLOCK

# ----------------------------------------------------------- exact 4-bit path

# tile sizes: K must cover whole quant blocks (64 rows -> 32 packed rows)
TILE_K = 512  # input rows per step (256 packed rows, 8 quant blocks)
TILE_N = 256  # output cols per step


def _tree_select(codes: jnp.ndarray, code: jnp.ndarray) -> jnp.ndarray:
    """Binary-tree 16-way lookup: 15 selects + 4 bit tests (the minimal
    exact form; a flat 16-way where-chain costs ~2x)."""
    b0 = (codes & 1) != 0
    b1 = (codes & 2) != 0
    b2 = (codes & 4) != 0
    b3 = (codes & 8) != 0
    shape = codes.shape
    vals = [jnp.broadcast_to(code[i], shape) for i in range(16)]
    l1 = [jnp.where(b0, vals[2 * i + 1], vals[2 * i]) for i in range(8)]
    l2 = [jnp.where(b1, l1[2 * i + 1], l1[2 * i]) for i in range(4)]
    l3 = [jnp.where(b2, l2[2 * i + 1], l2[2 * i]) for i in range(2)]
    return jnp.where(b3, l3[1], l3[0])


def _nf4_matmul_kernel(code_ref, xe_ref, xo_ref, packed_ref, absmax_ref, out_ref):
    j = pl.program_id(1)  # k-tile index (minor): accumulate over it

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # upcast before bit ops: Mosaic has no sub-word shift for uint8
    packed = packed_ref[:].astype(jnp.int32)  # (TILE_K//2, TILE_N)
    code = code_ref[0]  # (16,)
    w_hi = _tree_select(packed >> 4, code)  # rows 0,2,4,... of the tile
    w_lo = _tree_select(packed & 0xF, code)  # rows 1,3,5,...

    # per-quant-block partial sums: dot the UNSCALED code values, then
    # scale each 64-row block's (m, TILE_N) partial by its absmax — the
    # scale costs O(m*TILE_N) per block instead of one multiply per weight
    absmax = absmax_ref[:]  # (TILE_K//64, TILE_N)
    nb = absmax.shape[0]
    rows = (TILE_K // 2) // nb  # plane rows per quant block
    acc = jnp.zeros_like(out_ref)
    for b in range(nb):
        sl = slice(b * rows, (b + 1) * rows)
        pb = jnp.dot(xe_ref[:, sl], w_hi[sl], preferred_element_type=jnp.float32)
        pb += jnp.dot(xo_ref[:, sl], w_lo[sl], preferred_element_type=jnp.float32)
        acc += pb * absmax[b][None, :]
    out_ref[:] += acc


@partial(jax.jit, static_argnames=("interpret",))
def nf4_matmul(x: jnp.ndarray, packed: jnp.ndarray, absmax: jnp.ndarray,
               code: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """x (M, K) @ 4bit-packed (K/2, N) with (K/64, N) absmax -> (M, N) f32.

    Bit-faithful to the NF4/FP4 codebook (exact dequant values feed the
    dot). Requires K % TILE_K == 0 and N % TILE_N == 0 (the caller falls
    back to the XLA path otherwise).
    """
    m, k = x.shape
    n = packed.shape[1]
    assert k % TILE_K == 0 and n % TILE_N == 0, (k, n)

    xf = x.astype(jnp.float32)
    x_even = xf[:, 0::2]  # (M, K/2): multiplies the high-nibble plane
    x_odd = xf[:, 1::2]

    grid = (n // TILE_N, k // TILE_K)
    kernel = pl.pallas_call(
        _nf4_matmul_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 16), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, TILE_K // 2), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, TILE_K // 2), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (TILE_K // 2, TILE_N), lambda i, j: (j, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (TILE_K // DEFAULT_BLOCK, TILE_N), lambda i, j: (j, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((m, TILE_N), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # prefill m up to 128 with whole-k tiles needs more than the
            # 16 MB scoped-VMEM default (13B: (64, 13824) f32 x-block +
            # 7 MB weight block, double-buffered); v5e has 128 MB physical
            vmem_limit_bytes=100 * 2**20,
        ),
        interpret=interpret,
    )
    return kernel(code.reshape(1, 16).astype(jnp.float32), x_even, x_odd, packed, absmax)


def pallas_eligible(p: dict, k_in: int, k_out: int) -> bool:
    # double-quant scales are dequantized on the fly (cheap, (K/64, N) f32)
    return "q4" in p and k_in % TILE_K == 0 and k_out % TILE_N == 0


def quantized_matmul_pallas(x: jnp.ndarray, p: dict, interpret: bool = False) -> jnp.ndarray:
    """Fused path for 4-bit linears; handles arbitrary leading batch dims."""
    from .quant import _absmax_of

    packed = p["q4"]
    k_in = packed.shape[0] * 2
    k_out = packed.shape[1]
    lead = x.shape[:-1]
    x2 = x.reshape(-1, k_in)
    absmax = p["absmax"] if "absmax" in p else _absmax_of(p, k_in, k_out)
    y = nf4_matmul(x2, packed, absmax, p["code"], interpret=interpret)
    return y.reshape(lead + (k_out,)).astype(x.dtype)


# ------------------------------------------------------- tiled int4 fast path

INT4_TILE_N = 1024  # 8 nibble planes x 128 lanes
INT4_PAD_K = 512    # k padded so every scale tile has >=8 sublanes
_INT4_MAX_M = 128   # larger m (prefill) routes to the XLA dequant path


def pack_int4_tiled(codes: np.ndarray, tile_k: int | None = None):
    """Pack signed int4 codes (k, n), values in [-8, 7], into the tiled
    kernel layout (gk, gn, tk, 128) int32.

    Within each 1024-column tile, the int32 word at (row r, lane l) holds
    the code of column tile*1024 + p*128 + l in nibble p (two's-complement),
    so the kernel extracts plane p with (w << (28-4p)) >> 28 — two native
    32-bit lane ops, no mask, no subtract, no sub-word relayout.
    k is zero-padded to a multiple of INT4_PAD_K, n to INT4_TILE_N; each
    (tk, 128) grid block is contiguous in HBM (flat layouts cap DMA ~30%
    below the ~609 GB/s tiled ceiling).
    """
    k, n = codes.shape
    k_pad = k + (-k) % INT4_PAD_K
    n_pad = n + (-n) % INT4_TILE_N
    full = np.zeros((k_pad, n_pad), np.int32)
    full[:k, :n] = codes.astype(np.int32)
    tk = tile_k or k_pad
    assert k_pad % tk == 0
    gk, gn = k_pad // tk, n_pad // INT4_TILE_N
    q = (full & 0xF).astype(np.uint32).reshape(k_pad, gn, 8, 128)
    words = np.zeros((k_pad, gn, 128), np.uint32)
    for p in range(8):
        words |= q[:, :, p, :] << (4 * p)
    pw = words.view(np.int32).reshape(gk, tk, gn, 128).transpose(0, 2, 1, 3)
    return np.ascontiguousarray(pw)


def tile_scales(absmax: np.ndarray, tk: int, n_pad: int) -> np.ndarray:
    """(k/64, n) f32 -> (gk, gn, tk/64, 1024), zero-padded, column layout
    matching pack_int4_tiled (which is identity within a tile)."""
    nb, n = absmax.shape
    k_pad_blocks = nb + (-nb) % (INT4_PAD_K // DEFAULT_BLOCK)
    full = np.zeros((k_pad_blocks, n_pad), np.float32)
    full[:nb, :n] = absmax
    nbt = tk // DEFAULT_BLOCK
    gk = k_pad_blocks // nbt
    gn = n_pad // INT4_TILE_N
    return np.ascontiguousarray(
        full.reshape(gk, nbt, gn, INT4_TILE_N).transpose(0, 2, 1, 3)
    )


def _int4_kernel(nb, tk, lanes, blockwise):
    def kernel(*refs):
        if blockwise:
            x_ref, pw_ref, s_ref, out_ref = refs
        else:
            x_ref, pw_ref, out_ref = refs
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        x = x_ref[:].astype(jnp.float32)
        pw = pw_ref[0, 0]
        for p in range(8):
            qp = (pw << (28 - 4 * p)) >> 28  # signed nibble in [-8, 7]
            w = qp.astype(jnp.float32)
            if blockwise:
                sp = s_ref[0, 0][:, p * lanes:(p + 1) * lanes]
                scale = jnp.broadcast_to(
                    sp[:, None, :] * 0.125, (nb, DEFAULT_BLOCK, lanes)
                ).reshape(tk, lanes)
                w = w * scale
            out_ref[:, p * lanes:(p + 1) * lanes] += jnp.dot(
                x, w, preferred_element_type=jnp.float32)

    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def int4_matmul_tiled(x, pw_t, s_t=None, interpret: bool = False):
    """x (M, k_pad) @ tiled-int4 weights -> (M, n_pad) f32.

    s_t None: raw signed-nibble dot (rank-1 scaling applied by the caller).
    s_t (gk, gn, tk/64, 1024): blockwise absmax, applied in-kernel.
    """
    m, k_pad = x.shape
    gk, gn, tk, _ = pw_t.shape
    assert k_pad == gk * tk, (k_pad, pw_t.shape)
    n_pad = gn * INT4_TILE_N
    lanes = INT4_TILE_N // 8
    nb = tk // DEFAULT_BLOCK
    blockwise = s_t is not None
    in_specs = [
        pl.BlockSpec((m, tk), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, tk, 128), lambda i, j: (j, i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [x.astype(jnp.float32), pw_t]
    if blockwise:
        in_specs.append(
            pl.BlockSpec((1, 1, nb, INT4_TILE_N), lambda i, j: (j, i, 0, 0),
                         memory_space=pltpu.VMEM))
        args.append(s_t)
    return pl.pallas_call(
        _int4_kernel(nb, tk, lanes, blockwise),
        grid=(gn, gk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((m, INT4_TILE_N), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # prefill m up to 128 with whole-k tiles needs more than the
            # 16 MB scoped-VMEM default (13B: (64, 13824) f32 x-block +
            # 7 MB weight block, double-buffered); v5e has 128 MB physical
            vmem_limit_bytes=100 * 2**20,
        ),
        interpret=interpret,
    )(*args)


def _pad_cols(x2, k_pad):
    k = x2.shape[1]
    if k == k_pad:
        return x2
    return jnp.pad(x2, ((0, 0), (0, k_pad - k)))


def _int4_r1_kernel(lanes):
    """Rank-1 kernel with the scale envelope FUSED: x*u on block entry,
    out*(v/8) on the last k-step. Keeping u/v inside the kernel removes
    two XLA fusions per matmul call — at 4 quantized matmuls x 32 layers a
    decode step paid ~256 small-op dispatches (~2.8 us each on this chip)
    just for the envelope (bench_results/decode_profile_r05*.jsonl)."""

    def kernel(x_ref, u_ref, pw_ref, v_ref, out_ref):
        j = pl.program_id(1)
        nk = pl.num_programs(1)

        @pl.when(j == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        x = x_ref[:].astype(jnp.float32) * u_ref[:]
        pw = pw_ref[0, 0]
        for p in range(8):
            qp = (pw << (28 - 4 * p)) >> 28
            out_ref[:, p * lanes:(p + 1) * lanes] += jnp.dot(
                x, qp.astype(jnp.float32), preferred_element_type=jnp.float32)

        @pl.when(j == nk - 1)
        def _():
            out_ref[:] = out_ref[:] * (v_ref[:] * 0.125)

    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def int4_matmul_rank1_tiled(x, u, pw_t, v, interpret: bool = False):
    """x (M, k_pad) @ tiled-int4 -> (M, n_pad) f32 with the rank-1 scale
    envelope applied in-kernel: y = ((x * u) @ Q) * (v / 8)."""
    m, k_pad = x.shape
    gk, gn, tk, _ = pw_t.shape
    n_pad = gn * INT4_TILE_N
    lanes = INT4_TILE_N // 8
    return pl.pallas_call(
        _int4_r1_kernel(lanes),
        grid=(gn, gk),
        in_specs=[
            pl.BlockSpec((m, tk), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tk, 128), lambda i, j: (j, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, INT4_TILE_N), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, INT4_TILE_N), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # prefill m up to 128 with whole-k tiles needs more than the
            # 16 MB scoped-VMEM default (13B: (64, 13824) f32 x-block +
            # 7 MB weight block, double-buffered); v5e has 128 MB physical
            vmem_limit_bytes=100 * 2**20,
        ),
        interpret=interpret,
    )(x.astype(jnp.float32), u.reshape(1, k_pad).astype(jnp.float32), pw_t,
      v.reshape(1, n_pad).astype(jnp.float32))


def _int4_r1_stacked_kernel(lanes):
    """Rank-1 kernel over layer ``l`` of the STACKED weights (scalar
    prefetch selects the layer in the index maps). Exists because the
    decode layer scan cannot slice a 25 MB weight leaf into a pallas
    operand without materializing a copy — measured r05 at 7B: the
    matmul-only scan ran at 404 GB/s effective vs ~620 GB/s for the same
    kernels on unstacked weights (decode_profile_r05f.jsonl, mm_scan).
    Reading the stack directly through prefetched index maps removes the
    copy the same way the stacked KV-cache attention kernel does."""

    def kernel(scalar_ref, x_ref, u_ref, pw_ref, v_ref, out_ref):
        del scalar_ref
        j = pl.program_id(1)
        nk = pl.num_programs(1)

        @pl.when(j == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        x = x_ref[:].astype(jnp.float32) * u_ref[0]
        pw = pw_ref[0, 0, 0]
        for p in range(8):
            qp = (pw << (28 - 4 * p)) >> 28
            out_ref[:, p * lanes:(p + 1) * lanes] += jnp.dot(
                x, qp.astype(jnp.float32), preferred_element_type=jnp.float32)

        @pl.when(j == nk - 1)
        def _():
            out_ref[:] = out_ref[:] * (v_ref[0] * 0.125)

    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def int4_matmul_rank1_tiled_stacked(x, u_all, pw_all, v_all, layer,
                                    interpret: bool = False):
    """x (M, k_pad) @ layer ``layer`` of stacked tiled-int4 weights.

    u_all: (L, 1, k_pad) f32; pw_all: (L, gk, gn, tk, 128) i32;
    v_all: (L, 1, n_pad) f32; layer: scalar int32. Returns (M, n_pad) f32
    with the rank-1 envelope applied in-kernel.
    """
    m, k_pad = x.shape
    n_layer, gk, gn, tk, _ = pw_all.shape
    n_pad = gn * INT4_TILE_N
    lanes = INT4_TILE_N // 8
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(gn, gk),
        in_specs=[
            pl.BlockSpec((m, tk), lambda i, j, sref: (0, j)),
            pl.BlockSpec((1, 1, tk), lambda i, j, sref: (sref[0], 0, j)),
            pl.BlockSpec((1, 1, 1, tk, 128),
                         lambda i, j, sref: (sref[0], j, i, 0, 0)),
            pl.BlockSpec((1, 1, INT4_TILE_N), lambda i, j, sref: (sref[0], 0, i)),
        ],
        out_specs=pl.BlockSpec((m, INT4_TILE_N), lambda i, j, sref: (0, i)),
    )
    return pl.pallas_call(
        _int4_r1_stacked_kernel(lanes),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, n_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # prefill m up to 128 with whole-k tiles needs more than the
            # 16 MB scoped-VMEM default (13B: (64, 13824) f32 x-block +
            # 7 MB weight block, double-buffered); v5e has 128 MB physical
            vmem_limit_bytes=100 * 2**20,
        ),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), x.astype(jnp.float32),
      u_all, pw_all, v_all)


def int4_matmul_rank1_stacked(x, p: dict, layer, interpret: bool = False):
    """Serving matmul for STACKED rank-1 int4 params (leading n_layer axis
    on every leaf): y = ((x * u[l]) @ Q[l]) * (v[l]/8).

    The u/v pads below are pure functions of the (loop-constant) weights,
    so XLA hoists them out of the decode loop — they run once per traced
    call, not per token/layer.
    """
    pw = p["q4r1"]  # (L, gk, gn, tk, 128)
    u, v = p["u4"], p["v4"]  # (L, k), (L, n)
    lead = x.shape[:-1]
    x2 = x.reshape(-1, u.shape[1])
    n_layer, gk, gn, tk, _ = pw.shape
    k_pad, n_pad = gk * tk, gn * INT4_TILE_N
    # prefill-sized m runs through the kernel too (the x block must fit
    # VMEM beside the weight block: m*tk*4 bytes, double-buffered, against
    # the 100 MB scope — 512 rows covers every chunked-prefill size at 13B
    # tk=13824); beyond that, fall back to the XLA dequantize path
    m_max = max(_INT4_MAX_M, min(512, (28 * 2**20) // (tk * 4)))
    if x2.shape[0] > m_max:
        from .quant import dequantize

        pl_ = {"q4r1": pw[layer], "u4": u[layer], "v4": v[layer]}
        return jnp.einsum("mk,kn->mn", x2, dequantize(pl_, x.dtype)).reshape(
            lead + (v.shape[1],)).astype(x.dtype)
    xs = _pad_cols(x2, k_pad)
    up = u if u.shape[1] == k_pad else jnp.pad(u, ((0, 0), (0, k_pad - u.shape[1])))
    vp = v if v.shape[1] == n_pad else jnp.pad(v, ((0, 0), (0, n_pad - v.shape[1])))
    y = int4_matmul_rank1_tiled_stacked(
        xs, up.reshape(n_layer, 1, k_pad), pw, vp.reshape(n_layer, 1, n_pad),
        layer, interpret=interpret)
    if n_pad != v.shape[1]:
        y = y[:, : v.shape[1]]
    return y.reshape(lead + (v.shape[1],)).astype(x.dtype)


def int4_matmul_rank1(x, p: dict, interpret: bool = False) -> jnp.ndarray:
    """Serving matmul for the rank-1 int4 format
    {"q4r1": (gk,gn,tk,128) i32, "u4": (k,) f32, "v4": (n,) f32}:
    y = ((x * u) @ Q) * (v/8). True k/n come from u4/v4 shapes."""
    pw = p["q4r1"]
    u, v = p["u4"], p["v4"]
    lead = x.shape[:-1]
    x2 = x.reshape(-1, u.shape[0])
    k_pad = pw.shape[0] * pw.shape[2]
    n_pad = pw.shape[1] * INT4_TILE_N
    if x2.shape[0] > _INT4_MAX_M:
        from .quant import dequantize

        return jnp.einsum("mk,kn->mn", x2, dequantize(p, x.dtype)).reshape(
            lead + (v.shape[0],)).astype(x.dtype)
    xs = _pad_cols(x2, k_pad)
    up = u if u.shape[0] == k_pad else jnp.pad(u, (0, k_pad - u.shape[0]))
    vp = v if v.shape[0] == n_pad else jnp.pad(v, (0, n_pad - v.shape[0]))
    y = int4_matmul_rank1_tiled(xs, up, pw, vp, interpret=interpret)
    if n_pad != v.shape[0]:
        y = y[:, : v.shape[0]]
    return y.reshape(lead + (v.shape[0],)).astype(x.dtype)


def int4_matmul_block(x, p: dict, interpret: bool = False) -> jnp.ndarray:
    """Serving matmul for the blockwise int4 format
    {"q4b": pw_t, "scale4": s_t, "n4": (n, 0) u8 marker}."""
    pw = p["q4b"]
    n_true = p["n4"].shape[0]
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    k_pad = pw.shape[0] * pw.shape[2]
    if x2.shape[0] > _INT4_MAX_M:
        from .quant import dequantize

        return jnp.einsum("mk,kn->mn", x2, dequantize(p, x.dtype)).reshape(
            lead + (n_true,)).astype(x.dtype)
    xs = _pad_cols(x2.astype(jnp.float32), k_pad)
    y = int4_matmul_tiled(xs, pw, p["scale4"], interpret=interpret)
    return y[:, :n_true].reshape(lead + (n_true,)).astype(x.dtype)
