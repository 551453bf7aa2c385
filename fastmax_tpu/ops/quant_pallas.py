"""Pallas TPU kernel: fused 4-bit dequant + matmul.

The performance heart of the framework (BASELINE.json: "every dequant+matmul
kernel at speed-of-light per chip"). Decode is weight-bandwidth-bound: the
XLA fallback (ops/quant.py quantized_matmul) materializes the dequantized
f32 weight in HBM (4 bytes/param of traffic plus the packed read), while
this kernel streams the PACKED bytes into VMEM (0.5 bytes/param) and
dequantizes in registers right before the MXU dot — the same role as
bitsandbytes' CUDA dequant kernels fused into the decode matmuls
(reference generate/base.py:129-134 quantized path).

Dequant strategy (no sublane shuffles):
  the pack format stores row 2i in the high nibble and row 2i+1 in the low
  nibble of byte i (ops/quant.py). Instead of re-interleaving inside the
  kernel, the CALLER splits the activation x into even/odd input rows once
  per step (a tiny (M, K) slice), and the kernel computes

     y = x_even @ deq(hi_nibbles) + x_odd @ deq(lo_nibbles)

  where each nibble plane is a contiguous (K/2, N) matrix. Codebook lookup
  is 16 vector selects (VPU); the per-64-row absmax broadcast becomes a
  per-32-row broadcast on each plane (rows 2i and 2i+1 share a block).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .quant import DEFAULT_BLOCK

# tile sizes: K must cover whole quant blocks (64 rows -> 32 packed rows)
TILE_K = 512  # input rows per step (256 packed rows, 8 quant blocks)
TILE_N = 256  # output cols per step


def _codebook_select(codes: jnp.ndarray, code: jnp.ndarray) -> jnp.ndarray:
    """16-way select: codes (uint8/int32) -> float values. VPU-friendly."""
    out = jnp.zeros(codes.shape, jnp.float32)
    for c in range(16):
        out = jnp.where(codes == c, code[c], out)
    return out


def _nf4_matmul_kernel(code_ref, xe_ref, xo_ref, packed_ref, absmax_ref, out_ref):
    j = pl.program_id(1)  # k-tile index (minor): accumulate over it

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # upcast before bit ops: Mosaic has no sub-word shift for uint8
    packed = packed_ref[:].astype(jnp.int32)  # (TILE_K//2, TILE_N)
    hi = packed >> 4
    lo = packed & 0xF
    code = code_ref[0]  # (16,)
    w_hi = _codebook_select(hi, code)  # rows 0,2,4,... of the tile
    w_lo = _codebook_select(lo, code)  # rows 1,3,5,...

    # rows 2i and 2i+1 live in quant block (2i)//64 = i//32: broadcast each
    # absmax row over 32 plane rows
    absmax = absmax_ref[:]  # (TILE_K//64, TILE_N)
    nb = absmax.shape[0]
    plane = TILE_K // 2
    scale = jnp.repeat(absmax, plane // nb, axis=0)  # (TILE_K//2, TILE_N)
    w_hi = w_hi * scale
    w_lo = w_lo * scale

    acc = jnp.dot(xe_ref[:], w_hi, preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(xo_ref[:], w_lo, preferred_element_type=jnp.float32)
    out_ref[:] += acc


@partial(jax.jit, static_argnames=("interpret",))
def nf4_matmul(x: jnp.ndarray, packed: jnp.ndarray, absmax: jnp.ndarray,
               code: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """x (M, K) @ 4bit-packed (K/2, N) with (K/64, N) absmax -> (M, N) f32.

    Requires K % TILE_K == 0 and N % TILE_N == 0 (the caller falls back to
    the XLA path otherwise).
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
