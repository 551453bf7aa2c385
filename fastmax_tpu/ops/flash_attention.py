"""Pallas flash attention (forward) for TPU.

The quadratic-path attention kernel: online-softmax over key blocks, never
materializing the (T, S) score matrix — the TPU counterpart of the SDPA
flash backend the reference relies on (lit_gpt/model.py:569-580, backend
asserted in its tests/test_model.py:701-751).

Layout notes:
* grid = (B*H, T/BQ, S/BK); the key-block axis is innermost so the running
  (max, sum, acc) state lives in VMEM scratch across those steps.
* GQA/MQA native: the kv BlockSpec's index_map divides the head index by
  q_per_kv, so grouped k/v are read directly — no materialized expansion.
* causal + cache semantics in one mask: query row i attends key j iff
  j <= pos0 + i and j < kv_len, where pos0/kv_len are SMEM scalars. That
  covers training (pos0=0, kv_len=T), chunked prefill at an offset, and
  padded KV buffers.
* forward only: the training path uses XLA attention under jax.checkpoint
  (the backward flash kernel is future work); the engine's prefill/decode
  run under jit without grads.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_K = 128
NEG_INF = -1e30


def _flash_kernel(scalars_ref, q_ref, k_ref, v_ref, out_ref, m_ref, l_ref, acc_ref,
                  *, scale: float, block_q: int, block_k: int):
    iq = pl.program_id(1)
    jk = pl.program_id(2)
    nk = pl.num_programs(2)
    pos0 = scalars_ref[0]
    kv_len = scalars_ref[1]

    @pl.when(jk == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # block coordinates
    q_start = iq * block_q  # local query row offset
    k_start = jk * block_k

    # skip key blocks entirely above the causal frontier or past kv_len
    needed = (k_start <= pos0 + q_start + block_q - 1) & (k_start < kv_len)

    @pl.when(needed)
    def _():
        q = q_ref[0]  # (BQ, D)
        k = k_ref[0]  # (BK, D)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (BQ, BK)

        q_pos = pos0 + q_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        k_pos = k_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        mask = (k_pos <= q_pos) & (k_pos < kv_len)
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_ref[:]  # (BQ, 1)
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)  # (BQ, BK)
        alpha = jnp.exp(m_prev - m_new)  # (BQ, 1)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[:] = m_new

    @pl.when(jk == nk - 1)
    def _():
        l = l_ref[:]
        out_ref[0] = (acc_ref[:] / jnp.where(l == 0.0, 1.0, l)).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "block_q", "block_k", "interpret"),
)
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: float | None = None,
    pos0=0,
    kv_len=None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,
) -> jnp.ndarray:
    """Causal flash attention.

    q: (B, Hq, T, D); k, v: (B, G, S, D) with Hq % G == 0.
    pos0: absolute position of q[:, :, 0] (traced scalar ok).
    kv_len: number of valid keys (defaults to S).
    Requires T % block_q == 0 and S % block_k == 0 (caller pads).
    """
    b, hq, t, d = q.shape
    g, s = k.shape[1], k.shape[2]
    assert t % block_q == 0 and s % block_k == 0, (t, s)
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    rep = hq // g
    if kv_len is None:
        kv_len = s

    qf = q.reshape(b * hq, t, d)
    scalars = jnp.asarray([pos0, kv_len], jnp.int32)

    grid = (b * hq, t // block_q, s // block_k)

    def kv_index(bh, iq, jk):
        # bh = b * Hq + h ; kv head = h // rep
        bb = bh // hq
        h = bh % hq
        return (bb * g + h // rep, jk, 0)

    kernel = pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=scale, block_q=block_q, block_k=block_k
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, block_q, d), lambda bh, iq, jk: (bh, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), kv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), kv_index, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh, iq, jk: (bh, iq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * hq, t, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )
    kf = k.reshape(b * g, s, d)
    vf = v.reshape(b * g, s, d)
    out = kernel(scalars, qf, kf, vf)
    return out.reshape(b, hq, t, d)


def flash_eligible(t: int, s: int, d: int,
                   block_q: int = DEFAULT_BLOCK_Q, block_k: int = DEFAULT_BLOCK_K) -> bool:
    # d=64 maps to half-width lanes (Mosaic pads). Gated to long contexts:
    # measured on v5e, XLA's fused attention wins below ~2k keys (grid
    # overhead dominates flash there), while flash avoids the (H, T, S)
    # score materialization that grows quadratically beyond it.
    return t % block_q == 0 and s % block_k == 0 and d % 64 == 0 and s >= 2048
