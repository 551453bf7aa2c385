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
* trainable: `flash_attention_trainable` pairs a forward that also emits
  the logsumexp rows with Pallas backward kernels (dq and dk/dv) under a
  custom VJP — the fused-attention training path the reference gets from
  torch SDPA's flash backend (its backward asserted in
  tests/test_model.py:701-751). Row statistics (lse, delta) are stored as
  (B*H, T, 1) so every kernel reads/writes (BQ, 1) tiles directly — no
  sublane/lane relayouts and ~1000x less stat traffic than replicating
  them across a 128-lane minor dim.
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


# ---------------------------------------------------------------------------
# Trainable flash attention: Pallas forward (out + lse) and Pallas backward
# (dq kernel; dk/dv kernel) under a custom VJP. Training-path specialization:
# T == S, pos0 = 0, causal, k/v pre-expanded to full head count (same
# interface as ops/blockwise_attention.py so the dispatch can swap them).
# ---------------------------------------------------------------------------


def _fwd_lse_kernel(q_ref, k_ref, v_ref, out_ref, lse_ref, m_ref, l_ref, acc_ref,
                    *, scale: float, block_q: int, block_k: int):
    iq = pl.program_id(1)
    jk = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(jk == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q_start = iq * block_q
    k_start = jk * block_k

    @pl.when(k_start <= q_start + block_q - 1)
    def _():
        q = q_ref[0]
        k = k_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        q_pos = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        k_pos = k_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        s = jnp.where(k_pos <= q_pos, s, NEG_INF)

        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[:] = m_new

    @pl.when(jk == nk - 1)
    def _():
        l = l_ref[:]
        out_ref[0] = (acc_ref[:] / l).astype(out_ref.dtype)
        lse_ref[0] = m_ref[:] + jnp.log(l)


def _fwd_lse(q, k, v, scale, block_q, block_k, interpret):
    b, h, t, d = q.shape
    qf = q.reshape(b * h, t, d)
    kf = k.reshape(b * h, t, d)
    vf = v.reshape(b * h, t, d)
    grid = (b * h, t // block_q, t // block_k)
    qspec = pl.BlockSpec((1, block_q, d), lambda bh, iq, jk: (bh, iq, 0),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, block_k, d), lambda bh, iq, jk: (bh, jk, 0),
                          memory_space=pltpu.VMEM)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_lse_kernel, scale=scale,
                          block_q=block_q, block_k=block_k),
        grid=grid,
        in_specs=[qspec, kvspec, kvspec],
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda bh, iq, jk: (bh, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda bh, iq, jk: (bh, iq, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, t, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, t, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(b, h, t, d), lse


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, acc_ref,
                   *, scale: float, block_q: int, block_k: int):
    iq = pl.program_id(1)
    jk = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(jk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q_start = iq * block_q
    k_start = jk * block_k

    @pl.when(k_start <= q_start + block_q - 1)
    def _():
        q = q_ref[0]
        k = k_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        q_pos = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        k_pos = k_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        mask = k_pos <= q_pos
        # p = exp(s - lse); masked entries: exp(NEG_INF) = 0 via where
        p = jnp.where(mask, jnp.exp(s - lse_ref[0]), 0.0)
        dp = jax.lax.dot_general(
            do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta_ref[0])
        acc_ref[:] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(jk == nk - 1)
    def _():
        dq_ref[0] = (acc_ref[:] * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, dk_acc, dv_acc,
                    *, scale: float, block_q: int, block_k: int):
    jk = pl.program_id(1)  # key block (outer)
    iq = pl.program_id(2)  # query block (inner, sequential)
    nq = pl.num_programs(2)

    @pl.when(iq == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q_start = iq * block_q
    k_start = jk * block_k

    # this key block only receives gradient from query rows >= k_start
    @pl.when(q_start + block_q - 1 >= k_start)
    def _():
        q = q_ref[0]
        k = k_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        q_pos = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        k_pos = k_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        mask = k_pos <= q_pos
        p = jnp.where(mask, jnp.exp(s - lse_ref[0]), 0.0)
        do = do_ref[0]
        # dv += p^T @ do  (contract the query axis — axis 0 of both)
        dv_acc[:] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta_ref[0])
        # dk += ds^T @ q
        dk_acc[:] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(iq == nq - 1)
    def _():
        dk_ref[0] = (dk_acc[:] * scale).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _bwd(q, k, v, do, lse, delta, scale, block_q, block_k, interpret):
    b, h, t, d = q.shape
    qf, kf, vf, dof = (x.reshape(b * h, t, d) for x in (q, k, v, do))

    qspec_q = pl.BlockSpec((1, block_q, d), lambda bh, iq, jk: (bh, iq, 0),
                           memory_space=pltpu.VMEM)
    kvspec_q = pl.BlockSpec((1, block_k, d), lambda bh, iq, jk: (bh, jk, 0),
                            memory_space=pltpu.VMEM)
    statspec_q = pl.BlockSpec((1, block_q, 1), lambda bh, iq, jk: (bh, iq, 0),
                              memory_space=pltpu.VMEM)
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale,
                          block_q=block_q, block_k=block_k),
        grid=(b * h, t // block_q, t // block_k),
        in_specs=[qspec_q, kvspec_q, kvspec_q, qspec_q, statspec_q, statspec_q],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh, iq, jk: (bh, iq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, t, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qf, kf, vf, dof, lse, delta)

    # dkv grid: key blocks outer, query blocks inner (sequential accumulate)
    qspec_k = pl.BlockSpec((1, block_q, d), lambda bh, jk, iq: (bh, iq, 0),
                           memory_space=pltpu.VMEM)
    kvspec_k = pl.BlockSpec((1, block_k, d), lambda bh, jk, iq: (bh, jk, 0),
                            memory_space=pltpu.VMEM)
    statspec_k = pl.BlockSpec((1, block_q, 1), lambda bh, jk, iq: (bh, iq, 0),
                              memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale,
                          block_q=block_q, block_k=block_k),
        grid=(b * h, t // block_k, t // block_q),
        in_specs=[qspec_k, kvspec_k, kvspec_k, qspec_k, statspec_k, statspec_k],
        out_specs=(
            pl.BlockSpec((1, block_k, d), lambda bh, jk, iq: (bh, jk, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda bh, jk, iq: (bh, jk, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, t, d), k.dtype),
            jax.ShapeDtypeStruct((b * h, t, d), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qf, kf, vf, dof, lse, delta)
    rs = lambda x: x.reshape(b, h, t, d)
    return rs(dq), rs(dk), rs(dv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def flash_attention_trainable(q, k, v, scale=None, block_q: int = DEFAULT_BLOCK_Q,
                              block_k: int = DEFAULT_BLOCK_K, interpret: bool = False):
    """Causal flash attention with a fused Pallas backward.

    q, k, v: (B, H, T, D), k/v pre-expanded to full head count; T % block == 0
    (caller pads — see ops/attention.py). Differentiable in q, k, v.
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    out, _ = _fwd_lse(q, k, v, scale, block_q, block_k, interpret)
    return out


def _fat_fwd(q, k, v, scale, block_q, block_k, interpret):
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    out, lse = _fwd_lse(q, k, v, scale, block_q, block_k, interpret)
    from jax.ad_checkpoint import checkpoint_name

    # named like blockwise_attention's residuals so remat="attn" saves them
    return out, (q, k, v, checkpoint_name(out, "attn_out"),
                 checkpoint_name(lse, "attn_lse"))


def _fat_bwd(scale, block_q, block_k, interpret, res, do):
    q, k, v, out, lse = res
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    b, h, t, d = q.shape
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1, keepdims=True).reshape(b * h, t, 1)
    return _bwd(q, k, v, do, lse, delta, scale, block_q, block_k, interpret)


flash_attention_trainable.defvjp(_fat_fwd, _fat_bwd)


# ---------------------------------------------------------------------------
# Whole-head-resident fused kernels ("flash2"): grid (B*H,) — one program
# per head, the full (T, D) tensors live in VMEM, block loops are unrolled
# at trace time. Rationale (measured r02, docs/perf.md): at train-step
# grids of 256+ programs the per-block Pallas DMA dominated on this chip
# (blockwise 28.6% vs flash 20.5% MFU) even though the isolated kernel
# won. This variant does ONE input DMA set per head, and the fused
# backward computes dq, dk, dv in a single pass — each (q, k) block pair's
# scores are recomputed once, not twice as in the split dq/dkv kernels.
# VMEM bound: ~8 MB/head at T=4096, D=64 — gated by _fused_eligible.
# ---------------------------------------------------------------------------


def _fused_block(t: int) -> int:
    # few, large tiles: whole-T for short sequences, else 512-wide blocks
    # (a (512, 512) f32 score transient = 1 MB)
    return t if t <= 512 else 512


def _fused_eligible(t: int, d: int) -> bool:
    # Two VMEM limits gate the whole-head kernels:
    # 1. bytes: ~9 (T, D) f32-equivalent live tensors (q/k/v/o/do,
    #    dq/dk/dv accumulators, recompute operands) + (T, D) scratch +
    #    double buffering, budgeted as 10 tensors + 8 MB against the
    #    100 MB vmem_limit_bytes;
    # 2. SCOPED allocations from the trace-time-unrolled block loops: the
    #    fused backward unrolls nb*(nb+1)/2 block pairs (nb = T/512),
    #    each with (512, 512) f32 score transients whose live ranges
    #    Mosaic does not fully reuse — measured on v5e d=64: T=4096
    #    (nb=8, 36 pairs) compiles and runs at 48.6% MFU; T=8192 (nb=16,
    #    136 pairs) fails with a scoped-allocation OOM in every isolated
    #    leg (bench_results/longctx_r04.jsonl, r04). Gate at the
    #    empirically-verified T*D boundary so longer shapes fall back to
    #    the grid-mapped kernels instead of failing compilation
    #    (advisor r03: the old bytes-only bound passed shapes that fail).
    return t * d <= 4096 * 64 and t * d * 4 * 10 + 8 * 2**20 <= 72 * 2**20


def _whole_fwd_kernel(q_ref, k_ref, v_ref, out_ref, lse_ref,
                      *, scale: float, t: int, blk: int):
    nb = t // blk
    for i in range(nb):
        q = q_ref[0, i * blk:(i + 1) * blk, :]
        m = jnp.full((blk, 1), NEG_INF, jnp.float32)
        l = jnp.zeros((blk, 1), jnp.float32)
        acc = jnp.zeros((blk, q_ref.shape[2]), jnp.float32)
        for j in range(i + 1):
            k = k_ref[0, j * blk:(j + 1) * blk, :]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale
            if j == i:  # only the diagonal block needs masking
                rows = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 0)
                cols = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 1)
                s = jnp.where(cols <= rows, s, NEG_INF)
            m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m - m_new)
            l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
            acc = acc * alpha + jax.lax.dot_general(
                p.astype(v_ref.dtype), v_ref[0, j * blk:(j + 1) * blk, :],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )
            m = m_new
        out_ref[0, i * blk:(i + 1) * blk, :] = (acc / l).astype(out_ref.dtype)
        lse_ref[0, i * blk:(i + 1) * blk, :] = m + jnp.log(l)


def _whole_bwd_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                      dq_ref, dk_ref, dv_ref, dq_acc,
                      *, scale: float, t: int, blk: int):
    nb = t // blk
    dq_acc[:] = jnp.zeros_like(dq_acc)
    for j in range(nb):  # key blocks
        k = k_ref[0, j * blk:(j + 1) * blk, :]
        v = v_ref[0, j * blk:(j + 1) * blk, :]
        dk = jnp.zeros((blk, k_ref.shape[2]), jnp.float32)
        dv = jnp.zeros((blk, k_ref.shape[2]), jnp.float32)
        for i in range(j, nb):  # query blocks at/below the diagonal
            q = q_ref[0, i * blk:(i + 1) * blk, :]
            do = do_ref[0, i * blk:(i + 1) * blk, :]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale
            p = jnp.exp(s - lse_ref[0, i * blk:(i + 1) * blk, :])
            if i == j:
                rows = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 0)
                cols = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 1)
                p = jnp.where(cols <= rows, p, 0.0)
            dp = jax.lax.dot_general(
                do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            )
            ds = p * (dp - delta_ref[0, i * blk:(i + 1) * blk, :])
            dv += jax.lax.dot_general(
                p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dk += jax.lax.dot_general(
                ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dq_acc[i * blk:(i + 1) * blk, :] += jax.lax.dot_general(
                ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        dk_ref[0, j * blk:(j + 1) * blk, :] = (dk * scale).astype(dk_ref.dtype)
        dv_ref[0, j * blk:(j + 1) * blk, :] = dv.astype(dv_ref.dtype)
    dq_ref[0] = (dq_acc[:] * scale).astype(dq_ref.dtype)


def _whole_fwd(q, k, v, scale, interpret):
    b, h, t, d = q.shape
    blk = _fused_block(t)
    spec = pl.BlockSpec((1, t, d), lambda bh: (bh, 0, 0), memory_space=pltpu.VMEM)
    lspec = pl.BlockSpec((1, t, 1), lambda bh: (bh, 0, 0), memory_space=pltpu.VMEM)
    out, lse = pl.pallas_call(
        functools.partial(_whole_fwd_kernel, scale=scale, t=t, blk=blk),
        grid=(b * h,),
        in_specs=[spec, spec, spec],
        out_specs=(spec, lspec),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, t, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, t, 1), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # whole-head residency at long T needs more than the 16 MB
            # scoped-VMEM default (the pipeline double-buffers (T, D)
            # blocks); v5e has physical headroom beyond the default scope
            vmem_limit_bytes=100 * 2**20,
        ),
        interpret=interpret,
    )(q.reshape(b * h, t, d), k.reshape(b * h, t, d), v.reshape(b * h, t, d))
    return out.reshape(b, h, t, d), lse


def _whole_bwd(q, k, v, do, lse, delta, scale, interpret):
    b, h, t, d = q.shape
    blk = _fused_block(t)
    spec = pl.BlockSpec((1, t, d), lambda bh: (bh, 0, 0), memory_space=pltpu.VMEM)
    lspec = pl.BlockSpec((1, t, 1), lambda bh: (bh, 0, 0), memory_space=pltpu.VMEM)
    rs3 = lambda x: x.reshape(b * h, t, d)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_whole_bwd_kernel, scale=scale, t=t, blk=blk),
        grid=(b * h,),
        in_specs=[spec, spec, spec, spec, lspec, lspec],
        out_specs=(spec, spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, t, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, t, d), k.dtype),
            jax.ShapeDtypeStruct((b * h, t, d), v.dtype),
        ),
        scratch_shapes=[pltpu.VMEM((t, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # whole-head residency at long T needs more than the 16 MB
            # scoped-VMEM default (the pipeline double-buffers (T, D)
            # blocks); v5e has physical headroom beyond the default scope
            vmem_limit_bytes=100 * 2**20,
        ),
        interpret=interpret,
    )(rs3(q), rs3(k), rs3(v), rs3(do), lse, delta)
    return rs3(dq).reshape(b, h, t, d), dk.reshape(b, h, t, d), dv.reshape(b, h, t, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention_fused(q, k, v, scale=None, interpret: bool = False):
    """Causal flash attention, whole-head VMEM residency, single-pass fused
    backward. q, k, v: (B, H, T, D) with k/v pre-expanded; T a multiple of
    the internal block (caller pads). Differentiable in q, k, v. Use
    _fused_eligible(t, d) to check the VMEM gate before calling."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    out, _ = _whole_fwd(q, k, v, scale, interpret)
    return out


def _faf_fwd(q, k, v, scale, interpret):
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    out, lse = _whole_fwd(q, k, v, scale, interpret)
    from jax.ad_checkpoint import checkpoint_name

    return out, (q, k, v, checkpoint_name(out, "attn_out"),
                 checkpoint_name(lse, "attn_lse"))


def _faf_bwd(scale, interpret, res, do):
    q, k, v, out, lse = res
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    b, h, t, d = q.shape
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1, keepdims=True).reshape(b * h, t, 1)
    return _whole_bwd(q, k, v, do, lse, delta, scale, interpret)


flash_attention_fused.defvjp(_faf_fwd, _faf_bwd)


def flash_eligible(t: int, s: int, d: int,
                   block_q: int = DEFAULT_BLOCK_Q, block_k: int = DEFAULT_BLOCK_K) -> bool:
    # d=64 maps to half-width lanes (Mosaic pads). Gated to long contexts:
    # measured on v5e, XLA's fused attention wins below ~2k keys (grid
    # overhead dominates flash there), while flash avoids the (H, T, S)
    # score materialization that grows quadratically beyond it.
    return t % block_q == 0 and s % block_k == 0 and d % 64 == 0 and s >= 2048
