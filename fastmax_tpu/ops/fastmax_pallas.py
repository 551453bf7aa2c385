"""Pallas TPU kernel for causal fastmax (degree-p polynomial linear
attention) — the role of the reference's absent-source fastmax_cuda
extension (setup_fast_cuda.py:24-33; wrapper lit_gpt/model.py:30-153),
built as a chunked prefix scan entirely in VMEM.

Per (batch, head) the grid walks sequence chunks in order; the running
sums (sum v, k (x) v, k, and for p=2 the (k (x) k) (x) v tensor stored as a
(D*D, D) matrix plus the (D, D) gram sum) persist in VMEM scratch across
chunk steps. Each chunk does:

  intra:  C x C polynomial scores, causal-masked, f(s) = 1 + s (+ s^2/2)
  inter:  q-contractions against the carried state; the degree-2 term
          avoids materializing outer products via a reshape (Mosaic cannot
          reshape minor dims) by building the (C, D^2) pairwise-product
          matrix Q2[t, m*D+j] = q[t,m]*q[t,j] with two matmuls against
          constant 0/1 expansion bases (_pair_basis), then
          f2 = Q2 @ S3                       one full-width MXU matmul
          g2 = rowsum((q @ KK) * q)          with KK the (D, D) gram sum
  update: S3 += K2^T @ v with K2 the same pairwise expansion of k

  (r02 iterated D per-state-row (C,D)@(D,D) matmuls with one-hot column
  extraction — <=50% MXU lane occupancy and D serialized loop trips; the
  pair-expansion form trades ~2x the MACs for ~D/3 fewer, full-width
  dispatches and was measured far faster in-model — docs/perf.md r03.)

Same math as ops/fastmax.py's lax.scan formulation (parity tested).

Trainable: `fastmax_pallas_trainable` pairs the forward (which also emits
the final carried state and the per-token normalizer g) with a single
reverse-walk backward kernel under a custom VJP — the TPU counterpart of
the reference's fastmax_cuda backwardpass (lit_gpt/model.py:116, sources
absent; Python math at attention_mechanisms/fastmax.py:383-691). The
state update is additive hence reversible: the backward walks chunks
last-to-first, reconstructs S_{c-1} = S_c - U(k_c, v_c) by subtraction in
VMEM, and applies the hand-derived per-chunk VJP — O(d^3) live state, no
O(N d^3) cumsum buffers (the blowup that forced the reference onto CUDA).

Engine/default usage is gated by the platform autotune (on this
environment's tunneled chip, Pallas-initiated DMA is slow and the XLA
scan wins; on full-rate hardware the kernel keeps the O(D^3) state pinned
in VMEM). VMEM budget: the p=2 state pair (S3 + its cotangent) is
2*d^3*4 bytes — d=64 fits comfortably; d=128 does not (gate on d<=64).
"""

from __future__ import annotations

import functools
import math
import os
import warnings

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_CHUNK = 128


def _pair_basis(d: int, dtype=jnp.float32):
    """Constant (d, d*d) 0/1 expansion bases: E[m, m*d+j] = 1 for all j;
    F[j, m*d+j] = 1 for all m. x @ E replicates each column of x d times
    block-wise (col c -> x[:, c//d]); x @ F tiles x d times (col c ->
    x[:, c%d]). Their elementwise product is the pairwise-product matrix
    X2[t, m*d+j] = x[t,m]*x[t,j] — the flattened outer product, built
    without any minor-dim reshape. Backward contractions reuse the same
    bases (fold: Y @ E^T sums col blocks, Y @ F^T sums col strides)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (d, d * d), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (d, d * d), 1)
    e = (cols // d == rows).astype(dtype)
    f = (cols % d == rows).astype(dtype)
    return e, f


def _sym_width(d: int) -> int:
    """Lane-padded packed pair count: d*(d+1)/2 rounded up to 128."""
    return -(-(d * (d + 1) // 2) // 128) * 128


@functools.lru_cache(maxsize=8)
def _pair_basis_sym_np(d: int):
    """Packed SYMMETRIC expansion bases over pairs m <= j (r05).

    The degree-2 feature map q (x) q is symmetric, so the full d^2 pair
    space double-counts every off-diagonal pair: the contraction
    sum_{m,j} q_m q_j S3[(m,j),:] equals sum_{m<=j} w_p q_m q_j S3p[p,:]
    with w = 2 off-diagonal, 1 on it. Packing to the upper triangle
    shrinks EVERY d^2-wide matmul in the p=2 path (expansions, the f2
    contraction, the S3 update, and all four backward foldbacks) from
    d^2 = 4096 to pad128(d(d+1)/2) = 2176 columns at d=64 — a 1.88x MAC
    cut on the dominant cost of the kernel (docs/perf.md r05).

    Returns (E (d, P), F (d, P), w (1, P)) as numpy f32, zero-padded:
    column p of pair (m, j) has E[m, p] = F[j, p] = 1, so
    X2p = (x @ E) * (x @ F) gives X2p[t, p] = x[t, m_p] * x[t, j_p].
    """
    import numpy as np

    p_pad = _sym_width(d)
    e = np.zeros((d, p_pad), np.float32)
    f = np.zeros((d, p_pad), np.float32)
    w = np.zeros((1, p_pad), np.float32)
    p = 0
    for m in range(d):
        for j in range(m, d):
            e[m, p] = 1.0
            f[j, p] = 1.0
            w[0, p] = 1.0 if m == j else 2.0
            p += 1
    return e, f, w


def _pair_basis_sym(d: int, dtype):
    e, f, w = _pair_basis_sym_np(d)
    return jnp.asarray(e, dtype), jnp.asarray(f, dtype), jnp.asarray(w, jnp.float32)


def _dot(a, b):
    """a @ b, f32 accumulate."""
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_nt(a, b):
    """a @ b^T (contract last dims), f32 accumulate."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_tn(a, b):
    """a^T @ b (contract first dims), f32 accumulate."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _kernel(*refs, z: float, p: int, chunk: int, d: int, pd):
    if p == 2:
        (q_ref, k_ref, v_ref, eb_ref, fb_ref, w_ref, o_ref,
         s_v, s_kv, s_k, s_kkv, s_kk, cnt) = refs
    else:
        (q_ref, k_ref, v_ref, o_ref,
         s_v, s_kv, s_k, s_kkv, s_kk, cnt) = refs
    c = pl.program_id(1)  # chunk index (sequential per bh)

    @pl.when(c == 0)
    def _():
        s_v[:] = jnp.zeros_like(s_v)
        s_kv[:] = jnp.zeros_like(s_kv)
        s_k[:] = jnp.zeros_like(s_k)
        cnt[0] = 0
        if p == 2:
            s_kkv[:] = jnp.zeros_like(s_kkv)
            s_kk[:] = jnp.zeros_like(s_kk)

    q = q_ref[0].astype(jnp.float32)  # (C, D)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)

    # ---- intra-chunk dense polynomial attention
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) / z
    fs = 1.0 + s
    if p == 2:
        fs = fs + 0.5 * s * s
    row = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    fs = jnp.where(col <= row, fs, 0.0)
    f_acc = jax.lax.dot_general(fs, v, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    g_acc = jnp.sum(fs, axis=1, keepdims=True)  # (C, 1)

    # ---- inter-chunk contributions from the carried state
    f_acc += s_v[:]
    f_acc += jax.lax.dot_general(q, s_kv[:], (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32) / z
    g_acc += cnt[0].astype(jnp.float32)
    g_acc += jax.lax.dot_general(q, s_k[:].reshape(d, 1), (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32) / z
    if p == 2:
        # g2 = rowsum((q @ KK) * q) / (2 z^2)
        t = jax.lax.dot_general(q, s_kk[:], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        g_acc += jnp.sum(t * q, axis=1, keepdims=True) / (2.0 * z * z)

        # f2 = (Q2p * w) @ S3p / (2 z^2) — one packed-width matmul over the
        # symmetric pair basis (see _pair_basis_sym_np). Pairwise operands
        # run in the INPUT dtype (bf16 in-model: 2x MXU rate on the dominant
        # (C, P) matmuls; f32 inputs keep f32 so the parity tests see exact
        # math); accumulation is always f32.
        e_b, f_b, w_b = eb_ref[:], fb_ref[:], w_ref[:]
        qp = q_ref[0].astype(pd)
        q2w = (_dot(qp, e_b) * _dot(qp, f_b) * w_b).astype(pd)  # (C, P)
        f_acc += _dot(q2w, s_kkv[:].astype(pd)) / (2.0 * z * z)

    o_ref[0] = (f_acc / g_acc).astype(o_ref.dtype)

    # ---- state update
    s_v[:] += jnp.sum(v, axis=0, keepdims=True)
    s_kv[:] += jax.lax.dot_general(k, v, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
    s_k[:] += jnp.sum(k, axis=0, keepdims=True)
    cnt[0] += chunk
    if p == 2:
        s_kk[:] += jax.lax.dot_general(k, k, (((0,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
        kp = k_ref[0].astype(pd)
        k2 = (_dot(kp, e_b) * _dot(kp, f_b)).astype(pd)  # (C, P)
        s_kkv[:] += _dot_tn(k2, v.astype(pd))            # (P, D)


# ---------------------------------------------------------------------------
# Trainable kernel pair: forward-with-state + reverse-walk backward.
# ---------------------------------------------------------------------------


def _fwd_train_kernel(*refs, z: float, p: int, chunk: int, d: int, pd):
    if p == 2:
        (q_ref, k_ref, v_ref, eb_ref, fb_ref, w_ref,
         o_ref, g_ref, skv_ref, sk_ref, skkv_ref, skk_ref,
         s_v, s_kv, s_k, s_kkv, s_kk, cnt) = refs
    else:
        (q_ref, k_ref, v_ref,
         o_ref, g_ref, skv_ref, sk_ref, skkv_ref, skk_ref,
         s_v, s_kv, s_k, s_kkv, s_kk, cnt) = refs
    c = pl.program_id(1)
    nc = pl.num_programs(1)

    @pl.when(c == 0)
    def _():
        s_v[:] = jnp.zeros_like(s_v)
        s_kv[:] = jnp.zeros_like(s_kv)
        s_k[:] = jnp.zeros_like(s_k)
        cnt[0] = 0
        if p == 2:
            s_kkv[:] = jnp.zeros_like(s_kkv)
            s_kk[:] = jnp.zeros_like(s_kk)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) / z
    fs = 1.0 + s
    if p == 2:
        fs = fs + 0.5 * s * s
    row = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    fs = jnp.where(col <= row, fs, 0.0)
    f_acc = jax.lax.dot_general(fs, v, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    g_acc = jnp.sum(fs, axis=1, keepdims=True)

    f_acc += s_v[:]
    f_acc += jax.lax.dot_general(q, s_kv[:], (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32) / z
    g_acc += cnt[0].astype(jnp.float32)
    g_acc += jax.lax.dot_general(q, s_k[:].reshape(d, 1), (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32) / z
    if p == 2:
        t = jax.lax.dot_general(q, s_kk[:], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        g_acc += jnp.sum(t * q, axis=1, keepdims=True) / (2.0 * z * z)

        e_b, f_b, w_b = eb_ref[:], fb_ref[:], w_ref[:]
        qp = q_ref[0].astype(pd)
        q2w = (_dot(qp, e_b) * _dot(qp, f_b) * w_b).astype(pd)  # (C, P)
        f_acc += _dot(q2w, s_kkv[:].astype(pd)) / (2.0 * z * z)

    o_ref[0] = (f_acc / g_acc).astype(o_ref.dtype)
    g_ref[0] = g_acc

    s_v[:] += jnp.sum(v, axis=0, keepdims=True)
    s_kv[:] += jax.lax.dot_general(k, v, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
    s_k[:] += jnp.sum(k, axis=0, keepdims=True)
    cnt[0] += chunk
    if p == 2:
        s_kk[:] += jax.lax.dot_general(k, k, (((0,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
        kp = k_ref[0].astype(pd)
        k2 = (_dot(kp, e_b) * _dot(kp, f_b)).astype(pd)
        s_kkv[:] += _dot_tn(k2, v.astype(pd))

    @pl.when(c == nc - 1)
    def _():
        skv_ref[0] = s_kv[:]
        sk_ref[0] = s_k[:]
        if p == 2:
            skkv_ref[0] = s_kkv[:]
            skk_ref[0] = s_kk[:]
        else:
            skkv_ref[0] = jnp.zeros_like(skkv_ref[0])
            skk_ref[0] = jnp.zeros_like(skk_ref[0])


def _bwd_kernel(*refs, z: float, p: int, chunk: int, d: int, pd):
    """One reverse chunk step. Grid index c walks chunks LAST to FIRST (the
    index maps flip the chunk axis); scratch carries the state (rewound by
    subtraction — the reversibility trick) and its cotangents."""
    if p == 2:
        (q_ref, k_ref, v_ref, do_ref, o_ref, g_ref,
         skv_in, sk_in, skkv_in, skk_in, eb_ref, fb_ref, w_ref,
         dq_ref, dk_ref, dv_ref,
         s_kv, s_k, s_kkv, s_kk,
         d_sv, d_skv, d_sk, d_skkv, d_skk) = refs
    else:
        (q_ref, k_ref, v_ref, do_ref, o_ref, g_ref,
         skv_in, sk_in, skkv_in, skk_in,
         dq_ref, dk_ref, dv_ref,
         s_kv, s_k, s_kkv, s_kk,
         d_sv, d_skv, d_sk, d_skkv, d_skk) = refs
    c = pl.program_id(1)
    z2 = 2.0 * z * z

    @pl.when(c == 0)
    def _():
        s_kv[:] = skv_in[0]
        s_k[:] = sk_in[0]
        d_sv[:] = jnp.zeros_like(d_sv)
        d_skv[:] = jnp.zeros_like(d_skv)
        d_sk[:] = jnp.zeros_like(d_sk)
        if p == 2:
            s_kkv[:] = skkv_in[0]
            s_kk[:] = skk_in[0]
            d_skkv[:] = jnp.zeros_like(d_skkv)
            d_skk[:] = jnp.zeros_like(d_skk)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    o = o_ref[0].astype(jnp.float32)
    g = g_ref[0]  # (C, 1) f32

    # ---- rewind the non-S3 state to this chunk's entry value
    s_kv[:] -= jax.lax.dot_general(k, v, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
    s_k[:] -= jnp.sum(k, axis=0, keepdims=True)
    if p == 2:
        s_kk[:] -= jax.lax.dot_general(k, k, (((0,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)

    # ---- output-gradient decomposition: o = f / g
    df = do / g                                            # (C, D)
    dgr = -jnp.sum(do * o, axis=1, keepdims=True) / g      # (C, 1)

    # ---- intra-chunk VJP
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) / z
    row = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    causal = col <= row
    fs = 1.0 + s
    fsp = jnp.ones_like(s)
    if p == 2:
        fs = fs + 0.5 * s * s
        fsp = fsp + s
    fs = jnp.where(causal, fs, 0.0)
    fsp = jnp.where(causal, fsp, 0.0)

    ds_mat = (jax.lax.dot_general(df, v, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32) + dgr) * fsp
    dq = jax.lax.dot_general(ds_mat, k, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) / z
    dk = jax.lax.dot_general(ds_mat, q, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) / z
    dv = jax.lax.dot_general(fs, df, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)

    # ---- inter-chunk q-side gradients (use the rewound state S_prev)
    dq += jax.lax.dot_general(df, s_kv[:], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32) / z
    dq += dgr * s_k[:] / z
    if p == 2:
        t2 = jax.lax.dot_general(q, s_kk[:], (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dq += dgr * t2 / (z * z)  # gram is symmetric: both halves

    # ---- update-path (U) gradients to k, v — MUST use the incoming
    # cotangents (gradients from chunks processed so far = later chunks),
    # before this chunk's own state-cotangent contributions are added.
    dv += d_sv[:]
    dk += jax.lax.dot_general(v, d_skv[:], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dv += jax.lax.dot_general(k, d_skv[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dk += d_sk[:]
    if p == 2:
        dk += jax.lax.dot_general(k, d_skk[:], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dk += jax.lax.dot_general(k, d_skk[:], (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)

    # ---- S3 (d^2 x d) terms, fully vectorized via the pair expansion —
    # rewind S3, q-side f2 gradients, U gradients, cotangent update.
    # Pairwise operands in the input dtype (bf16 in-model — see fwd note);
    # all accumulations f32.
    if p == 2:
        e_b, f_b, w_b = eb_ref[:], fb_ref[:], w_ref[:]
        kp = k_ref[0].astype(pd)
        vp = v_ref[0].astype(pd)
        qp = q_ref[0].astype(pd)
        k2 = (_dot(kp, e_b) * _dot(kp, f_b)).astype(pd)  # (C, P)
        # rewind: S3p_prev = S3p - K2p^T @ v
        s3 = s_kkv[:] - _dot_tn(k2, vp)
        s_kkv[:] = s3
        s3p = s3.astype(pd)
        # q-side: f2 = (Q2p * w) @ S3p_prev / (2 z^2); the symmetric-pair
        # weight w rides the dQ2p cotangent (and the dS3p update below)
        qa = _dot(qp, e_b)
        qb = _dot(qp, f_b)
        dq2 = _dot_nt(df.astype(pd), s3p) * w_b       # (C, P) = (df @ S3p^T) w
        dq += (_dot_nt((dq2 * qb).astype(pd), e_b)
               + _dot_nt((dq2 * qa).astype(pd), f_b)) / z2
        # U-side with the incoming cotangent dS3 (gradients from later
        # chunks, before this chunk's own contribution is added)
        ds3 = d_skkv[:]
        ds3p = ds3.astype(pd)
        dk2 = _dot_nt(vp, ds3p)                       # (C, P) = v @ dS3p^T
        ka = _dot(kp, e_b)
        kb = _dot(kp, f_b)
        dk += (_dot_nt((dk2 * kb).astype(pd), e_b)
               + _dot_nt((dk2 * ka).astype(pd), f_b))
        dv += _dot(k2, ds3p)                          # (C, P) @ (P, D)
        # cotangent update: dS3p += (Q2p * w)^T @ df / (2 z^2)
        q2w = (qa * qb * w_b).astype(pd)
        d_skkv[:] = ds3 + _dot_tn(q2w, df.astype(pd)) / z2

    # ---- non-S3 cotangent updates (apply to the state BEFORE this chunk)
    d_sv[:] += jnp.sum(df, axis=0, keepdims=True)
    d_skv[:] += jax.lax.dot_general(q, df, (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32) / z
    d_sk[:] += jnp.sum(dgr * q, axis=0, keepdims=True) / z
    if p == 2:
        d_skk[:] += jax.lax.dot_general(q, dgr * q, (((0,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32) / z2

    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)



_warned_pair_bf16 = False


def _pair_dtype(dtype, d: int, interpret: bool):
    """Precision of the pairwise-expansion operands. On the real chip the
    p=2 backward's (C, D*D) transients at d=64 exceed the 16 MB VMEM scope
    in f32 (measured: 22.6 MB scoped-vmem compile OOM, r03) AND run the
    MXU at half rate — so d >= 64 forces bf16 operands there (accumulation
    is always f32; chip grad-parity holds at the tpu_kernel_check
    tolerances). f32 callers at d >= 64 get a one-time warning about the
    silent operand downgrade (advisor r03). Interpret mode (CPU tests)
    follows the input dtype so the parity suites see exact f32 math —
    except under FASTMAX_TPU_FORCE_PAIR_BF16=1, which forces the bf16
    operand path so CPU tests can exercise the precision actually used on
    chip (tests/test_fastmax_pallas.py)."""
    if os.environ.get("FASTMAX_TPU_FORCE_PAIR_BF16"):
        return jnp.bfloat16
    if not interpret and d >= 64:
        if dtype != jnp.bfloat16:
            global _warned_pair_bf16
            if not _warned_pair_bf16:
                _warned_pair_bf16 = True
                warnings.warn(
                    "fastmax p=2 Pallas kernel: float32 inputs at head_size"
                    f" >= 64 (d={d}) use bfloat16 pairwise-matmul operands on"
                    " TPU (f32 accumulation) — VMEM scope forces this;"
                    " expect bf16-level operand precision.",
                    stacklevel=3,
                )
        return jnp.bfloat16
    return jnp.bfloat16 if dtype == jnp.bfloat16 else jnp.float32


def _basis_inputs(d: int, d2: int, pd):
    """Packed symmetric pair bases as kernel inputs (constant index maps —
    the Pallas pipeline skips the re-copy on revisited blocks, so they are
    DMA'd once per (bh) row, not per chunk step)."""
    eb, fb, wb = _pair_basis_sym(d, pd)
    specs = [
        pl.BlockSpec((d, d2), lambda bh, c: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((d, d2), lambda bh, c: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d2), lambda bh, c: (0, 0), memory_space=pltpu.VMEM),
    ]
    return [eb, fb, wb], specs


def _train_fwd_call(q, k, v, z: float, p: int, chunk: int, interpret: bool):
    b, h, n, d = q.shape
    pd = _pair_dtype(q.dtype, d, interpret)
    d2 = _sym_width(d) if p == 2 else 1
    dg = d if p == 2 else 1
    qf = q.reshape(b * h, n, d)
    kf = k.reshape(b * h, n, d)
    vf = v.reshape(b * h, n, d)
    grid = (b * h, n // chunk)
    seq_spec = pl.BlockSpec((1, chunk, d), lambda bh, c: (bh, c, 0),
                            memory_space=pltpu.VMEM)
    basis_args, basis_specs = _basis_inputs(d, d2, pd) if p == 2 else ([], [])
    o, g, skv, sk, skkv, skk = pl.pallas_call(
        functools.partial(_fwd_train_kernel, z=z, p=p, chunk=chunk, d=d, pd=pd),
        grid=grid,
        in_specs=[seq_spec, seq_spec, seq_spec] + basis_specs,
        out_specs=(
            seq_spec,
            pl.BlockSpec((1, chunk, 1), lambda bh, c: (bh, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, d), lambda bh, c: (bh, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda bh, c: (bh, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d2, d), lambda bh, c: (bh, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dg, dg), lambda bh, c: (bh, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, n, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, n, 1), jnp.float32),
            jax.ShapeDtypeStruct((b * h, d, d), jnp.float32),
            jax.ShapeDtypeStruct((b * h, 1, d), jnp.float32),
            jax.ShapeDtypeStruct((b * h, d2, d), jnp.float32),
            jax.ShapeDtypeStruct((b * h, dg, dg), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, d), jnp.float32),
            pltpu.VMEM((d, d), jnp.float32),
            pltpu.VMEM((1, d), jnp.float32),
            pltpu.VMEM((d2, d), jnp.float32),
            pltpu.VMEM((dg, dg), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # (C, P) pairwise transients exceed the 16 MB scoped-VMEM
            # default at long T (measured 18.9 MB at T=4096); v5e has
            # physical headroom well beyond the default scope
            vmem_limit_bytes=100 * 2**20,
        ),
        interpret=interpret,
    )(qf, kf, vf, *basis_args)
    return o.reshape(b, h, n, d), (g, skv, sk, skkv, skk)


def _train_bwd_call_impl(q, k, v, do, o, g, skv, sk, skkv, skk,
                         z: float, p: int, chunk: int, interpret: bool):
    b, h, n, d = q.shape
    pd = _pair_dtype(q.dtype, d, interpret)
    d2 = _sym_width(d) if p == 2 else 1
    dg = d if p == 2 else 1
    nc = n // chunk
    qf = q.reshape(b * h, n, d)
    kf = k.reshape(b * h, n, d)
    vf = v.reshape(b * h, n, d)
    dof = do.reshape(b * h, n, d)
    of = o.reshape(b * h, n, d)

    rev = lambda bh, c: (bh, nc - 1 - c, 0)
    seq_spec = pl.BlockSpec((1, chunk, d), rev, memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((1, chunk, 1), rev, memory_space=pltpu.VMEM)
    state_specs = [
        pl.BlockSpec((1, d, d), lambda bh, c: (bh, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, d), lambda bh, c: (bh, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d2, d), lambda bh, c: (bh, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, dg, dg), lambda bh, c: (bh, 0, 0), memory_space=pltpu.VMEM),
    ]
    basis_args, basis_specs = _basis_inputs(d, d2, pd) if p == 2 else ([], [])
    # basis index maps take (bh, c) like every other spec here
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, z=z, p=p, chunk=chunk, d=d, pd=pd),
        grid=(b * h, nc),
        in_specs=[seq_spec] * 5 + [g_spec] + state_specs + basis_specs,
        out_specs=(seq_spec, seq_spec, seq_spec),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, n, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, n, d), k.dtype),
            jax.ShapeDtypeStruct((b * h, n, d), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((d, d), jnp.float32),
            pltpu.VMEM((1, d), jnp.float32),
            pltpu.VMEM((d2, d), jnp.float32),
            pltpu.VMEM((dg, dg), jnp.float32),
            pltpu.VMEM((1, d), jnp.float32),
            pltpu.VMEM((d, d), jnp.float32),
            pltpu.VMEM((1, d), jnp.float32),
            pltpu.VMEM((d2, d), jnp.float32),
            pltpu.VMEM((dg, dg), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # the vectorized p=2 backward's (C, D^2) transients need more
            # scoped VMEM than the 16 MB default (measured 21 MB at C=128,
            # d=64); v5e has headroom above the default scope
            vmem_limit_bytes=100 * 2**20,
        ),
        interpret=interpret,
    )(qf, kf, vf, dof, of, g, skv, sk, skkv, skk, *basis_args)
    rs = lambda x: x.reshape(b, h, n, d)
    return rs(dq), rs(dk), rs(dv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def fastmax_pallas_trainable(q, k, v, p: int = 2, normalize_term: float = 8.0,
                             chunk: int = DEFAULT_CHUNK, interpret: bool = False):
    """Causal fastmax with fused Pallas forward AND backward.

    q, k, v: (B, H, N, D) float32, N % chunk == 0, D such that the p=2
    state pair fits VMEM (D <= 64). Differentiable in q, k, v.
    """
    z = float(normalize_term) * math.sqrt(q.shape[-1])
    o, _ = _train_fwd_call(q, k, v, z, p, chunk, interpret)
    return o


def _fpt_fwd(q, k, v, p, normalize_term, chunk, interpret):
    z = float(normalize_term) * math.sqrt(q.shape[-1])
    o, aux = _train_fwd_call(q, k, v, z, p, chunk, interpret)
    return o, (q, k, v, o, aux)


def _fpt_bwd(p, normalize_term, chunk, interpret, res, do):
    q, k, v, o, aux = res
    z = float(normalize_term) * math.sqrt(q.shape[-1])
    g, skv, sk, skkv, skk = aux
    b, h, n, d = q.shape
    return _train_bwd_call_impl(q, k, v, do, o, g, skv, sk, skkv, skk,
                                z, p, chunk, interpret)


fastmax_pallas_trainable.defvjp(_fpt_fwd, _fpt_bwd)


@functools.partial(jax.jit, static_argnames=("p", "normalize_term", "chunk", "interpret"))
def fastmax_pallas(q, k, v, *, p: int = 2, normalize_term: float = 8.0,
                   chunk: int = DEFAULT_CHUNK, interpret: bool = False):
    """Causal fastmax forward. q, k, v: (B, H, N, D); N % chunk == 0."""
    b, h, n, d = q.shape
    assert n % chunk == 0, (n, chunk)
    z = float(normalize_term) * math.sqrt(d)
    d2 = _sym_width(d) if p == 2 else 1
    pd = _pair_dtype(q.dtype, d, interpret)

    qf = q.reshape(b * h, n, d)
    kf = k.reshape(b * h, n, d)
    vf = v.reshape(b * h, n, d)

    grid = (b * h, n // chunk)
    basis_args, basis_specs = _basis_inputs(d, d2, pd) if p == 2 else ([], [])
    kernel = pl.pallas_call(
        functools.partial(_kernel, z=z, p=p, chunk=chunk, d=d, pd=pd),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, chunk, d), lambda bh, c: (bh, c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, d), lambda bh, c: (bh, c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, d), lambda bh, c: (bh, c, 0), memory_space=pltpu.VMEM),
        ] + basis_specs,
        out_specs=pl.BlockSpec((1, chunk, d), lambda bh, c: (bh, c, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, n, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((1, d), jnp.float32),    # s_v
            pltpu.VMEM((d, d), jnp.float32),    # s_kv
            pltpu.VMEM((1, d), jnp.float32),    # s_k
            pltpu.VMEM((d2, d), jnp.float32),   # s_kkv (row blocks of D)
            pltpu.VMEM((d, d) if p == 2 else (1, 1), jnp.float32),  # s_kk gram
            pltpu.SMEM((1,), jnp.int32),        # cnt
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 2**20,  # see _train_fwd_call note
        ),
        interpret=interpret,
    )
    out = kernel(qf, kf, vf, *basis_args)
    return out.reshape(b, h, n, d)
