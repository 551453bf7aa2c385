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
          avoids materializing (C, D^2) outer products (Mosaic cannot
          reshape minor dims) by looping row-blocks of the state:
          f2 = sum_m q[:, m] * (q @ S3[m])   with S3[m] = state rows m*D..m*D+D
          g2 = rowsum((q @ KK) * q)          with KK the (D, D) gram sum
  update: state += chunk contributions (the S3 update loops the same way)

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

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_CHUNK = 128


def _kernel(q_ref, k_ref, v_ref, o_ref,
            s_v, s_kv, s_k, s_kkv, s_kk, cnt,
            *, z: float, p: int, chunk: int, d: int):
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

        # f2 = sum_m q[:, m] * (q @ S3[m]) / (2 z^2), S3[m] = rows m*D..m*D+D
        def f2_body(m, acc):
            s3m = s_kkv[pl.ds(m * d, d), :]  # (D, D)
            tm = jax.lax.dot_general(q, s3m, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            # column m of q via a one-hot contraction (Mosaic has no
            # dynamic_slice on values)
            onehot = (jax.lax.broadcasted_iota(jnp.int32, (d, 1), 0) == m).astype(jnp.float32)
            qm = jax.lax.dot_general(q, onehot, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            return acc + qm * tm

        f2 = jax.lax.fori_loop(0, d, f2_body, jnp.zeros((chunk, d), jnp.float32))
        f_acc += f2 / (2.0 * z * z)

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

        def upd_body(m, _):
            onehot = (jax.lax.broadcasted_iota(jnp.int32, (d, 1), 0) == m).astype(jnp.float32)
            km = jax.lax.dot_general(k, onehot, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            contrib = jax.lax.dot_general(k * km, v, (((0,), (0,)), ((), ())),
                                          preferred_element_type=jnp.float32)
            s_kkv[pl.ds(m * d, d), :] += contrib
            return 0

        jax.lax.fori_loop(0, d, upd_body, 0)


# ---------------------------------------------------------------------------
# Trainable kernel pair: forward-with-state + reverse-walk backward.
# ---------------------------------------------------------------------------


def _onehot_col(m, d):
    """(d, 1) one-hot column for dynamic column extraction / scatter."""
    return (jax.lax.broadcasted_iota(jnp.int32, (d, 1), 0) == m).astype(jnp.float32)


def _fwd_train_kernel(q_ref, k_ref, v_ref,
                      o_ref, g_ref, skv_ref, sk_ref, skkv_ref, skk_ref,
                      s_v, s_kv, s_k, s_kkv, s_kk, cnt,
                      *, z: float, p: int, chunk: int, d: int):
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

        def f2_body(m, acc):
            s3m = s_kkv[pl.ds(m * d, d), :]
            tm = jax.lax.dot_general(q, s3m, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            qm = jax.lax.dot_general(q, _onehot_col(m, d), (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            return acc + qm * tm

        f2 = jax.lax.fori_loop(0, d, f2_body, jnp.zeros((chunk, d), jnp.float32))
        f_acc += f2 / (2.0 * z * z)

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

        def upd_body(m, _):
            km = jax.lax.dot_general(k, _onehot_col(m, d), (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            contrib = jax.lax.dot_general(k * km, v, (((0,), (0,)), ((), ())),
                                          preferred_element_type=jnp.float32)
            s_kkv[pl.ds(m * d, d), :] += contrib
            return 0

        jax.lax.fori_loop(0, d, upd_body, 0)

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


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, o_ref, g_ref,
                skv_in, sk_in, skkv_in, skk_in,
                dq_ref, dk_ref, dv_ref,
                s_kv, s_k, s_kkv, s_kk,
                d_sv, d_skv, d_sk, d_skkv, d_skk,
                *, z: float, p: int, chunk: int, d: int):
    """One reverse chunk step. Grid index c walks chunks LAST to FIRST (the
    index maps flip the chunk axis); scratch carries the state (rewound by
    subtraction — the reversibility trick) and its cotangents."""
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

    # ---- S3 (d^2 x d) terms: one fused loop over state row-blocks m —
    # rewind S3[m], q-side f2 gradients, U gradients, cotangent update
    if p == 2:
        def m_body(m, carry):
            dq_c, dk_c, dv_c = carry
            oh = _onehot_col(m, d)
            km = jax.lax.dot_general(k, oh, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            qm = jax.lax.dot_general(q, oh, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            # rewind: S3_prev[m] = S3[m] - (k * km)^T @ v
            u3m = jax.lax.dot_general(k * km, v, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            s3m = s_kkv[pl.ds(m * d, d), :] - u3m
            s_kkv[pl.ds(m * d, d), :] = s3m
            # q-side: f2 = sum_m qm * (q @ S3_prev[m]) / (2 z^2)
            tm = jax.lax.dot_general(q, s3m, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            dq_c += jax.lax.dot_general(qm * df, s3m, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32) / z2
            dq_c += jax.lax.dot_general(
                jnp.sum(df * tm, axis=1, keepdims=True), oh,
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            ) / z2
            # U-side with the incoming cotangent dS3[m]
            ds3m = d_skkv[pl.ds(m * d, d), :]
            am = jax.lax.dot_general(v, ds3m, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            dk_c += km * am
            dk_c += jax.lax.dot_general(
                jnp.sum(k * am, axis=1, keepdims=True), oh,
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            )
            dv_c += km * jax.lax.dot_general(k, ds3m, (((1,), (0,)), ((), ())),
                                             preferred_element_type=jnp.float32)
            # cotangent update: dS3[m] += (q * qm)^T @ df / (2 z^2)
            d_skkv[pl.ds(m * d, d), :] = ds3m + jax.lax.dot_general(
                q * qm, df, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) / z2
            return dq_c, dk_c, dv_c

        dq, dk, dv = jax.lax.fori_loop(0, d, m_body, (dq, dk, dv))

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


def _train_fwd_call(q, k, v, z: float, p: int, chunk: int, interpret: bool):
    b, h, n, d = q.shape
    d2 = d * d if p == 2 else 1
    dg = d if p == 2 else 1
    qf = q.reshape(b * h, n, d)
    kf = k.reshape(b * h, n, d)
    vf = v.reshape(b * h, n, d)
    grid = (b * h, n // chunk)
    seq_spec = pl.BlockSpec((1, chunk, d), lambda bh, c: (bh, c, 0),
                            memory_space=pltpu.VMEM)
    o, g, skv, sk, skkv, skk = pl.pallas_call(
        functools.partial(_fwd_train_kernel, z=z, p=p, chunk=chunk, d=d),
        grid=grid,
        in_specs=[seq_spec, seq_spec, seq_spec],
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
        ),
        interpret=interpret,
    )(qf, kf, vf)
    return o.reshape(b, h, n, d), (g, skv, sk, skkv, skk)


def _train_bwd_call_impl(q, k, v, do, o, g, skv, sk, skkv, skk,
                         z: float, p: int, chunk: int, interpret: bool):
    b, h, n, d = q.shape
    d2 = d * d if p == 2 else 1
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
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, z=z, p=p, chunk=chunk, d=d),
        grid=(b * h, nc),
        in_specs=[seq_spec] * 5 + [g_spec] + state_specs,
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
        ),
        interpret=interpret,
    )(qf, kf, vf, dof, of, g, skv, sk, skkv, skk)
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
    d2 = d * d if p == 2 else 1

    qf = q.reshape(b * h, n, d)
    kf = k.reshape(b * h, n, d)
    vf = v.reshape(b * h, n, d)

    grid = (b * h, n // chunk)
    kernel = pl.pallas_call(
        functools.partial(_kernel, z=z, p=p, chunk=chunk, d=d),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, chunk, d), lambda bh, c: (bh, c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, d), lambda bh, c: (bh, c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, d), lambda bh, c: (bh, c, 0), memory_space=pltpu.VMEM),
        ],
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
        ),
        interpret=interpret,
    )
    out = kernel(qf, kf, vf)
    return out.reshape(b, h, n, d)
