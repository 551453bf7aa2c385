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

Same math as ops/fastmax.py's lax.scan formulation (parity tested). Forward
only — training autodiffs through the scan. Engine usage is gated by the
platform autotune (on this environment's tunneled chip, Pallas-initiated
DMA is slow and the XLA scan wins; on full-rate hardware the kernel keeps
the O(D^3) state pinned in VMEM).
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
