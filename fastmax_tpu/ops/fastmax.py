"""Fastmax: degree-p Taylor-polynomial linear attention, TPU-native.

Reimplements the capability of the reference's attention_mechanisms package
(/root/reference/attention_mechanisms/fastmax.py:7-691, fastmax_hack.py:5-131,
fastmax_old.py) and its absent-source CUDA extension, with a design suited to
XLA/TPU instead of a translation:

The attention weight is ``f(s) = 1 + s (+ s^2/2 for p=2)`` with
``s = q . k / Z`` and row normalization by ``g_i = sum_j f(s_ij)``. The causal
form factorizes through running sums of ``v``, ``k (x) v`` and (for p=2)
``(k (x) k) (x) v``. The reference materializes cumsums of these per-token
outer products — O(N d^2) / O(N d^3) memory (fastmax.py:239-248), which is why
its einops path ran on CPU. Here we instead run a **chunked prefix scan**:
each chunk of C tokens handles its intra-chunk interactions with a dense
O(C^2) polynomial-attention block (MXU-friendly matmuls) and reads/updates a
carried state of only ``d``, ``d x d`` and ``d^2 x d`` running sums. Memory is
O(d^3) total instead of O(N d^3), and every contraction is a matmul that XLA
tiles onto the MXU.

Autodiff through ``lax.scan`` gives the O(N) backward pass, replacing the
hand-derived reverse-cumsum backward of the reference (fastmax.py:383-691).

Shapes follow the framework convention: q, k, v are (B, H, N, D).
"""

from __future__ import annotations

import math
import os
from functools import partial

import jax
import jax.numpy as jnp

# Scan-chunk length C: each chunk pays one read+write of the carried running
# sums (for p=2 that state is (B,H,d^2,d) f32 — the dominant HBM term of
# fastmax training), so larger chunks amortize state bandwidth against
# O(C^2) intra-chunk matmul FLOPs (cheap on the MXU). Env-overridable; see
# also `_auto_chunk` which scales C with the sequence length.
DEFAULT_CHUNK = int(os.environ.get("FASTMAX_TPU_CHUNK", 128))

# performer denominator conditioning (see `performer`): q . cumsum(k) has
# no sign guarantee — it crosses zero for real activations, where both
# 1/den and d(1/den) blow up. |den| is floored with its sign preserved at a
# RELATIVE scale, rel * |q| * |cumsum k| (the row is treated as at most
# ~1/rel away from orthogonal): an absolute floor alone keeps the forward
# finite but lets near-singular rows emit |o| ~ 1e6 whose backward
# amplification compounds over layers until the gradient global-norm
# square overflows f32 (measured: gnorm 9e4 at 4 layers/d=32 -> 4e10 at
# 8 layers/d=64 -> inf at TinyLlama scale, whereupon
# clip_by_global_norm multiplies the whole model by nan — the r03 "NaN at
# bench scale"). The relative floor bounds |o| and its gradients by
# ~|v|/rel regardless of scale, and is inactive on well-conditioned rows.
DEN_REL_FLOOR = float(os.environ.get("FASTMAX_TPU_PERFORMER_DEN_REL", 0.05))
DEN_FLOOR = float(os.environ.get("FASTMAX_TPU_PERFORMER_DEN_FLOOR", 1e-2))
# belt-and-braces output clip (a softmax-attention output is a convex
# combination of v rows, a few units; 64 is far outside normal range)
OUT_CLIP = float(os.environ.get("FASTMAX_TPU_PERFORMER_OUT_CLIP", 64.0))


def _clamp_den(den, floor):
    sign = jnp.where(den >= 0.0, 1.0, -1.0)
    return sign * jnp.maximum(jnp.abs(den), floor)


def _auto_chunk(chunk: int, n: int) -> int:
    """Scale the chunk length up for long sequences: state read+write per
    chunk is constant, so fewer/larger chunks are strictly less HBM traffic
    until the (B,H,C,C) intra-chunk block dominates. Capped at 512."""
    return min(max(chunk, n // 8), max(chunk, 512))


def _poly_weights(s, p: int):
    """f(s) = 1 + s (+ s^2/2); applied elementwise to a score block."""
    fs = 1.0 + s
    if p == 2:
        fs = fs + 0.5 * s * s
    return fs


# ---------------------------------------------------------------------------
# O(N^2) reference (mirrors fastattention_einops.compute_attn semantics,
# fastmax.py:337-381) — used for parity tests and short sequences.
# ---------------------------------------------------------------------------

def polynomial_attention_reference(q, k, v, p: int = 1, mask: bool = True,
                                   normalize_term: float | None = None):
    """Quadratic-time reference implementation of fastmax attention."""
    d = q.shape[-1]
    z = normalize_term if normalize_term is not None else 8.0 * math.sqrt(d)
    s = jnp.einsum("bhid,bhjd->bhij", q, k) / z
    fs = _poly_weights(s, p)
    if mask:
        n = q.shape[-2]
        causal = jnp.tril(jnp.ones((n, n), dtype=bool))
        fs = jnp.where(causal, fs, 0.0)
    g = jnp.sum(fs, axis=-1, keepdims=True)
    return jnp.einsum("bhij,bhjd->bhid", fs / g, v)


# ---------------------------------------------------------------------------
# Linear-time formulations
# ---------------------------------------------------------------------------

def _unmasked_linear(q, k, v, z: float, p: int):
    """Global-sum formulation (no causal mask): O(N d^2 [+ N d^3 -> matmuls]).

    Mirrors compute_F_unmasked / compute_g_unmasked (fastmax.py:185-216,
    253-285) but with the p=2 term expressed as (N, d^2) x (d^2, d) matmuls.
    q may be shorter than k/v (the KV-cache decode case): each query then
    attends over all keys, and the count term of the denominator uses the
    query length, exactly as the reference does (compute_g_unmasked takes N
    from q.shape, fastmax.py:269-271).
    """
    nq = q.shape[-2]
    # numerator
    f = jnp.sum(v, axis=-2, keepdims=True)                       # (B,H,1,D)
    kv = jnp.einsum("bhnm,bhnj->bhmj", k, v)                     # (B,H,D,D)
    f = f + jnp.einsum("bhim,bhmj->bhij", q, kv) / z
    # denominator
    g = jnp.full(q.shape[:-1], float(nq), dtype=q.dtype)         # (B,H,Nq)
    ksum = jnp.sum(k, axis=-2)                                   # (B,H,D)
    g = g + jnp.einsum("bhil,bhl->bhi", q, ksum) / z
    if p == 2:
        b, h, _, d = q.shape
        nk = k.shape[-2]
        kk = jnp.einsum("bhnm,bhnl->bhnml", k, k).reshape(b, h, nk, d * d)
        qq = jnp.einsum("bhim,bhil->bhiml", q, q).reshape(b, h, nq, d * d)
        kkv = jnp.einsum("bhnx,bhnj->bhxj", kk, v)               # (B,H,D^2,D)
        f = f + jnp.einsum("bhix,bhxj->bhij", qq, kkv) / (2.0 * z * z)
        kksum = jnp.sum(kk, axis=-2)                             # (B,H,D^2)
        g = g + jnp.einsum("bhix,bhx->bhi", qq, kksum) / (2.0 * z * z)
    return f / g[..., None]


def _masked_chunked(q, k, v, z: float, p: int, chunk: int, return_state: bool = False):
    """Causal chunked prefix-scan formulation.

    Carried state per (batch, head):
      cnt            running token count            (scalar)
      s_v   (D,)     sum of v
      s_kv  (D, D)   sum of k (x) v
      s_k   (D,)     sum of k
      p=2 adds:
      s_kkv (D^2, D) sum of (k (x) k) (x) v
      s_kk  (D^2,)   sum of k (x) k
    """
    b, h, n, d = q.shape
    c = min(chunk, n)
    n_pad = (-n) % c
    if n_pad:
        pad = [(0, 0), (0, 0), (0, n_pad), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    n_chunks = (n + n_pad) // c

    # (B,H,nc,C,D) -> scan over nc with (B,H) folded into the batch of each matmul
    def to_chunks(x):
        return x.reshape(b, h, n_chunks, c, d).transpose(2, 0, 1, 3, 4)

    qc, kc, vc = to_chunks(q), to_chunks(k), to_chunks(v)

    causal = jnp.tril(jnp.ones((c, c), dtype=bool))
    # local position within chunk, for the count term of g
    local_count = jnp.arange(1, c + 1, dtype=jnp.float32)

    def step(state, inputs):
        qi, ki, vi = inputs  # each (B,H,C,D)
        cnt, s_v, s_kv, s_k, s_kkv, s_kk = state

        # ---- intra-chunk: dense polynomial attention on the C x C block
        s = jnp.einsum("bhid,bhjd->bhij", qi, ki) / z
        fs = jnp.where(causal, _poly_weights(s, p), 0.0)
        f_intra = jnp.einsum("bhij,bhjd->bhid", fs, vi)
        g_intra = jnp.sum(fs, axis=-1)                            # (B,H,C)

        # ---- inter-chunk: contributions of all previous chunks via state
        f_inter = s_v[:, :, None, :] + jnp.einsum("bhim,bhmj->bhij", qi, s_kv) / z
        g_inter = cnt[:, :, None] + jnp.einsum("bhim,bhm->bhi", qi, s_k) / z
        # the "+1" count of previous tokens is in cnt; intra-chunk count is in
        # g_intra via the masked f(s) ones.

        if p == 2:
            qq = jnp.einsum("bhim,bhil->bhiml", qi, qi).reshape(b, h, c, d * d)
            f_inter = f_inter + jnp.einsum("bhix,bhxj->bhij", qq, s_kkv) / (2.0 * z * z)
            g_inter = g_inter + jnp.einsum("bhix,bhx->bhi", qq, s_kk) / (2.0 * z * z)

        o = (f_intra + f_inter) / (g_intra + g_inter)[..., None]

        # ---- state update
        cnt = cnt + c
        s_v = s_v + jnp.sum(vi, axis=-2)
        s_kv = s_kv + jnp.einsum("bhnm,bhnj->bhmj", ki, vi)
        s_k = s_k + jnp.sum(ki, axis=-2)
        if p == 2:
            kk = jnp.einsum("bhnm,bhnl->bhnml", ki, ki).reshape(b, h, c, d * d)
            s_kkv = s_kkv + jnp.einsum("bhnx,bhnj->bhxj", kk, vi)
            s_kk = s_kk + jnp.sum(kk, axis=-2)
        return (cnt, s_v, s_kv, s_k, s_kkv, s_kk), o

    f32 = jnp.float32
    state0 = (
        jnp.zeros((b, h), f32),
        jnp.zeros((b, h, d), f32),
        jnp.zeros((b, h, d, d), f32),
        jnp.zeros((b, h, d), f32),
        jnp.zeros((b, h, d * d, d), f32) if p == 2 else jnp.zeros((b, h, 1, 1), f32),
        jnp.zeros((b, h, d * d), f32) if p == 2 else jnp.zeros((b, h, 1), f32),
    )
    final, o = jax.lax.scan(step, state0, (qc, kc, vc))
    o = o.transpose(1, 2, 0, 3, 4).reshape(b, h, n + n_pad, d)
    o = o[:, :, :n, :]
    if not return_state:
        return o
    # padded tail tokens are zeros: they inflate only cnt — correct it
    cnt, s_v, s_kv, s_k, s_kkv, s_kk = final
    cnt = cnt - float(n_pad)
    # NOTE: zero k/v also add f(0)=1-weighted zero contributions to s_kkv et
    # al (outer products of zeros are zero), so only cnt needs fixing.
    state = {"cnt": cnt, "s_v": s_v, "s_kv": s_kv, "s_k": s_k,
             "s_kkv": s_kkv, "s_kk": s_kk}
    return o, state


# ---------------------------------------------------------------------------
# Memory-efficient custom VJP for the masked chunked scan.
#
# Autodiff through lax.scan stores every chunk's carried state
# (O(N/C * d^3) for p=2 — the same blowup that pushed the reference to a
# CUDA kernel). The state update is ADDITIVE, hence reversible:
# S_{c-1} = S_c - U(k_c, v_c). The backward pass walks chunks in reverse
# carrying (S, dS), rebuilding each previous state by subtraction and
# applying the per-chunk VJP — total extra memory O(d^3), the reference's
# reverse-cumsum trick (fastmax.py:562-567) done without any cumsum buffers.
# ---------------------------------------------------------------------------


def _chunk_forward(qi, ki, vi, state, z, p, causal, local_count):
    """One chunk's output + updated state (shared by fwd and the bwd VJP).

    qi/ki/vi: (B, H, C, D); state: the running-sum tuple.
    """
    b, h, c, d = qi.shape
    cnt, s_v, s_kv, s_k, s_kkv, s_kk = state
    s = jnp.einsum("bhid,bhjd->bhij", qi, ki) / z
    fs = jnp.where(causal, _poly_weights(s, p), 0.0)
    f_acc = jnp.einsum("bhij,bhjd->bhid", fs, vi)
    g_acc = jnp.sum(fs, axis=-1)
    f_acc = f_acc + s_v[:, :, None, :] + jnp.einsum("bhim,bhmj->bhij", qi, s_kv) / z
    g_acc = g_acc + cnt[:, :, None] + jnp.einsum("bhim,bhm->bhi", qi, s_k) / z
    if p == 2:
        qq = jnp.einsum("bhim,bhil->bhiml", qi, qi).reshape(b, h, c, d * d)
        f_acc = f_acc + jnp.einsum("bhix,bhxj->bhij", qq, s_kkv) / (2.0 * z * z)
        g_acc = g_acc + jnp.einsum("bhix,bhx->bhi", qq, s_kk) / (2.0 * z * z)
    o = f_acc / g_acc[..., None]
    new_state = _state_add(state, _chunk_update(ki, vi, p), 1.0)
    return o, new_state


def _chunk_update(ki, vi, p):
    b, h, c, d = ki.shape
    upd = (
        jnp.full((b, h), float(c), jnp.float32),
        jnp.sum(vi, axis=-2),
        jnp.einsum("bhnm,bhnj->bhmj", ki, vi),
        jnp.sum(ki, axis=-2),
    )
    if p == 2:
        kk = jnp.einsum("bhnm,bhnl->bhnml", ki, ki).reshape(b, h, c, d * d)
        upd = upd + (jnp.einsum("bhnx,bhnj->bhxj", kk, vi), jnp.sum(kk, axis=-2))
    else:
        upd = upd + (jnp.zeros((b, h, 1, 1), jnp.float32), jnp.zeros((b, h, 1), jnp.float32))
    return upd


def _state_add(a, b_, sign):
    return tuple(x + sign * y for x, y in zip(a, b_))


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _masked_chunked_vjp(q, k, v, z, p, chunk):
    return _masked_chunked(q, k, v, z, p, chunk)


def _mcv_fwd(q, k, v, z, p, chunk):
    # one scan produces both the outputs and the final state
    o, sd = _masked_chunked(q, k, v, z, p, chunk, return_state=True)
    state = (sd["cnt"], sd["s_v"], sd["s_kv"], sd["s_k"], sd["s_kkv"], sd["s_kk"])
    return o, (q, k, v, state)


def _mcv_bwd(z, p, chunk, res, do):
    q, k, v, final_state = res
    b, h, n, d = q.shape
    c = min(chunk, n)
    n_pad = (-n) % c
    if n_pad:
        pad = [(0, 0), (0, 0), (0, n_pad), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        do = jnp.pad(do, pad)
        # the stored final state already counts only real tokens; padded
        # zero-token updates are zero except cnt, which we re-inflate so the
        # reverse subtraction walks the same sequence of states
        final_state = (final_state[0] + float(n_pad),) + tuple(final_state[1:])
    n_chunks = (n + n_pad) // c

    def to_chunks(x):
        return x.reshape(b, h, n_chunks, c, d).transpose(2, 0, 1, 3, 4)

    qc, kc, vc, doc = (to_chunks(x) for x in (q, k, v, do))
    causal = jnp.tril(jnp.ones((c, c), dtype=bool))

    def fwd_of_chunk(qi, ki, vi, state_prev):
        o, _ = _chunk_forward(qi, ki, vi, state_prev, z, p, causal, None)
        return o

    def step(carry, inputs):
        state_cur, d_state = carry  # state AFTER this chunk; dL/dS_cur
        qi, ki, vi, doi = inputs
        upd = _chunk_update(ki, vi, p)
        state_prev = _state_add(state_cur, upd, -1.0)

        # vjp through this chunk's output wrt (q, k, v, state_prev)
        _, vjp_fn = jax.vjp(fwd_of_chunk, qi, ki, vi, state_prev)
        dqi, dki, dvi, d_state_from_o = vjp_fn(doi)

        # vjp of the state update S_cur = S_prev + U(k, v): U's contribution
        def upd_fn(ki_, vi_):
            return _chunk_update(ki_, vi_, p)

        _, vjp_u = jax.vjp(upd_fn, ki, vi)
        dki_u, dvi_u = vjp_u(d_state)
        dki = dki + dki_u
        dvi = dvi + dvi_u
        d_state_prev = _state_add(d_state, d_state_from_o, 1.0)
        return (state_prev, d_state_prev), (dqi, dki, dvi)

    zero_dstate = tuple(jnp.zeros_like(s) for s in final_state)
    (_, _), (dq_c, dk_c, dv_c) = jax.lax.scan(
        step, (final_state, zero_dstate),
        (qc, kc, vc, doc), reverse=True,
    )

    def from_chunks(x):
        return x.transpose(1, 2, 0, 3, 4).reshape(b, h, n + n_pad, d)[:, :, :n, :]

    return from_chunks(dq_c), from_chunks(dk_c), from_chunks(dv_c)


_masked_chunked_vjp.defvjp(_mcv_fwd, _mcv_bwd)


def _auto_head_groups(b: int, h: int, d: int, p: int,
                      limit_bytes: int | None = None) -> int:
    """Head-group count bounding one group's p=2 scan-state working set.

    The masked scan (and its reversible backward) is independent per
    (batch, head); its p=2 carried state is b*h*d^3 f32 and the backward
    holds several transient copies of it per chunk step. Splitting the head
    axis into sequentially-processed groups (lax.map) caps the working set
    at ~limit_bytes per state instance without changing any math — this is
    what lets fastmax p=2 train at large batch on a 16 GB chip instead of
    exhausting HBM. Returns a divisor of h. The 64 MB default is
    env-overridable (FASTMAX_TPU_HEADGROUP_LIMIT, bytes)."""
    if limit_bytes is None:
        import os

        limit_bytes = int(os.environ.get("FASTMAX_TPU_HEADGROUP_LIMIT", 64 * 2**20))
    if p != 2:
        return 1
    state_bytes = b * h * d * d * d * 4
    if state_bytes <= limit_bytes:
        return 1
    groups = min(h, -(-state_bytes // limit_bytes))
    while h % groups:
        groups += 1
    return groups


# masked-fastmax implementation: "scan" (lax.scan + reversible-state custom
# VJP — XLA-level) or "pallas" (fused fwd+bwd kernels with the d^3 state
# VMEM-resident, ops/fastmax_pallas.py). Default (r03, measured): pallas on
# TPU — in-model p=2 bs16 trains at 16-20% MFU with no faults vs the scan's
# 7% (16-way head-group serialization of its 537 MB HBM state) and two
# TPU-worker crashes in the same process-isolated A/B
# (bench_results/fastmax_ab_r03.jsonl); scan elsewhere (CPU Pallas would
# run interpreted). Env-overridable; None = resolve per-backend at call.
FASTMAX_IMPL = os.environ.get("FASTMAX_TPU_FASTMAX_IMPL") or None


def _resolve_impl() -> str:
    if FASTMAX_IMPL:
        return FASTMAX_IMPL
    return "pallas" if jax.default_backend() == "tpu" else "scan"


def _masked_pallas(q, k, v, z, p: int, chunk: int):
    """Route the masked path through the fused Pallas kernel pair. The
    normalizer is folded via normalize_term = z/sqrt(d); sequences are
    padded up to a chunk multiple. Padding correctness relies on the pad
    being TAIL-only under the causal mask: padded rows do feed the count
    normalizer `cnt` of later chunks, but no real token sits after them,
    so no real row's output is affected (the padded rows themselves are
    sliced off on return)."""
    from .fastmax_pallas import fastmax_pallas_trainable

    n = q.shape[-2]
    # chunk must stay sublane-aligned: clamp to a multiple of 128 (never
    # n itself, which may be ragged — e.g. chunk=256 with n=130 must not
    # yield a 130-row chunk Mosaic would reject or pad poorly)
    c = min(chunk, max(128, ((n + 127) // 128) * 128))
    c = max(128, (c // 128) * 128)
    n_pad = (-n) % c
    if n_pad:
        pad = [(0, 0), (0, 0), (0, n_pad), (0, 0)]
        q, k, v = (jnp.pad(x, pad) for x in (q, k, v))
    d = q.shape[-1]
    interpret = jax.default_backend() != "tpu"
    o = fastmax_pallas_trainable(q, k, v, p, z / math.sqrt(d), c, interpret)
    return o[:, :, :n, :]


def _masked_grouped(q, k, v, z, p: int, chunk: int, head_group):
    """Masked fastmax, optionally mapped over head groups (see above)."""
    b, h, n, d = q.shape
    if FASTMAX_IMPL == "pallas" and d <= 64:
        # VMEM-resident state: no head-grouping needed (the d^3 state never
        # touches HBM, so the working-set cap that motivates grouping on the
        # scan path does not apply)
        return _masked_pallas(q, k, v, z, p, chunk)
    groups = head_group if head_group else _auto_head_groups(b, h, d, p)
    if groups <= 1:
        return _masked_chunked_vjp(q, k, v, z, p, chunk)
    if h % groups:
        raise ValueError(f"head_group {groups} must divide n_head {h}")
    hg = h // groups

    def split(x):
        return x.reshape(b, groups, hg, n, d).transpose(1, 0, 2, 3, 4)

    def gfn(xs):
        qg, kg, vg = xs
        return _masked_chunked_vjp(qg, kg, vg, z, p, chunk)

    o = jax.lax.map(gfn, (split(q), split(k), split(v)))
    return o.transpose(1, 0, 2, 3, 4).reshape(b, h, n, d)


@partial(jax.jit, static_argnames=("mask", "normalize_term", "tensors_normalized",
                                   "p", "chunk", "head_group", "impl"))
def _fastmax_jit(q, k, v, mask, normalize_term, tensors_normalized, p, chunk,
                 head_group, impl):
    if p not in (1, 2):
        raise ValueError(f"p should be 1 or 2, got p={p}")
    dtype = q.dtype
    d = q.shape[-1]
    z = 1.0 if tensors_normalized else float(normalize_term) * math.sqrt(d)
    if mask and impl == "pallas" and d <= 64:
        # route BEFORE the f32 upcast: the kernel keys its pairwise-matmul
        # operand precision off the input dtype (bf16 in-model = 2x MXU
        # rate on the dominant (C, D^2) matmuls; accumulation stays f32)
        return _masked_pallas(q, k, v, z, p, _auto_chunk(chunk, q.shape[-2]))
    q, k, v = (x.astype(jnp.float32) for x in (q, k, v))
    if mask:
        # custom VJP: reversible-state backward, O(d^3) memory (see above)
        o = _masked_grouped(q, k, v, z, p, _auto_chunk(chunk, q.shape[-2]), head_group)
    else:
        o = _unmasked_linear(q, k, v, z, p)
    return o.astype(dtype)


def fastmax(q, k, v, mask: bool = True, normalize_term: float = 8.0,
            tensors_normalized: bool = False, p: int = 1,
            chunk: int = DEFAULT_CHUNK, head_group: int | None = None):
    """Fastmax polynomial linear attention (API parity: fastmax.py:7-27).

    ``normalize_term`` is multiplied by sqrt(D) unless ``tensors_normalized``,
    matching the reference's forward (fastmax.py:78-82). Computation runs in
    float32 and the result is cast back to the input dtype.

    ``head_group``: number of sequentially-processed head groups for the
    masked p=2 path (None = auto-sized to bound the d^3 scan-state working
    set; 1 = process all heads at once).

    The FASTMAX_IMPL backend choice is resolved HERE, outside jit, and
    passed down as a static argument: it used to be read inside the jitted
    body, where the first trace was cached by shape and silently pinned
    the backend for every later call — r03's in-model scan-vs-pallas
    comparisons initially measured the same executable twice because of
    exactly this.
    """
    return _fastmax_jit(q, k, v, mask, normalize_term, tensors_normalized,
                        p, chunk, head_group, _resolve_impl())


def _hack_normalize(q, k):
    """Mean-center the channel dim and scale by the max per-(B,H) token norm.

    Mirrors fastmax_hack.py:38-43 (and fastattention_einops.normalize,
    fastmax.py:327-334).
    """
    q = q - jnp.mean(q, axis=-1, keepdims=True)
    k = k - jnp.mean(k, axis=-1, keepdims=True)
    qn = jnp.sqrt(jnp.sum(q * q, axis=-1))
    kn = jnp.sqrt(jnp.sum(k * k, axis=-1))
    q = q / jnp.max(qn, axis=-1)[..., None, None]
    k = k / jnp.max(kn, axis=-1)[..., None, None]
    return q, k


@partial(jax.jit, static_argnames=("p", "mask", "chunk"))
def linearmax(q, k, v, p: int = 1, mask: bool = True, chunk: int = DEFAULT_CHUNK):
    """The reference's ``fastmax_hack`` / linearmax path (fastmax_hack.py:5-60):

    q/k are mean-centered and normalized by the max token norm, then degree-p
    polynomial attention with normalize_term=1 is applied.
    """
    dtype = q.dtype
    q, k, v = (x.astype(jnp.float32) for x in (q, k, v))
    q, k = _hack_normalize(q, k)
    if mask:
        o = _masked_chunked(q, k, v, 1.0, p, _auto_chunk(chunk, q.shape[-2]))
    else:
        o = _unmasked_linear(q, k, v, 1.0, p)
    return o.astype(dtype)


@partial(jax.jit, static_argnames=("chunk",))
def performer(q, k, v, eps: float = 1e-6, chunk: int = DEFAULT_CHUNK,
              den_floor: float = DEN_FLOOR):
    """Causal dot-product linear attention as used by the reference's
    ``performer`` branch (lit_gpt/model.py:534-567): numerator is the causal
    cumulative sum of (q_i . k_j) v_j (the fast-transformers CausalDotProduct
    CUDA kernel), denominator is q_i . (cumsum(k)_i + eps).

    Implemented as the same chunked prefix scan with state (sum k (x) v),
    in f32 throughout. Unlike the reference, the denominator is clamped to
    +-den_floor with its sign preserved: q . cumsum(k) is an UNSIGNED inner
    product of raw (not positive-feature-mapped) vectors, so it crosses
    zero for real activations — the reference's eps only shifts it, and a
    near-zero crossing overflows 1/den (and its gradient), the r03 NaN at
    bench scale. The clamp is inactive away from the singularity, so
    parity with the reference formula holds everywhere it is finite.
    """
    dtype = q.dtype
    q, k, v = (x.astype(jnp.float32) for x in (q, k, v))
    b, h, n, d = q.shape
    c = min(chunk, n)
    n_pad = (-n) % c
    if n_pad:
        pad = [(0, 0), (0, 0), (0, n_pad), (0, 0)]
        q, k, v = (jnp.pad(x, pad) for x in (q, k, v))
    n_chunks = (n + n_pad) // c

    def to_chunks(x):
        return x.reshape(b, h, n_chunks, c, d).transpose(2, 0, 1, 3, 4)

    qc, kc, vc = to_chunks(q), to_chunks(k), to_chunks(v)
    causal = jnp.tril(jnp.ones((c, c), dtype=bool))

    def step(state, inputs):
        qi, ki, vi = inputs
        s_kv, s_k = state
        s = jnp.where(causal, jnp.einsum("bhid,bhjd->bhij", qi, ki), 0.0)
        num = jnp.einsum("bhij,bhjd->bhid", s, vi)
        num = num + jnp.einsum("bhim,bhmj->bhij", qi, s_kv)
        k_cum = s_k[:, :, None, :] + jnp.cumsum(ki, axis=-2)
        den = jnp.einsum("bhnd,bhnd->bhn", qi, k_cum + eps)
        qn = jnp.sqrt(jnp.sum(qi * qi, axis=-1))
        kn = jnp.sqrt(jnp.sum((k_cum + eps) ** 2, axis=-1))
        floor = jnp.maximum(DEN_REL_FLOOR * qn * kn, den_floor)
        o = num / _clamp_den(den, floor)[..., None]
        o = jnp.clip(o, -OUT_CLIP, OUT_CLIP)
        s_kv = s_kv + jnp.einsum("bhnm,bhnj->bhmj", ki, vi)
        s_k = s_k + jnp.sum(ki, axis=-2)
        return (s_kv, s_k), o

    state0 = (jnp.zeros((b, h, d, d), jnp.float32), jnp.zeros((b, h, d), jnp.float32))
    _, o = jax.lax.scan(step, state0, (qc, kc, vc))
    o = o.transpose(1, 2, 0, 3, 4).reshape(b, h, n + n_pad, d)
    return o[:, :, :n, :].astype(dtype)


# ---------------------------------------------------------------------------
# O(1)-state decode: the TPU-native replacement for running linear attention
# over a dense KV cache during autoregressive decoding.
#
# Design note: during decode the reference ran the UNMASKED global-sum
# formula over the full zero-padded KV buffer (model.py:463-487), whose
# denominator counts only the query length — a train/inference semantic
# mismatch. Here decode continues the exact masked/causal math of the
# prefill via a running state, at O(1) per token instead of O(S).
# ---------------------------------------------------------------------------


def fastmax_prefill_state(q, k, v, *, p: int, normalize_term: float = 8.0,
                          tensors_normalized: bool = False,
                          chunk: int = DEFAULT_CHUNK):
    """Masked fastmax over a prompt, returning (output, running state) for
    recurrent decode. State normalizers: see `z_of`."""
    dtype = q.dtype
    q, k, v = (x.astype(jnp.float32) for x in (q, k, v))
    d = q.shape[-1]
    z = 1.0 if tensors_normalized else float(normalize_term) * math.sqrt(d)
    o, state = _masked_chunked(q, k, v, z, p, chunk, return_state=True)
    return o.astype(dtype), state


def linearmax_prefill_state(q, k, v, *, p: int = 1, chunk: int = DEFAULT_CHUNK):
    """linearmax prefill with state. The hack's q/k normalization divides by
    the max token norm over the WHOLE sequence (fastmax_hack.py:38-43) — an
    acausal statistic. For decode we freeze the normalizers measured on the
    prompt (stored in the state as q_div/k_div) and keep using them for new
    tokens: causal, and identical to the reference on the prompt itself."""
    dtype = q.dtype
    q, k, v = (x.astype(jnp.float32) for x in (q, k, v))
    q = q - jnp.mean(q, axis=-1, keepdims=True)
    k = k - jnp.mean(k, axis=-1, keepdims=True)
    qn = jnp.sqrt(jnp.sum(q * q, axis=-1))
    kn = jnp.sqrt(jnp.sum(k * k, axis=-1))
    q_div = jnp.maximum(jnp.max(qn, axis=-1), 1e-6)  # (B, H)
    k_div = jnp.maximum(jnp.max(kn, axis=-1), 1e-6)
    q = q / q_div[..., None, None]
    k = k / k_div[..., None, None]
    o, state = _masked_chunked(q, k, v, 1.0, p, chunk, return_state=True)
    state["q_div"] = q_div
    state["k_div"] = k_div
    return o.astype(dtype), state


def linearmax_decode_step(state, q, k, v, p: int = 1):
    """One linearmax decode step using the frozen prompt normalizers."""
    q = q.astype(jnp.float32)
    k = k.astype(jnp.float32)
    q = (q - jnp.mean(q, axis=-1, keepdims=True)) / state["q_div"][..., None]
    k = (k - jnp.mean(k, axis=-1, keepdims=True)) / state["k_div"][..., None]
    core = {key: state[key] for key in ("cnt", "s_v", "s_kv", "s_k", "s_kkv", "s_kk")}
    core, o = linear_attn_decode_step(core, q, k, v, 1.0, p)
    new_state = dict(core)
    new_state["q_div"] = state["q_div"]
    new_state["k_div"] = state["k_div"]
    return new_state, o


def performer_prefill_state(q, k, v, eps: float = 1e-6, chunk: int = DEFAULT_CHUNK):
    """Causal performer over a prompt, returning (output, state)."""
    dtype = q.dtype
    o = performer(q, k, v, eps=eps, chunk=chunk)
    k32 = k.astype(jnp.float32)
    v32 = v.astype(jnp.float32)
    state = {
        "s_kv": jnp.einsum("bhnm,bhnj->bhmj", k32, v32),
        "s_k": jnp.sum(k32, axis=-2),
    }
    return o.astype(dtype), state


def performer_decode_step(state, q, k, v, eps: float = 1e-6,
                          den_floor: float = DEN_FLOOR):
    q, k, v = (x.astype(jnp.float32) for x in (q, k, v))
    s_kv = state["s_kv"] + k[..., :, None] * v[..., None, :]
    s_k = state["s_k"] + k
    num = jnp.einsum("bhm,bhmj->bhj", q, s_kv)
    den = jnp.einsum("bhm,bhm->bh", q, s_k + eps)
    qn = jnp.sqrt(jnp.sum(q * q, axis=-1))
    kn = jnp.sqrt(jnp.sum((s_k + eps) ** 2, axis=-1))
    floor = jnp.maximum(DEN_REL_FLOOR * qn * kn, den_floor)
    o = jnp.clip(num / _clamp_den(den, floor)[..., None],
                 -OUT_CLIP, OUT_CLIP)
    return {"s_kv": s_kv, "s_k": s_k}, o

def linear_attn_state_init(batch: int, heads: int, d: int, p: int):
    """Zero running state for recurrent fastmax decode."""
    f32 = jnp.float32
    d2 = d * d if p == 2 else 1
    return {
        "cnt": jnp.zeros((batch, heads), f32),
        "s_v": jnp.zeros((batch, heads, d), f32),
        "s_kv": jnp.zeros((batch, heads, d, d), f32),
        "s_k": jnp.zeros((batch, heads, d), f32),
        "s_kkv": jnp.zeros((batch, heads, d2, d), f32),
        "s_kk": jnp.zeros((batch, heads, d2), f32),
    }


def linear_attn_decode_step(state, q, k, v, z: float, p: int):
    """One causal decode step: absorb (k, v), emit attention output for q.

    q, k, v: (B, H, D) for the new token. Returns (state, o) with o (B, H, D).
    Mathematically identical to the masked fastmax formula at position cnt.
    """
    b, h, d = q.shape
    q, k, v = (x.astype(jnp.float32) for x in (q, k, v))
    # absorb the new key/value first (causal: token attends to itself)
    cnt = state["cnt"] + 1.0
    s_v = state["s_v"] + v
    s_kv = state["s_kv"] + k[..., :, None] * v[..., None, :]
    s_k = state["s_k"] + k
    f = s_v + jnp.einsum("bhm,bhmj->bhj", q, s_kv) / z
    g = cnt + jnp.einsum("bhm,bhm->bh", q, s_k) / z
    if p == 2:
        kk = (k[..., :, None] * k[..., None, :]).reshape(b, h, d * d)
        qq = (q[..., :, None] * q[..., None, :]).reshape(b, h, d * d)
        s_kkv = state["s_kkv"] + kk[..., :, None] * v[..., None, :]
        s_kk = state["s_kk"] + kk
        f = f + jnp.einsum("bhx,bhxj->bhj", qq, s_kkv) / (2.0 * z * z)
        g = g + jnp.einsum("bhx,bhx->bh", qq, s_kk) / (2.0 * z * z)
    else:
        s_kkv, s_kk = state["s_kkv"], state["s_kk"]
    o = f / g[..., None]
    new_state = {"cnt": cnt, "s_v": s_v, "s_kv": s_kv, "s_k": s_k,
                 "s_kkv": s_kkv, "s_kk": s_kk}
    return new_state, o
