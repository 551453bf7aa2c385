"""Memory-efficient (blockwise / flash-style) causal attention with a
custom VJP — trainable long-context attention.

SURVEY.md §5 notes the reference has "no blockwise attention"; its training
path materializes full (H, T, S) score tensors. This implements the
flash-attention recurrence as blockwise ``lax.scan``s in XLA (the
formulation this platform executes at full bandwidth — see the Pallas DMA
note in ops/quant.py), with the standard two-pass backward:

  forward:  online softmax over key blocks; saves (out, lse) only —
            O(T * BK) live memory instead of O(T * S).
  backward: D = rowsum(do * o); per key block recompute p = exp(s - lse),
            ds = p * (do @ v^T - D); accumulate dq, dk, dv.

The Pallas forward kernel (ops/flash_attention.py) shares the math; this
module is the autodiff-capable path used by training at long sequence
lengths (ops/attention.py gates on T).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp

DEFAULT_BLOCK = 512
NEG_INF = -1e30


def _causal_mask(tq: int, tk: int, q0, k0):
    qpos = q0 + jnp.arange(tq)[:, None]
    kpos = k0 + jnp.arange(tk)[None, :]
    return kpos <= qpos


def _forward(q, k, v, scale: float, block: int):
    """Returns (out, lse). q: (B,H,T,D); k/v: (B,H,S,D) (pre-expanded)."""
    b, h, t, d = q.shape
    s_len = k.shape[2]
    nb = s_len // block
    q32 = q.astype(jnp.float32)

    kb = k.reshape(b, h, nb, block, d).transpose(2, 0, 1, 3, 4)
    vb = v.reshape(b, h, nb, block, d).transpose(2, 0, 1, 3, 4)

    def step(carry, inputs):
        m, l, acc = carry
        (kj, vj, j) = inputs
        s = jnp.einsum("bhid,bhjd->bhij", q32, kj.astype(jnp.float32),
                       preferred_element_type=jnp.float32) * scale
        mask = _causal_mask(t, block, 0, j * block)
        s = jnp.where(mask[None, None], s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        p = jnp.exp(s - m_new[..., None])
        p = jnp.where(mask[None, None], p, 0.0)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1)
        acc = acc * alpha[..., None] + jnp.einsum(
            "bhij,bhjd->bhid", p, vj.astype(jnp.float32))
        return (m_new, l, acc), None

    m0 = jnp.full((b, h, t), NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, h, t), jnp.float32)
    a0 = jnp.zeros((b, h, t, d), jnp.float32)
    (m, l, acc), _ = jax.lax.scan(step, (m0, l0, a0), (kb, vb, jnp.arange(nb)))
    l_safe = jnp.where(l == 0.0, 1.0, l)
    out = (acc / l_safe[..., None]).astype(q.dtype)
    lse = m + jnp.log(l_safe)
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def blockwise_attention(q, k, v, scale: Optional[float] = None, block: int = DEFAULT_BLOCK):
    """Causal attention, O(T*block) memory, differentiable.

    q: (B, H, T, D); k, v: (B, H, S, D) with T == S (training path;
    k/v must be pre-expanded to full head count). S % block == 0.
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    out, _ = _forward(q, k, v, scale, block)
    return out


def _fwd(q, k, v, scale, block):
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    out, lse = _forward(q, k, v, scale, block)
    return out, (q, k, v, out, lse)


def _bwd(scale, block, res, do):
    q, k, v, out, lse = res
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    b, h, t, d = q.shape
    nb = t // block
    q32, do32 = q.astype(jnp.float32), do.astype(jnp.float32)
    delta = jnp.sum(do32 * out.astype(jnp.float32), axis=-1)  # (B,H,T)

    kb = k.reshape(b, h, nb, block, d).transpose(2, 0, 1, 3, 4)
    vb = v.reshape(b, h, nb, block, d).transpose(2, 0, 1, 3, 4)

    def step(dq, inputs):
        kj, vj, j = inputs
        s = jnp.einsum("bhid,bhjd->bhij", q32, kj.astype(jnp.float32),
                       preferred_element_type=jnp.float32) * scale
        mask = _causal_mask(t, block, 0, j * block)
        p = jnp.where(mask[None, None], jnp.exp(s - lse[..., None]), 0.0)
        dp = jnp.einsum("bhid,bhjd->bhij", do32, vj.astype(jnp.float32))
        ds = p * (dp - delta[..., None])
        dq = dq + jnp.einsum("bhij,bhjd->bhid", ds, kj.astype(jnp.float32)) * scale
        dkj = jnp.einsum("bhij,bhid->bhjd", ds, q32) * scale
        dvj = jnp.einsum("bhij,bhid->bhjd", p, do32)
        return dq, (dkj, dvj)

    dq0 = jnp.zeros_like(q32)
    dq, (dk_blocks, dv_blocks) = jax.lax.scan(step, dq0, (kb, vb, jnp.arange(nb)))
    dk = dk_blocks.transpose(1, 2, 0, 3, 4).reshape(b, h, t, d)
    dv = dv_blocks.transpose(1, 2, 0, 3, 4).reshape(b, h, t, d)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


blockwise_attention.defvjp(_fwd, _bwd)
