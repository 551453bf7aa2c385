"""Memory-efficient (blockwise / flash-style) causal attention with a
custom VJP — trainable long-context attention.

SURVEY.md §5 notes the reference has "no blockwise attention"; its training
path materializes full (H, T, S) score tensors. This implements causal
attention as a **statically-unrolled loop over query blocks**, each block
attending to its causally-sliced key prefix ``k[:, :, :(i+1)*block]``:

* exactly-causal FLOPs and score traffic — block pairs above the diagonal
  are never computed (the dense path and an online-softmax key-block scan
  both spend the full T*S rectangle);
* every slice size is static, so there are no device loops at all — each
  query block is one einsum -> softmax -ize -> einsum chain that XLA fuses
  and pipelines (on TPU this XLA-native formulation beats a hand-written
  Pallas kernel wherever Pallas DMA underperforms — see ops/quant.py);
* no online-softmax recurrence: a query block sees its whole key prefix at
  once, so softmax stats are single-pass and there is no (B,H,T,D) f32
  accumulator being re-read per key block;
* probabilities are cast to the value dtype (bf16 in training) for the AV
  and dk/dv matmuls — halves the biggest HBM term; softmax statistics stay
  f32.

Live memory is O(T * block) per unrolled step plus the saved (out, lse),
the flash-attention residual layout.

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


def _prefix_mask(block: int, kl: int, q0: int):
    """(block, kl) causal mask for query rows q0..q0+block over keys 0..kl."""
    qpos = q0 + jnp.arange(block)[:, None]
    kpos = jnp.arange(kl)[None, :]
    return kpos <= qpos


def _forward(q, k, v, scale: float, block: int):
    """Returns (out, lse). q: (B,H,T,D); k/v: (B,H,S,D) (pre-expanded)."""
    b, h, t, d = q.shape
    nq = t // block
    outs, lses = [], []
    for i in range(nq):
        kl = (i + 1) * block
        qi = q[:, :, i * block : kl]
        s = jnp.einsum(
            "bhid,bhjd->bhij", qi, k[:, :, :kl], preferred_element_type=jnp.float32
        ) * scale
        s = jnp.where(_prefix_mask(block, kl, i * block)[None, None], s, NEG_INF)
        m = jnp.max(s, axis=-1)
        p = jnp.exp(s - m[..., None]).astype(v.dtype)
        l = jnp.sum(p, axis=-1, dtype=jnp.float32)
        o = jnp.einsum(
            "bhij,bhjd->bhid", p, v[:, :, :kl],
            preferred_element_type=jnp.float32,
        )
        outs.append((o / l[..., None]).astype(q.dtype))
        lses.append(m + jnp.log(l))
    return jnp.concatenate(outs, axis=2), jnp.concatenate(lses, axis=2)


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
    # named so remat="attn" (models/gpt._remat_wrap) can save exactly these
    # residuals: the backward then reuses (out, lse) instead of re-running
    # the whole attention forward inside the rematted block
    from jax.ad_checkpoint import checkpoint_name

    return out, (q, k, v, checkpoint_name(out, "attn_out"), checkpoint_name(lse, "attn_lse"))


def _bwd(scale, block, res, do):
    q, k, v, out, lse = res
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    b, h, t, d = q.shape
    nq = t // block
    # D_i = rowsum(dout * out), the softmax-backward correction term
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)

    dqs = []
    dk = jnp.zeros(k.shape, jnp.float32)
    dv = jnp.zeros(v.shape, jnp.float32)
    for i in range(nq):
        q0, kl = i * block, (i + 1) * block
        qi = q[:, :, q0:kl]
        doi = do[:, :, q0:kl]
        s = jnp.einsum(
            "bhid,bhjd->bhij", qi, k[:, :, :kl], preferred_element_type=jnp.float32
        ) * scale
        mask = _prefix_mask(block, kl, q0)[None, None]
        p = jnp.where(mask, jnp.exp(s - lse[:, :, q0:kl, None]), 0.0)
        dp = jnp.einsum(
            "bhid,bhjd->bhij", doi, v[:, :, :kl], preferred_element_type=jnp.float32
        )
        ds = (p * (dp - delta[:, :, q0:kl, None])).astype(q.dtype)
        pc = p.astype(q.dtype)
        dqi = jnp.einsum(
            "bhij,bhjd->bhid", ds, k[:, :, :kl], preferred_element_type=jnp.float32
        ) * scale
        dki = jnp.einsum(
            "bhij,bhid->bhjd", ds, qi, preferred_element_type=jnp.float32
        ) * scale
        dvi = jnp.einsum(
            "bhij,bhid->bhjd", pc, doi, preferred_element_type=jnp.float32
        )
        dqs.append(dqi)
        dk = dk.at[:, :, :kl].add(dki)
        dv = dv.at[:, :, :kl].add(dvi)
    dq = jnp.concatenate(dqs, axis=2)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


blockwise_attention.defvjp(_fwd, _bwd)
