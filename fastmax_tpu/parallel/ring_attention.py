"""Ring attention: causal softmax attention over a sequence-sharded axis.

Context parallelism — a capability the reference explicitly lacks
(SURVEY.md §5 long-context: "no ring attention, no context parallelism");
its long-context story was linear attention + RoPE scaling only. Here the
quadratic path also scales past one chip's memory: queries/keys/values are
sharded along the sequence dimension over a mesh axis, and key/value chunks
rotate around the ring via ``jax.lax.ppermute`` while each device folds
their contribution into an online-softmax accumulator (running max / sum /
weighted values). Peak memory per chip is O((N/P)^2-block) instead of O(N^2),
and the N/P-sized KV chunks ride the ICI ring concurrently with compute.

The linear-attention algorithms parallelize over sequence even more
naturally (their running state is an associative-scan carry); see
ops/fastmax.py — ring attention covers the softmax path.

Usage (inside shard_map, or via the convenience wrapper):
    out = ring_attention_sharded(q, k, v, mesh, axis="sp")
with q, k, v of global shape (B, H, N, D) sharded as P(None, None, "sp", None).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

NEG_INF = -1e30


def _block_attend(q, k, v, q_pos0, k_pos0, scale):
    """Partial attention of a q chunk against one k/v chunk.

    Returns (m, l, acc): rowwise max of masked scores, sum of exp, and
    exp-weighted values — the online-softmax partials.
    q: (B, H, Tq, D); k, v: (B, H, Tk, D).
    """
    tq, tk = q.shape[2], k.shape[2]
    s = jnp.einsum("bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32) * scale
    q_pos = q_pos0 + jnp.arange(tq)[:, None]
    k_pos = k_pos0 + jnp.arange(tk)[None, :]
    mask = k_pos <= q_pos  # causal on global positions
    s = jnp.where(mask[None, None], s, NEG_INF)
    m = jnp.max(s, axis=-1)  # (B, H, Tq)
    # rows with no valid keys keep m = NEG_INF -> contribute nothing
    p = jnp.exp(s - m[..., None])
    p = jnp.where(mask[None, None], p, 0.0)
    l = jnp.sum(p, axis=-1)
    acc = jnp.einsum("bhij,bhjd->bhid", p.astype(v.dtype), v).astype(jnp.float32)
    return m, l, acc


def _merge(m1, l1, a1, m2, l2, a2):
    """Merge two online-softmax partial triples."""
    m = jnp.maximum(m1, m2)
    c1 = jnp.exp(m1 - m)
    c2 = jnp.exp(m2 - m)
    l = l1 * c1 + l2 * c2
    a = a1 * c1[..., None] + a2 * c2[..., None]
    return m, l, a


def ring_attention_local(q, k, v, *, axis_name: str, scale: Optional[float] = None):
    """The per-device body (call inside shard_map over ``axis_name``).

    q, k, v: local chunks (B, H, N/P, D); the axis index determines their
    global sequence offset. Returns the local output chunk (B, H, N/P, D).
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    p_size = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    chunk = q.shape[2]
    q32 = q.astype(jnp.float32)
    q_pos0 = idx * chunk

    # derive the accumulators from q so they carry the same varying-axis
    # type as the loop outputs under shard_map
    m0 = jnp.full_like(q32[..., 0], NEG_INF)
    l0 = jnp.zeros_like(q32[..., 0])
    a0 = jnp.zeros_like(q32)

    def step(r, carry):
        m, l, a, kv = carry
        k_r, v_r = kv
        # the chunk currently held originated at device (idx - r) mod P
        src = jax.lax.rem(idx - r + p_size, p_size)
        mb, lb, ab = _block_attend(q32, k_r.astype(jnp.float32), v_r.astype(jnp.float32),
                                   q_pos0, src * chunk, scale)
        m, l, a = _merge(m, l, a, mb, lb, ab)
        # rotate k/v to the next device (device i sends to i+1)
        perm = [(i, (i + 1) % p_size) for i in range(p_size)]
        k_n = jax.lax.ppermute(k_r, axis_name, perm)
        v_n = jax.lax.ppermute(v_r, axis_name, perm)
        return m, l, a, (k_n, v_n)

    m, l, a, _ = jax.lax.fori_loop(0, p_size, step, (m0, l0, a0, (k, v)))
    out = a / jnp.where(l == 0.0, 1.0, l)[..., None]
    return out.astype(q.dtype)


def ring_attention_sharded(q, k, v, mesh: Mesh, *, axis: str = "model",
                           scale: Optional[float] = None):
    """Convenience wrapper: shard (B, H, N, D) inputs over ``axis`` on the
    sequence dim and run the ring. N must divide by the axis size."""
    from jax.experimental.shard_map import shard_map

    spec = P(None, None, axis, None)
    fn = shard_map(
        functools.partial(ring_attention_local, axis_name=axis, scale=scale),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    sharding = NamedSharding(mesh, spec)
    q, k, v = (jax.device_put(x, sharding) for x in (q, k, v))
    return fn(q, k, v)
