"""Pallas decode attention over an int8-quantized KV cache.

The decode hot path's second-largest HBM reader after the weights is the
KV cache. With an int8 cache the XLA formulation (even the scale-on-scores
one in ops/attention.int8_cache_attention) leaves ~4x the cache's bytes on
the table — measured r05 on v5e 7B S=1024: attention cost 1.9 ms/token vs
the ~0.5 ms the int8 bytes imply (bench_results/decode_profile_r05b.jsonl)
— because XLA materializes the int8->bf16 converts instead of streaming
codes into the MXU.

This kernel does the whole per-(batch, group) decode attention in one
VMEM residency: K/V codes DMA in as int8 (exactly their HBM bytes),
convert on the VPU, two MXU dots with an f32 softmax between, per-position
scales folded into scores/probabilities, causal frontier masked from a
scalar position. One program per (b*g) — at 7B decode that is 32 programs
of 256 KB K+V each.

Role in the reference mapping: the decode half of torch SDPA over
lit-gpt's KVCache (model.py:569-580 + 711-740), specialized to the
quantized cache this framework adds.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(pos_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref,
            *, scale: float, g: int):
    bh = pl.program_id(0)
    pos = pos_ref[bh // g]  # (B,) SMEM: this row's current absolute position

    q = q_ref[0]                      # (R, D) activation dtype
    k = k_ref[0].astype(q.dtype)      # (S, D) int8 -> bf16 in VMEM
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                  # (R, S)
    ks = ks_ref[0, 0].astype(jnp.float32)  # (S,)
    s = s * (scale * ks)[None, :]
    idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(idx <= pos, s, NEG_INF)

    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    denom = jnp.sum(e, axis=1, keepdims=True)
    p = e / denom                      # (R, S) f32; pos >= 0 so denom >= 1

    vs = vs_ref[0, 0].astype(jnp.float32)
    pv = (p * vs[None, :]).astype(q.dtype)
    v = v_ref[0].astype(q.dtype)
    o_ref[0] = jax.lax.dot_general(
        pv, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def int8_decode_attention(
    q: jnp.ndarray,
    k_codes: jnp.ndarray,
    v_codes: jnp.ndarray,
    k_scale: jnp.ndarray,
    v_scale: jnp.ndarray,
    pos: jnp.ndarray,
    *,
    scale: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Single-token decode attention over the int8 cache.

    q: (B, Hq, 1, D); k_codes/v_codes: (B, G, S, D) int8;
    k_scale/v_scale: (B, G, S); pos: (B,) absolute position of the current
    token (attend to cache slots j <= pos[b]). Returns (B, Hq, 1, D).
    """
    b, hq, t, d = q.shape
    g, s = k_codes.shape[1], k_codes.shape[2]
    r = hq // g
    assert t == 1, t

    qg = q.reshape(b * g, r, d)
    kf = k_codes.reshape(b * g, s, d)
    vf = v_codes.reshape(b * g, s, d)
    # scales ride as (b*g, 1, s) so the (1, 1, s) block equals the array's
    # trailing dims (Mosaic requires trailing block dims divisible by
    # (8, 128) or exactly equal to the array's). f32: the cache stores f16
    # scales, which the mosaic dialect does not accept as kernel operands.
    ksf = k_scale.reshape(b * g, 1, s).astype(jnp.float32)
    vsf = v_scale.reshape(b * g, 1, s).astype(jnp.float32)
    posv = jnp.broadcast_to(jnp.asarray(pos, jnp.int32).reshape(-1), (b,))

    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, g=g),
        grid=(b * g,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, r, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, r, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * g, r, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(posv, qg, kf, vf, ksf, vsf)
    return out.reshape(b, hq, 1, d)


def int8_decode_eligible(t: int, d: int, s: int) -> bool:
    # d rides the lane dim (pad to 128 is fine at 64); S*d int8 x2 plus
    # bf16 converts must fit VMEM comfortably
    return t == 1 and d in (64, 128) and s * d * 4 <= 8 * 2**20 and s % 128 == 0


# ---------------------------------------------------------------------------
# Stacked-cache variant: reads layer ``l`` of the FULL (L, B, G, S, D) cache
# via scalar-prefetched index maps. This exists because of how the decode
# step iterates layers: the cache lives in the layer-scan *carry* (in-place
# dynamic-update-slice; the old scanned-xs/ys layout copied the whole cache
# every token — measured 1.75 ms/step at 7B S=1024, the single largest
# decode overhead, bench_results/decode_profile_r05*.jsonl). Slicing the
# carried stack with dynamic_index_in_dim before a pallas_call would
# materialize the 8 MB layer slice again; prefetching the layer index into
# the BlockSpec index maps lets the kernel DMA straight out of the stack.
# ---------------------------------------------------------------------------


def _stacked_kernel(scalar_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref,
                    *, scale: float, g: int):
    bh = pl.program_id(0)
    pos = scalar_ref[1 + bh // g]

    q = q_ref[0]
    k = k_ref[0, 0].astype(q.dtype)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ks = ks_ref[0, 0, 0].astype(jnp.float32)
    s = s * (scale * ks)[None, :]
    idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(idx <= pos, s, NEG_INF)

    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=1, keepdims=True)

    vs = vs_ref[0, 0, 0].astype(jnp.float32)
    pv = (p * vs[None, :]).astype(q.dtype)
    v = v_ref[0, 0].astype(q.dtype)
    o_ref[0] = jax.lax.dot_general(
        pv, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def int8_decode_attention_stacked(
    q: jnp.ndarray,
    k_all: jnp.ndarray,
    v_all: jnp.ndarray,
    ks_all: jnp.ndarray,
    vs_all: jnp.ndarray,
    layer: jnp.ndarray,
    pos: jnp.ndarray,
    *,
    scale: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Single-token decode attention over layer ``layer`` of the stacked
    int8 cache.

    q: (B, Hq, 1, D); k_all/v_all: (L, B, G, S, D) int8;
    ks_all/vs_all: (L, B, G, S) f32; layer: scalar int32; pos: (B,).
    Returns (B, Hq, 1, D).
    """
    b, hq, t, d = q.shape
    n_layer, _, g, s, _ = k_all.shape
    r = hq // g
    assert t == 1, t

    qg = q.reshape(b * g, r, d)
    kf = k_all.reshape(n_layer, b * g, s, d)
    vf = v_all.reshape(n_layer, b * g, s, d)
    ksf = ks_all.reshape(n_layer, b * g, 1, s).astype(jnp.float32)
    vsf = vs_all.reshape(n_layer, b * g, 1, s).astype(jnp.float32)
    scalars = jnp.concatenate([
        jnp.asarray(layer, jnp.int32).reshape(1),
        jnp.broadcast_to(jnp.asarray(pos, jnp.int32).reshape(-1), (b,)),
    ])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b * g,),
        in_specs=[
            pl.BlockSpec((1, r, d), lambda i, sref: (i, 0, 0)),
            pl.BlockSpec((1, 1, s, d), lambda i, sref: (sref[0], i, 0, 0)),
            pl.BlockSpec((1, 1, s, d), lambda i, sref: (sref[0], i, 0, 0)),
            pl.BlockSpec((1, 1, 1, s), lambda i, sref: (sref[0], i, 0, 0)),
            pl.BlockSpec((1, 1, 1, s), lambda i, sref: (sref[0], i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, r, d), lambda i, sref: (i, 0, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_stacked_kernel, scale=scale, g=g),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b * g, r, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(scalars, qg, kf, vf, ksf, vsf)
    return out.reshape(b, hq, 1, d)
