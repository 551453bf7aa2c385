"""Sequence-parallel training: the full forward under shard_map with the
sequence dimension sharded over a mesh axis.

Context parallelism as a *training mode*, not just an op: every component
of the transformer except attention is pointwise over sequence, so under a
sequence sharding they run untouched on local chunks; attention becomes
ring attention (parallel/ring_attention.py) rotating K/V chunks over the
ICI ring. Per-chip activation memory scales 1/P with the sequence shards —
the long-context training axis the reference lacked entirely (SURVEY.md §5:
"no ring attention, no context parallelism, no Ulysses").

RoPE positions and causal masks use each shard's global offset
(axis_index * local_T). Gradients: shard_map is differentiable; the ring's
ppermutes transpose to reverse-direction ppermutes automatically.

Usage:
    step = make_sp_train_step(cfg, mesh, optimizer, axis="model")
    params, opt_state, loss = step(params, opt_state, batch)  # batch (B, T+1)
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.config import Config
from ..models import gpt
from ..ops.attention import repeat_kv_heads
from ..ops.linear import embedding, linear
from ..ops.norms import apply_norm
from ..ops.rope import apply_rope, build_rope_cache
from .ring_attention import ring_attention_local


def _sp_attn(p, x, cfg: Config, cos, sin, axis_name: str):
    """Attention over a local sequence chunk via the K/V ring."""
    b, t, _ = x.shape
    hs, g = cfg.head_size, cfg.n_query_groups
    q_per_kv = cfg.n_head // g
    qkv = linear(p["attn"], x)
    qkv = qkv.reshape(b, t, g, q_per_kv + 2, hs)
    q = qkv[..., :q_per_kv, :].reshape(b, t, cfg.n_head, hs).transpose(0, 2, 1, 3)
    k = qkv[..., q_per_kv, :].transpose(0, 2, 1, 3)
    v = qkv[..., q_per_kv + 1, :].transpose(0, 2, 1, 3)
    nre = cfg.rope_n_elem
    q = q.at[..., :nre].set(apply_rope(q[..., :nre], cos, sin)) if nre < hs else apply_rope(q, cos, sin)
    k = k.at[..., :nre].set(apply_rope(k[..., :nre], cos, sin)) if nre < hs else apply_rope(k, cos, sin)
    k = repeat_kv_heads(k, cfg.n_head)
    v = repeat_kv_heads(v, cfg.n_head)
    y = ring_attention_local(q, k, v, axis_name=axis_name, scale=1.0 / hs ** 0.5)
    y = y.transpose(0, 2, 1, 3).reshape(b, t, hs * cfg.n_head).astype(x.dtype)
    return linear(p["proj"], y)


def sp_forward_local(params, cfg: Config, idx_local, rope_cache, axis_name: str):
    """Per-device body: idx_local (B, T/P) — returns local logits."""
    t_local = idx_local.shape[1]
    offset = jax.lax.axis_index(axis_name) * t_local
    rope_cos, rope_sin = rope_cache
    zero = jnp.zeros_like(offset)
    cos = jax.lax.dynamic_slice(rope_cos, (offset, zero), (t_local, cfg.rope_n_elem))
    sin = jax.lax.dynamic_slice(rope_sin, (offset, zero), (t_local, cfg.rope_n_elem))

    x = embedding(params["wte"], idx_local)
    if cfg.scale_embeddings:
        x = x * (cfg.n_embd ** 0.5)

    def body(carry, bp):
        y, _ = gpt.apply_block(
            bp, carry, cfg, cos, sin, None, None, None,
            attn_fn=lambda ap, n1: (_sp_attn(ap, n1, cfg, cos, sin, axis_name), None),
        )
        return y, None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    x = apply_norm(x, params["ln_f"], cfg.norm_class_name, cfg.norm_eps, cfg.add_unit_offset)
    return linear(params["lm_head"], x)


def _check_attn_alg(cfg: Config) -> None:
    if cfg.attn_alg != "quadratic":
        raise ValueError(
            f"sequence-parallel mode implements softmax (quadratic) attention; "
            f"cfg.attn_alg={cfg.attn_alg!r}. The linear attention algorithms "
            "shard over sequence through their associative scan instead "
            "(ops/fastmax.py) — train them with the standard sharded step."
        )


def make_sp_forward(cfg: Config, mesh: Mesh, *, axis: str = "model",
                    max_seq_length: Optional[int] = None):
    """jitted (params, idx (B, T)) -> logits with T sharded over ``axis``."""
    _check_attn_alg(cfg)
    n = max_seq_length or cfg.block_size
    rope_cache = build_rope_cache(n, cfg.rope_n_elem, cfg.rope_base, cfg.rope_condense_ratio)
    seq_spec = P(None, axis)
    out_spec = P(None, axis, None)

    body = functools.partial(sp_forward_local, cfg=cfg, rope_cache=rope_cache, axis_name=axis)

    fn = shard_map(
        lambda params, idx: body(params, idx_local=idx),
        mesh=mesh,
        in_specs=(P(), seq_spec),
        out_specs=out_spec,
    )

    return jax.jit(fn)


def make_sp_loss_fn(cfg: Config, mesh: Mesh, *, axis: str = "model",
                    max_seq_length: Optional[int] = None):
    """Sequence-parallel LM loss over (B, T+1) batches.

    Inputs/targets are sharded on the sequence axis; the boundary token of
    each shard needs the NEXT shard's first token as its target, handled by
    a ppermute shift of the targets inside shard_map.
    """
    _check_attn_alg(cfg)
    n = max_seq_length or cfg.block_size
    rope_cache = build_rope_cache(n, cfg.rope_n_elem, cfg.rope_base, cfg.rope_condense_ratio)

    def local_loss(params, tokens_local):
        # tokens_local: (B, T/P) of the (B, T) input stream (targets are the
        # stream shifted by one; the last shard's final token predicts the
        # NEXT shard's first token which lives one device to the right)
        axis_name = axis
        p_size = jax.lax.psum(1, axis_name)
        logits = sp_forward_local(params, cfg, tokens_local, rope_cache, axis_name)
        # bring in the first token of the right neighbor
        first = tokens_local[:, :1]
        perm = [(i, (i - 1) % p_size) for i in range(p_size)]
        next_first = jax.lax.ppermute(first, axis_name, perm)
        targets = jnp.concatenate([tokens_local[:, 1:], next_first], axis=1)
        idx = jax.lax.axis_index(axis_name)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        # the global last token has no target: mask it on the last shard
        t_local = tokens_local.shape[1]
        pos = jnp.arange(t_local)[None, :]
        valid = jnp.where(idx == p_size - 1, pos < t_local - 1, jnp.ones_like(pos, bool))
        loss_sum = jnp.sum(jnp.where(valid, nll, 0.0))
        count = jnp.sum(valid.astype(jnp.float32)) * tokens_local.shape[0]
        loss_sum = jax.lax.psum(loss_sum, axis_name)
        count = jax.lax.psum(count, axis_name)
        return loss_sum / count

    seq_spec = P(None, axis)
    fn = shard_map(
        local_loss, mesh=mesh,
        in_specs=(P(), seq_spec), out_specs=P(),
    )

    def loss_fn(params, batch):
        # batch (B, T+1): use the first T tokens as the sharded stream; the
        # final target comes from the shifted stream (the (T+1)th token is
        # dropped — negligible for T >> 1 and keeps shards equal-sized)
        return fn(params, batch[:, :-1])

    return loss_fn


def make_sp_tp_fsdp_loss_fn(cfg: Config, mesh: Mesh, host_params: dict, *,
                            seq_axis: str = "data", tp_axis: str = "model",
                            fsdp_axis: str = "fsdp",
                            max_seq_length: Optional[int] = None):
    """Composed 3-way parallel LM loss: sequence parallelism (ring
    attention over ``seq_axis``) x megatron tensor parallelism (QKV/fc
    colwise, proj rowwise + psum over ``tp_axis``) x ZeRO-3 (every leaf
    additionally sharded over ``fsdp_axis`` and all-gathered on entry).

    The composition the reference runs in production-ish form (FSDP
    finetune + sharded attention, finetune/lora.py:86-92) and the r04
    verdict flagged as untested: each strategy changes a different
    tensor dimension, so spec/layout bugs only surface when they are
    active simultaneously. Returns (loss_fn, specs); shard ``params``
    with ``specs`` before calling.
    """
    from . import sharding as sh

    _check_attn_alg(cfg)
    tp = mesh.shape[tp_axis]
    if cfg.n_query_groups % tp or cfg.padded_vocab_size % tp:
        raise ValueError("n_query_groups and vocab must divide tp size")
    n = max_seq_length or cfg.block_size
    rope_cache = build_rope_cache(n, cfg.rope_n_elem, cfg.rope_base, cfg.rope_condense_ratio)
    fsdp = mesh.shape[fsdp_axis]
    raw = sh.param_specs(cfg, host_params, tp=tp > 1, fsdp_size=fsdp)

    def _san(p, s):
        if isinstance(p, dict):
            return {k: _san(v, s[k]) for k, v in p.items()}
        return sh.sanitize_spec(s, p.shape, mesh)

    specs = _san(host_params, raw)
    hs, g = cfg.head_size, cfg.n_query_groups
    q_per_kv = cfg.n_head // g
    g_loc, nh_loc = g // tp, cfg.n_head // tp

    def tp_attn(p, x, cos, sin):
        b, t, _ = x.shape
        qkv = linear(p["attn"], x)  # colwise shard: the local g_loc groups
        qkv = qkv.reshape(b, t, g_loc, q_per_kv + 2, hs)
        q = qkv[..., :q_per_kv, :].reshape(b, t, nh_loc, hs).transpose(0, 2, 1, 3)
        k = qkv[..., q_per_kv, :].transpose(0, 2, 1, 3)
        v = qkv[..., q_per_kv + 1, :].transpose(0, 2, 1, 3)
        nre = cfg.rope_n_elem
        q = q.at[..., :nre].set(apply_rope(q[..., :nre], cos, sin)) if nre < hs else apply_rope(q, cos, sin)
        k = k.at[..., :nre].set(apply_rope(k[..., :nre], cos, sin)) if nre < hs else apply_rope(k, cos, sin)
        k = repeat_kv_heads(k, nh_loc)
        v = repeat_kv_heads(v, nh_loc)
        y = ring_attention_local(q, k, v, axis_name=seq_axis, scale=1.0 / hs ** 0.5)
        y = y.transpose(0, 2, 1, 3).reshape(b, t, hs * nh_loc).astype(x.dtype)
        # rowwise proj: local head-rows -> partial (b, t, n_embd); reduce
        return jax.lax.psum(linear(p["proj"], y), tp_axis)

    def local_loss(params, tokens_local):
        params = sh.gather_fsdp_local(params, specs, fsdp_axis)  # ZeRO-3
        t_local = tokens_local.shape[1]
        offset = jax.lax.axis_index(seq_axis) * t_local
        zero = jnp.zeros_like(offset)
        cos = jax.lax.dynamic_slice(rope_cache[0], (offset, zero), (t_local, cfg.rope_n_elem))
        sin = jax.lax.dynamic_slice(rope_cache[1], (offset, zero), (t_local, cfg.rope_n_elem))

        x = embedding(params["wte"], tokens_local)
        if cfg.scale_embeddings:
            x = x * (cfg.n_embd ** 0.5)

        def body(carry, bp):
            y, _ = gpt.apply_block(
                bp, carry, cfg, cos, sin, None, None, None,
                attn_fn=lambda ap, n1: (tp_attn(ap, n1, cos, sin), None),
                mlp_fn=lambda mp, n2: jax.lax.psum(gpt.apply_mlp(mp, n2, cfg), tp_axis),
            )
            return y, None

        x, _ = jax.lax.scan(body, x, params["blocks"])
        x = apply_norm(x, params["ln_f"], cfg.norm_class_name, cfg.norm_eps, cfg.add_unit_offset)
        logits = linear(params["lm_head"], x)  # colwise: local vocab shard
        logits = jax.lax.all_gather(logits, tp_axis, axis=2, tiled=True)

        # shifted-target loss over the sequence shards (same as the sp path)
        p_size = jax.lax.psum(1, seq_axis)
        first = tokens_local[:, :1]
        perm = [(i, (i - 1) % p_size) for i in range(p_size)]
        next_first = jax.lax.ppermute(first, seq_axis, perm)
        targets = jnp.concatenate([tokens_local[:, 1:], next_first], axis=1)
        idx = jax.lax.axis_index(seq_axis)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        pos = jnp.arange(t_local)[None, :]
        valid = jnp.where(idx == p_size - 1, pos < t_local - 1, jnp.ones_like(pos, bool))
        loss_sum = jax.lax.psum(jnp.sum(jnp.where(valid, nll, 0.0)), seq_axis)
        count = jax.lax.psum(
            jnp.sum(valid.astype(jnp.float32)) * tokens_local.shape[0], seq_axis
        )
        # fsdp/tp peers compute identical values post-gather; the psum/size
        # normalization declares that invariance to the partitioner
        loss = loss_sum / count
        loss = jax.lax.psum(loss, fsdp_axis) / jax.lax.psum(1, fsdp_axis)
        loss = jax.lax.psum(loss, tp_axis) / jax.lax.psum(1, tp_axis)
        return loss

    fn = shard_map(
        local_loss, mesh=mesh,
        in_specs=(specs, P(None, seq_axis)), out_specs=P(),
    )

    def loss_fn(params, batch):
        return fn(params, batch[:, :-1])

    return loss_fn, specs


def make_sp_train_step(cfg: Config, mesh: Mesh, optimizer, *, axis: str = "model",
                       max_seq_length: Optional[int] = None):
    import optax

    loss_fn = make_sp_loss_fn(cfg, mesh, axis=axis, max_seq_length=max_seq_length)

    def train_step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(train_step, donate_argnums=(0, 1))
