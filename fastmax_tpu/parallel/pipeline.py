"""Pipeline-parallel training: GPipe-style microbatch pipelining over a
mesh axis via shard_map + ppermute.

The reference's closest mechanism is generate/sequentially.py (layer
streaming: balanced ``n_layer // devices`` block placement with hook-based
activation movement, sequentially.py:31-97) — sequential, batch-1, no
overlap. The TPU-native redesign keeps its purpose (a stage-sharded layout
where each device holds only ``n_layer / P`` blocks) and adds what a real
pipeline needs: M microbatches flow through P stages as a wavefront, so all
stages compute concurrently after the fill phase (bubble fraction
(P-1)/(M+P-1), the GPipe schedule).

TPU-idiomatic mechanics:
  - the stacked block parameters (leading n_layer axis, models/gpt.py) are
    sharded over the pipe axis with PartitionSpec(axis) on dim 0 — stage i
    holds layers [i*L/P, (i+1)*L/P); no parameter gathering ever happens;
  - activations move stage-to-stage with a single neighbor `ppermute` per
    tick, riding the ICI ring;
  - the whole schedule is a `lax.scan` over M+P-1 ticks inside shard_map,
    so it jits to one program and is differentiable end-to-end: the
    ppermute transposes to the reverse-direction ppermute and the scan
    transposes to the reverse-time scan — the 1F1B-ish backward comes from
    AD, with per-tick remat bounding stashed activations.

Every device runs the same SPMD program; stage identity comes from
`axis_index`. Embedding/ln_f/lm_head are replicated (they're small next to
the blocks) and evaluated each tick, with non-boundary stages' results
masked — the standard cost of collective-free SPMD pipelining.

Usage:
    step = make_pp_train_step(cfg, mesh, optimizer, axis="model", n_micro=4)
    params = shard_params(params, mesh, pp_param_specs(cfg, params, axis="model"))
    params, opt_state, loss = step(params, opt_state, batch)  # batch (B, T+1)
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..models.config import Config
from ..models import gpt
from ..ops.linear import embedding, linear
from ..ops.norms import apply_norm
from ..ops.rope import build_rope_cache


def pp_param_specs(cfg: Config, params: dict, *, axis: str = "model") -> dict:
    """PartitionSpecs placing each stage's blocks on its device: every leaf
    under ``blocks`` shards its leading (n_layer,) stack axis over ``axis``;
    wte/ln_f/lm_head replicate."""

    def walk(node, under_blocks):
        if isinstance(node, dict):
            return {k: walk(v, under_blocks or k == "blocks") for k, v in node.items()}
        if under_blocks:
            return P(axis, *([None] * (node.ndim - 1)))
        return P()

    return {k: walk(v, k == "blocks") for k, v in params.items()}


def _stage_fn(blocks_local, x, cfg: Config, cos, sin, remat):
    """Run this stage's local layers over activations x (mb, T, D)."""

    def body(carry, bp):
        y, _ = gpt.apply_block(bp, carry, cfg, cos, sin, None, None, None)
        return y, None

    body = gpt._remat_wrap(body, remat)
    x, _ = jax.lax.scan(body, x, blocks_local)
    return x


def pp_fsdp_param_specs(cfg: Config, params: dict, *, axis: str = "model",
                        fsdp_axis: str = "fsdp", fsdp_size: int = 1) -> dict:
    """Composed pipeline x ZeRO-3 specs: blocks shard the leading layer axis
    over ``axis`` (stage placement) AND their largest divisible free dim
    over ``fsdp_axis``; non-block leaves replicate. Pass the result as both
    ``shard_params`` specs and ``make_pp_loss_fn(fsdp_specs=...)``."""

    def walk(node, under_blocks):
        if isinstance(node, dict):
            return {k: walk(v, under_blocks or k == "blocks") for k, v in node.items()}
        if under_blocks:
            spec = [axis] + [None] * (node.ndim - 1)
            if fsdp_size > 1:
                best, size = None, 0
                for i in range(1, node.ndim):
                    if node.shape[i] % fsdp_size == 0 and node.shape[i] > size:
                        best, size = i, node.shape[i]
                if best is not None:
                    spec[best] = fsdp_axis
            return P(*spec)
        return P()

    return {k: walk(v, k == "blocks") for k, v in params.items()}


def make_pp_loss_fn(
    cfg: Config,
    mesh: Mesh,
    *,
    axis: str = "model",
    n_micro: int = 4,
    remat=True,
    max_seq_length: Optional[int] = None,
    fsdp_specs: Optional[dict] = None,
    fsdp_axis: str = "fsdp",
):
    """Pipeline-parallel LM loss over (B, T+1) batches.

    B must divide by ``n_micro`` and cfg.n_layer by the ``axis`` size.
    Returns loss averaged over all microbatches (identical numerics to the
    dense loss — the schedule only reorders compute).

    ``fsdp_specs`` (from :func:`pp_fsdp_param_specs`) composes ZeRO-3 on
    top: params arrive sharded over ``fsdp_axis`` too and are all-gathered
    at stage entry.
    """
    p_size = mesh.shape[axis]
    if cfg.n_layer % p_size != 0:
        raise ValueError(
            f"n_layer={cfg.n_layer} must divide by pipeline stages {p_size}"
        )
    n = max_seq_length or cfg.block_size
    rope_cache = build_rope_cache(n, cfg.rope_n_elem, cfg.rope_base, cfg.rope_condense_ratio)

    def local_loss(params, micro_inputs, micro_targets):
        # micro_inputs/targets: (M, mb, T) replicated on every device.
        axis_name = axis
        if fsdp_specs is not None:
            from . import sharding as sh

            params = sh.gather_fsdp_local(params, fsdp_specs, fsdp_axis)
        stage = jax.lax.axis_index(axis_name)
        m, mb, t = micro_inputs.shape
        cos = rope_cache[0][:t]
        sin = rope_cache[1][:t]
        blocks_local = params["blocks"]  # leading dim = n_layer / p_size
        ticks = m + p_size - 1
        fwd_perm = [(i, (i + 1) % p_size) for i in range(p_size)]

        def embed(mb_idx):
            ids = jax.lax.dynamic_index_in_dim(micro_inputs, mb_idx, 0, keepdims=False)
            x = embedding(params["wte"], ids)
            if cfg.scale_embeddings:
                x = x * (cfg.n_embd ** 0.5)
            return x

        def head_loss(y, mb_idx):
            tgt = jax.lax.dynamic_index_in_dim(micro_targets, mb_idx, 0, keepdims=False)
            h = apply_norm(y, params["ln_f"], cfg.norm_class_name, cfg.norm_eps,
                           cfg.add_unit_offset)
            logits = linear(params["lm_head"], h)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
            return jnp.mean(nll)

        def tick(carry, tk):
            recv, loss_sum = carry
            # stage 0 injects microbatch tk (clamped; masked when drained)
            in_idx = jnp.minimum(tk, m - 1)
            x_in = jnp.where(stage == 0, embed(in_idx), recv)
            y = _stage_fn(blocks_local, x_in, cfg, cos, sin, remat)
            # last stage drains microbatch tk - (P-1) once the wave arrives
            out_idx = jnp.clip(tk - (p_size - 1), 0, m - 1)
            mb_loss = head_loss(y, out_idx)
            take = jnp.logical_and(stage == p_size - 1, tk >= p_size - 1)
            loss_sum = loss_sum + jnp.where(take, mb_loss, 0.0)
            recv = jax.lax.ppermute(y, axis_name, fwd_perm)
            return (recv, loss_sum), None

        # mark the carry as device-varying over the pipe axis up front (it
        # becomes varying after the first ppermute; scan carries must have a
        # stable vma type). With composed fsdp the gathered block params are
        # varying over the fsdp axis too, so the carry must match.
        vary_axes = (axis_name,) if fsdp_specs is None else (axis_name, fsdp_axis)
        recv0 = jax.lax.pcast(
            jnp.zeros((mb, t, cfg.n_embd), params["wte"].dtype), vary_axes,
            to="varying",
        )
        loss0 = jax.lax.pcast(jnp.float32(0.0), vary_axes, to="varying")
        (_, loss_sum), _ = jax.lax.scan(tick, (recv0, loss0), jnp.arange(ticks))
        # only the last stage accumulated; broadcast via psum
        loss = jax.lax.psum(loss_sum, axis_name) / m
        if fsdp_specs is not None:
            # fsdp peers computed identical values post-gather; psum/size
            # declares the invariance to the partitioner
            loss = jax.lax.psum(loss, fsdp_axis) / jax.lax.psum(1, fsdp_axis)
        return loss

    fn = shard_map(
        local_loss, mesh=mesh,
        in_specs=(fsdp_specs if fsdp_specs is not None else pp_in_specs(axis),
                  P(), P()),
        out_specs=P(),
    )

    def loss_fn(params, batch):
        b = batch.shape[0]
        if b % n_micro != 0:
            raise ValueError(f"batch {b} must divide by n_micro={n_micro}")
        inputs = batch[:, :-1].reshape(n_micro, b // n_micro, -1)
        targets = batch[:, 1:].reshape(n_micro, b // n_micro, -1)
        return fn(params, inputs, targets)

    return loss_fn


def pp_in_specs(axis: str) -> dict:
    """in_specs pytree prefix for params: blocks stage-sharded, rest
    replicated. shard_map accepts a pytree-prefix of specs keyed like the
    params dict."""
    return {
        "wte": P(),
        "blocks": P(axis),
        "ln_f": P(),
        "lm_head": P(),
    }


def make_pp_train_step(
    cfg: Config,
    mesh: Mesh,
    optimizer,
    *,
    axis: str = "model",
    n_micro: int = 4,
    remat=True,
    max_seq_length: Optional[int] = None,
):
    import optax

    loss_fn = make_pp_loss_fn(
        cfg, mesh, axis=axis, n_micro=n_micro, remat=remat,
        max_seq_length=max_seq_length,
    )

    def train_step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(train_step, donate_argnums=(0, 1))
