"""The shared fit loop.

TPU-native re-design of the reference's per-script fit functions
(finetune/lora.py:180-251, pretrain/openwebtext.py, pretrain/tinyllama.py:138-256):
jitted accumulate/apply steps, cosine+warmup schedule, periodic validation,
orbax checkpoint/resume, throughput + estimated-MFU metrics.

Gradient accumulation runs as a Python micro-batch loop over a jitted
``accum_step`` (grads buffer donated and updated in place) followed by a
jitted ``apply_step`` — the no_backward_sync/fabric.backward split of the
reference collapses into pure dataflow.
"""

from __future__ import annotations

import time
from functools import partial
from pathlib import Path
from typing import Callable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.config import Config
from ..utils.args import EvalArgs, TrainArgs
from ..utils.flops import mfu
from .step import make_loss_fn


def value_and_grad_floats(loss_fn, params, batch):
    """value_and_grad over only the float leaves of ``params``.

    Quantized models carry integer leaves (packed 4-bit codes, int8) that
    jax.grad rejects; those get zero "gradients" (which the masked optimizer
    drops anyway)."""
    flat, treedef = jax.tree.flatten(params)
    float_idx = [i for i, p in enumerate(flat) if jnp.issubdtype(p.dtype, jnp.floating)]

    def on_floats(float_leaves):
        full = list(flat)
        for i, leaf in zip(float_idx, float_leaves):
            full[i] = leaf
        return loss_fn(jax.tree.unflatten(treedef, full), batch)

    loss, fg = jax.value_and_grad(on_floats)([flat[i] for i in float_idx])
    grads_flat = [jnp.zeros_like(p) for p in flat]
    for i, g in zip(float_idx, fg):
        grads_flat[i] = g
    return loss, jax.tree.unflatten(treedef, grads_flat)


class TrainState:
    def __init__(self, params, opt_state, step: int = 0):
        self.params = params
        self.opt_state = opt_state
        self.step = step


def build_optimizer(train: TrainArgs, trainable=None) -> optax.GradientTransformation:
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=train.learning_rate,
        warmup_steps=train.lr_warmup_steps,
        decay_steps=max(train.max_iters, train.lr_warmup_steps + 1),
        end_value=train.min_lr,
    )
    chain = []
    if train.max_norm is not None:
        chain.append(optax.clip_by_global_norm(train.max_norm))
    name = getattr(train, "optimizer", "adamw")
    if name == "adamw":
        inner = optax.adamw(
            schedule, b1=train.beta1, b2=train.beta2, weight_decay=train.weight_decay
        )
    elif name == "adamw8bit":
        from .quant_optim import adamw8bit

        inner = adamw8bit(
            schedule, b1=train.beta1, b2=train.beta2, weight_decay=train.weight_decay
        )
    elif name == "adafactor":
        inner = optax.adafactor(schedule)
    elif name == "lion":
        inner = optax.lion(schedule, weight_decay=train.weight_decay)
    else:
        raise ValueError(f"unknown optimizer {name!r}")
    chain.append(inner)
    opt = optax.chain(*chain)
    if trainable is not None:
        from .step import masked_optimizer

        opt = masked_optimizer(opt, trainable)
    return opt


def fit(
    cfg: Config,
    state: TrainState,
    optimizer: optax.GradientTransformation,
    train_iter: Iterator[np.ndarray],
    *,
    train: TrainArgs,
    eval_args: Optional[EvalArgs] = None,
    val_iter_fn: Optional[Callable[[], Iterator[np.ndarray]]] = None,
    logger=None,
    out_dir: Optional[Path] = None,
    loss_fn: Optional[Callable] = None,
    checkpoint_fn: Optional[Callable] = None,
    remat: bool = True,
    mesh=None,
) -> TrainState:
    """Run the training loop; batches from ``train_iter`` are (B, T+1) int
    token matrices (inputs = [:, :-1], targets = [:, 1:]).

    mesh: a (data, fsdp, model) jax.sharding.Mesh. When given, batches are
    placed with the data-parallel batch spec and all steps run SPMD against
    the params' NamedShardings (the caller shards params before fit — the
    reference's FSDPStrategy(devices>1) role, finetune/lora.py:86-92)."""
    loss_fn = loss_fn or make_loss_fn(cfg, remat=remat)
    grad_accum = train.gradient_accumulation_iters()

    if mesh is not None:
        from jax.sharding import NamedSharding

        from ..parallel.sharding import batch_spec

        _bs = NamedSharding(mesh, batch_spec())

        def place_batch(batch):
            return jax.tree.map(
                lambda a: jax.device_put(jnp.asarray(a, jnp.int32), _bs), batch
            )
    else:
        def place_batch(batch):
            return jax.tree.map(lambda a: jnp.asarray(a, jnp.int32), batch)

    # donate the grads buffer: XLA accumulates in place, so gradient
    # accumulation holds one model-sized grads copy, not two
    @partial(jax.jit, donate_argnums=(1,))
    def accum_step(params, grads, batch):
        loss, g = value_and_grad_floats(loss_fn, params, batch)
        grads = jax.tree.map(lambda a, b: a + b, grads, g)
        return grads, loss

    @jax.jit
    def apply_step(params, opt_state, grads):
        grads = jax.tree.map(lambda g: g / grad_accum, grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state

    @jax.jit
    def eval_step(params, batch):
        return loss_fn(params, batch)

    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(state.params))

    t_start = time.perf_counter()
    tokens_seen = 0
    running_loss = []

    while state.step < train.max_iters:
        grads = jax.tree.map(jnp.zeros_like, state.params)
        losses = []
        for _ in range(grad_accum):
            batch = next(train_iter)
            # batch is either a (B, T+1) token matrix (LM loss) or a tuple
            # (inputs, labels) for SFT-style losses
            batch = place_batch(batch)
            grads, loss = accum_step(state.params, grads, batch)
            losses.append(loss)
            first = batch[0] if isinstance(batch, tuple) else batch
            tokens_seen += first.shape[0] * (first.shape[1] - 1)
        state.params, state.opt_state = apply_step(state.params, state.opt_state, grads)
        state.step += 1
        loss_val = float(jnp.mean(jnp.stack(losses)))
        running_loss.append(loss_val)

        if logger is not None and state.step % train.log_interval == 0:
            dt = time.perf_counter() - t_start
            tps = tokens_seen / max(dt, 1e-9)
            seq_len = first.shape[1] - 1
            logger.log_dict(
                {
                    "loss": loss_val,
                    "tokens": tokens_seen,
                    "tokens_per_sec": tps,
                    "est_mfu": mfu(tps, cfg, n_params, seq_len,
                                   jax.devices()[0].device_kind)
                    / (mesh.size if mesh is not None else 1),
                },
                state.step,
            )

        if eval_args is not None and val_iter_fn is not None and state.step % eval_args.interval == 0:
            val_losses = []
            for i, vbatch in enumerate(val_iter_fn()):
                if i >= eval_args.max_iters:
                    break
                vbatch = place_batch(vbatch)
                val_losses.append(float(eval_step(state.params, vbatch)))
            if logger is not None and val_losses:
                vl = float(np.mean(val_losses))
                logger.log_dict({"val_loss": vl, "val_ppl": float(np.exp(min(vl, 20)))}, state.step)

        if checkpoint_fn is not None and state.step % train.save_interval == 0:
            checkpoint_fn(state)

        if train.max_tokens is not None and tokens_seen >= train.max_tokens:
            break

    if checkpoint_fn is not None:
        checkpoint_fn(state)
    return state


# ------------------------------------------------------------- checkpoints


def save_train_state(state: TrainState, path: Path) -> None:
    """Orbax save of {params, opt_state, step} (the fabric.save role)."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(
        path, {"params": state.params, "opt_state": state.opt_state, "step": state.step},
        force=True,
    )


def load_train_state(path: Path, template: Optional[TrainState] = None) -> TrainState:
    """Restore a TrainState. ``template`` (a freshly-initialized state)
    restores optax NamedTuple structure; without it the opt_state comes back
    as raw dicts (orbax stores structure-erased pytrees)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    if template is not None:
        item = {
            "params": template.params,
            "opt_state": template.opt_state,
            "step": template.step,
        }
        restored = ckptr.restore(Path(path).absolute(), item=item)
    else:
        restored = ckptr.restore(Path(path).absolute())
    return TrainState(restored["params"], restored["opt_state"], int(restored["step"]))
