"""Sharded training step construction.

The TPU-native replacement for the reference's Fabric fit-loop plumbing
(finetune/lora.py:207-251): one jitted SPMD train step over a
(data, fsdp, model) mesh. Gradient accumulation, clipping and the LR
schedule compose through optax; FSDP is the fsdp-axis sharding of params
(GSPMD all-gathers per layer, the ZeRO-3 dataflow); remat on the block scan
bounds activation memory like the reference's per-Block activation
checkpointing (finetune/lora.py:88-91).
"""

from __future__ import annotations

from typing import Callable

import jax
import optax

from ..models.config import Config
from ..models import gpt
from ..utils.loss import cross_entropy


def make_loss_fn(cfg: Config, remat: bool = True) -> Callable:
    def loss_fn(params, batch):
        inputs = batch[:, :-1]
        targets = batch[:, 1:]
        logits, _ = gpt.forward(params, cfg, inputs, remat=remat)
        return cross_entropy(logits, targets)

    return loss_fn


def make_train_step(
    cfg: Config,
    optimizer: optax.GradientTransformation,
    *,
    remat: bool = True,
    donate: bool = True,
):
    """Returns jitted ``train_step(params, opt_state, batch) ->
    (params, opt_state, loss)``. Shard params/batch before calling; GSPMD
    derives the gradient psums from the shardings."""
    loss_fn = make_loss_fn(cfg, remat)

    def train_step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    donate_argnums = (0, 1) if donate else ()
    return jax.jit(train_step, donate_argnums=donate_argnums)


def masked_optimizer(inner: optax.GradientTransformation, mask: dict) -> optax.GradientTransformation:
    """Train only the leaves where ``mask`` is True; everything else gets a
    zero update (the requires_grad=False equivalent for PEFT —
    mark_only_lora_as_trainable / mark_only_adapter_as_trainable)."""
    labels = jax.tree.map(lambda m: "train" if m else "freeze", mask)
    return optax.multi_transform(
        {"train": inner, "freeze": optax.set_to_zero()}, labels
    )


def default_optimizer(
    learning_rate: float = 3e-4,
    weight_decay: float = 0.02,
    beta1: float = 0.9,
    beta2: float = 0.95,
    max_norm: float = 1.0,
    warmup_steps: int = 100,
    total_steps: int = 10_000,
    min_lr: float = 6e-5,
) -> optax.GradientTransformation:
    """AdamW + clip + warmup-cosine (the reference hyperparameter surface,
    lit_gpt/args.py TrainArgs + SequentialLR at finetune/lora.py:326-330)."""
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=learning_rate,
        warmup_steps=warmup_steps,
        decay_steps=max(total_steps, warmup_steps + 1),
        end_value=min_lr,
    )
    return optax.chain(
        optax.clip_by_global_norm(max_norm),
        optax.adamw(schedule, b1=beta1, b2=beta2, weight_decay=weight_decay),
    )
