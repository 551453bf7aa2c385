"""Finetuning recipe: full / lora / adapter / adapter_v2 (+ quantized base).

One CLI covering the reference's four finetune scripts (finetune/full.py,
lora.py, adapter.py, adapter_v2.py — SURVEY.md §2.5), including QLoRA:
``--quantize bnb.nf4 --method lora`` quantizes the base weights and trains
only the LoRA deltas, the reference's finetune/lora.py:38-177 flow; add
``--gptq_calib true`` to quantize the base with GPTQ error compensation
calibrated on the training data (ops/gptq.py) instead of round-to-nearest.
``--train.optimizer adamw8bit`` stores Adam moments blockwise
int8-quantized (training/quant_optim.py) — the reference's
PagedAdamW-under-quantization choice (finetune/lora.py:152-160).
``--dp/--fsdp/--tp`` shard the run over a device mesh — the reference's
FSDPStrategy-when-devices>1 flow (finetune/lora.py:86-92), as pjit
NamedShardings (PEFT/quantized leaves fall back to fsdp/replicated).

Saves method-appropriate checkpoints: full state for --method full,
delta-only (lora_filter / adapter_filter role) otherwise.

Example:
  python -m fastmax_tpu.training.finetune --method lora \\
      --checkpoint_dir checkpoints/tiny --data_path data/alpaca/train.pt \\
      --quantize bnb.nf4 --attn_alg fastmax --train.max_iters 100
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import Config
from ..models import adapter as adapter_mod
from ..models import gpt, lora as lora_mod
from ..utils.args import EvalArgs, IOArgs, TrainArgs
from ..utils.logging import choose_logger
from .fit import TrainState, build_optimizer, fit

METHODS = ("full", "lora", "adapter", "adapter_v2")


def sft_loss_fn(cfg: Config, remat: bool = True, lm_head_chunk_size: int = 128):
    """SFT loss with the lm_head chunked like the reference
    (finetune/lora.py:216-219: model(..., lm_head_chunk_size=128) +
    chunked_cross_entropy): the final hidden states go through the head in
    chunks so the fp32 (B, T, V) logits never materialize."""
    from ..utils.loss import chunked_cross_entropy

    def loss_fn(params, batch):
        inputs, labels = batch
        hidden = gpt.forward_hidden(params, cfg, inputs, remat=remat)
        # next-token: hidden[:, :-1] predicts labels[:, 1:]
        return chunked_cross_entropy(
            hidden[:, :-1], params["lm_head"], labels[:, 1:], lm_head_chunk_size
        )

    return loss_fn


def setup(
    method: str = "lora",
    checkpoint_dir: Optional[Path] = None,
    model_name: Optional[str] = None,
    data_path: Optional[Path] = None,
    quantize: Optional[str] = None,
    gptq_calib: bool = False,
    attn_alg: Optional[str] = None,
    precision: str = "float32",
    logger_name: str = "csv",
    seed: int = 1337,
    lora_r: int = 8,
    lora_alpha: float = 16.0,
    lora_query: bool = True,
    lora_key: bool = False,
    lora_value: bool = True,
    lora_projection: bool = False,
    lora_mlp: bool = False,
    lora_head: bool = False,
    adapter_prompt_length: int = 10,
    adapter_start_layer: int = 2,
    dp: int = 1,
    fsdp: int = 1,
    tp: int = 1,
    train: TrainArgs = TrainArgs(
        global_batch_size=8, micro_batch_size=2, max_iters=100, learning_rate=3e-4,
        save_interval=1000, log_interval=10, max_seq_length=512,
    ),
    eval: EvalArgs = EvalArgs(interval=100, max_iters=20),
    io: IOArgs = IOArgs(),
) -> None:
    if method not in METHODS:
        raise ValueError(f"method {method!r} not in {METHODS}")
    dtype = getattr(jnp, precision)

    # ---- base model
    if checkpoint_dir is not None:
        from ..utils.checkpoint import load_model_params

        kw = {"attn_alg": attn_alg} if attn_alg else {}
        cfg = Config.from_checkpoint(Path(checkpoint_dir), **kw)
        _, params = load_model_params(Path(checkpoint_dir), cfg, dtype)
    else:
        cfg = Config.from_name(model_name, **({"attn_alg": attn_alg} if attn_alg else {}))
        params = gpt.init_params(cfg, jax.random.PRNGKey(seed), dtype)

    if quantize:
        four_bit = quantize in ("gptq.int4", "bnb.nf4", "bnb.nf4-dq",
                                "bnb.fp4", "bnb.fp4-dq")
        if gptq_calib and four_bit and data_path is not None:
            # GPTQ the base against the training distribution itself: the
            # frozen weights are only ever multiplied by activations of this
            # data, so it is the ideal calibration set (ops/gptq.py)
            from ..data.lm_datasets import SFTDataset
            from ..ops.gptq import gptq_quantize_model

            calib_ds = SFTDataset.load(Path(data_path), seed)
            calib, _ = calib_ds.sample_batch(
                4, min(train.max_seq_length or cfg.block_size, cfg.block_size)
            )
            kind = quantize.split(".")[1].split("-")[0]
            params = gptq_quantize_model(
                params, cfg, np.asarray(calib, np.int32), kind=kind,
                double_quant=quantize.endswith("-dq"),
            )
        else:
            from ..ops.quant import quantize_model

            params = quantize_model(params, quantize)

    # ---- attach PEFT parameters + trainable mask
    key = jax.random.PRNGKey(seed + 1)
    if method == "lora":
        lcfg = lora_mod.LoRAConfig(
            r=lora_r, alpha=lora_alpha, query=lora_query, key=lora_key,
            value=lora_value, projection=lora_projection, mlp=lora_mlp, head=lora_head,
        )
        params = lora_mod.add_lora_params(params, cfg, lcfg, key, dtype)
        trainable = lora_mod.trainable_mask(params)
    elif method in ("adapter", "adapter_v2"):
        acfg = adapter_mod.AdapterConfig(adapter_prompt_length, adapter_start_layer)
        params = adapter_mod.add_adapter_params(
            params, cfg, acfg, key, dtype, v2=method == "adapter_v2"
        )
        trainable = adapter_mod.trainable_mask(params, v2=method == "adapter_v2")
    else:
        if quantize:
            raise ValueError("full finetuning of quantized weights is not supported")
        trainable = None

    n_all = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    if trainable is not None:
        n_train = sum(
            int(np.prod(p.shape))
            for p, m in zip(jax.tree.leaves(params), jax.tree.leaves(trainable))
            if m
        )
    else:
        n_train = n_all
    print(f"{method}: {n_train/1e6:.2f}M trainable of {n_all/1e6:.1f}M")

    # ---- data
    from ..data.lm_datasets import SFTDataset

    ds = SFTDataset.load(Path(data_path), seed)
    train_iter = ds.batches(train.micro_batch_size, train.max_seq_length)

    out_dir = Path(io.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    logger = choose_logger(logger_name, out_dir)

    # ---- mesh: shard base + PEFT params (PEFT/unknown leaves fall back to
    # fsdp-dim/replicated specs); the reference's FSDP-when-devices>1 flow
    mesh = None
    if dp * fsdp * tp > 1:
        from ..parallel import sharding as sh

        if train.micro_batch_size % (dp * fsdp) != 0:
            raise ValueError(
                f"micro_batch_size {train.micro_batch_size} must divide over "
                f"dp*fsdp = {dp * fsdp} (the batch mesh axes)"
            )
        mesh = sh.make_mesh(data=dp, fsdp=fsdp, model=tp)
        specs = sh.param_specs(cfg, params, tp=tp > 1, fsdp_size=fsdp)
        params = sh.shard_params(params, mesh, specs)
        print(f"mesh: dp={dp} fsdp={fsdp} tp={tp}")

    optimizer = build_optimizer(train, trainable)
    state = TrainState(params, optimizer.init(params))

    def checkpoint_fn(s: TrainState) -> None:
        from ..models.params import params_to_flat
        from ..utils.checkpoint import save_flat_checkpoint

        if method == "full":
            flat = params_to_flat(s.params, cfg)
        else:
            _, delta = lora_mod.split_lora_state(s.params) if method == "lora" else (None, None)
            if method != "lora":
                # adapter deltas: filter flat names
                flat_all = _flat_with_extras(s.params, cfg)
                flat = {
                    k: v for k, v in flat_all.items()
                    if adapter_mod.adapter_filter_flat(k, v2=method == "adapter_v2")
                }
            else:
                flat = _flatten_delta(delta)
        save_flat_checkpoint(flat, out_dir / f"{method}_weights.safetensors")

    state = fit(
        cfg, state, optimizer, train_iter,
        train=train, eval_args=eval, val_iter_fn=None, logger=logger, out_dir=out_dir,
        loss_fn=sft_loss_fn(cfg), checkpoint_fn=checkpoint_fn, mesh=mesh,
    )
    logger.finalize()
    print(f"finetune done at step {state.step}; weights in {out_dir}")


def _flatten_delta(tree: dict, prefix: str = "") -> dict:
    flat = {}
    for k, v in tree.items():
        name = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            flat.update(_flatten_delta(v, name))
        else:
            flat[name] = np.asarray(v)
    return flat


def _flat_with_extras(params: dict, cfg: Config) -> dict:
    """Flatten including non-lit extras (adapter leaves) by raw path names."""
    return _flatten_delta(params)


def main() -> None:
    from ..utils.cli import CLI

    CLI(setup)


if __name__ == "__main__":
    main()
