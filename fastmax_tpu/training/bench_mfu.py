"""Training-step MFU benchmark.

The reference's headline training metric is model-FLOPs utilization
(xla/README.md:153: Falcon-7B adapter finetune at 49.57% MFU on v4-32;
tutorials/pretrain_tinyllama.md:19-25: TinyLlama at 52% MFU on 64xA100).
This harness measures the same quantity for this framework's jitted SPMD
train step on whatever chips are visible: a single chip benches the
kernel-level compute efficiency, a mesh benches it end-to-end with the
FSDP/TP collectives in the step.

  python -m fastmax_tpu.training.bench_mfu --model_name pythia-410m \
      --micro_batch 8 --seq_len 1024

Prints one JSON line with step time, tokens/sec, and MFU (estimate_flops
convention: fwd + 2x bwd, +attention term — ref lit_gpt/utils.py:309-339).
"""

from __future__ import annotations

import json
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding

from ..models.config import Config
from ..models import gpt
from ..parallel import sharding as sh
from ..utils.flops import estimate_flops, device_peak_flops
from ..utils.profiling import device_memory_stats


def make_bench_loss_fn(cfg: Config, remat: bool, lm_head_chunk: int = 128,
                       unroll: int = 1):
    """Chunked-CE loss (the finetune recipes' memory-bounded pattern)."""
    from ..utils.loss import chunked_cross_entropy

    def loss_fn(params, batch):
        inputs, targets = batch[:, :-1], batch[:, 1:]
        hidden = gpt.forward_hidden(params, cfg, inputs, remat=remat, unroll=unroll)
        return chunked_cross_entropy(hidden, params["lm_head"], targets, lm_head_chunk)

    return loss_fn


def run(
    model_name: str = "pythia-410m",
    seq_len: int = 1024,
    micro_batch: int = 8,
    attn_alg: Optional[str] = None,
    remat: str = "full",
    optimizer: str = "adamw",
    mu_dtype: str = "bfloat16",
    fsdp: int = 0,
    tp: int = 1,
    iters: int = 10,
    lm_head_chunk: int = 128,
    unroll: int = 1,
    accum: int = 1,
    trace_dir: Optional[str] = None,
) -> dict:
    """Measure train-step MFU. fsdp=0 means shard over all visible devices
    when more than one is present (single chip: no sharding)."""
    from ..utils.profiling import enable_compile_cache

    enable_compile_cache()
    cfg = Config.from_name(model_name)
    # benchmark exactly seq_len positions: shrink the rope/mask caches for
    # short runs AND extend them for beyond-native-context runs (min()
    # alone capped the rope cache below T and broke T > native benches)
    cfg.block_size = seq_len
    if attn_alg:
        cfg.attn_alg = attn_alg
    if remat in ("none", "False", "false"):
        remat = False  # type: ignore[assignment]

    n_dev = len(jax.devices())
    fsdp = fsdp or max(n_dev // tp, 1)
    mesh = sh.make_mesh(data=n_dev // (fsdp * tp), fsdp=fsdp, model=tp)
    batch_shards = (n_dev // (fsdp * tp)) * fsdp  # batch is sharded over (data, fsdp)
    if micro_batch % batch_shards:
        raise ValueError(
            f"micro_batch {micro_batch} must be divisible by data*fsdp = {batch_shards}"
        )

    params = gpt.init_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    specs = sh.param_specs(cfg, params, tp=tp > 1, fsdp_size=fsdp)
    params = sh.shard_params(params, mesh, specs)

    loss_fn = make_bench_loss_fn(cfg, remat, lm_head_chunk, unroll)
    # adamw is the reference recipe optimizer; adafactor (near-zero state,
    # the TPU-native choice) and lion (one bf16 moment) trade optimizer HBM
    # for activation headroom — e.g. they let remat="dots" fit where adamw's
    # f32 second moment forces remat="full"
    inner = {
        "adamw": lambda: optax.adamw(3e-4, b1=0.9, b2=0.95, weight_decay=0.02,
                                     mu_dtype=jnp.dtype(mu_dtype)),
        "adafactor": lambda: optax.adafactor(3e-4),
        "lion": lambda: optax.lion(3e-5, weight_decay=0.02,
                                   mu_dtype=jnp.dtype(mu_dtype)),
        "adamw8bit": lambda: __import__(
            "fastmax_tpu.training.quant_optim", fromlist=["adamw8bit"]
        ).adamw8bit(3e-4, b1=0.9, b2=0.95, weight_decay=0.02),
    }[optimizer]()
    optimizer_tx = optax.chain(optax.clip_by_global_norm(1.0), inner)
    opt_state = optimizer_tx.init(params)

    if micro_batch % accum:
        raise ValueError(f"micro_batch {micro_batch} must divide by accum={accum}")

    def step(params, opt_state, batch):
        # accum > 1: gradient accumulation over accum sub-micro-batches (the
        # reference's fabric.no_backward_sync pattern, finetune/lora.py:
        # 214-220) — same tokens per optimizer step at 1/accum the
        # activation memory, which lets remat="dots"/"dots_attn" fit where
        # the full micro-batch OOMs
        if accum == 1:
            loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        else:
            chunks = batch.reshape(accum, batch.shape[0] // accum, batch.shape[1])

            def acc_body(carry, chunk):
                tl, tg = carry
                l, g = jax.value_and_grad(loss_fn)(params, chunk)
                return (tl + l, jax.tree.map(jnp.add, tg, g)), None

            zeros = jax.tree.map(jnp.zeros_like, params)
            (loss_sum, gsum), _ = jax.lax.scan(
                acc_body, (jnp.float32(0), zeros), chunks
            )
            loss = loss_sum / accum
            grads = jax.tree.map(lambda g: g / accum, gsum)
        updates, opt_state = optimizer_tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def many_steps(params, opt_state, batch, n):
        # the whole timing loop runs on device in ONE dispatch: per-call
        # host->device launch latency (large through tunneled chips) would
        # otherwise dominate and the timing would not measure the step
        def body(_, carry):
            p, o, _ = carry
            return step(p, o, batch)

        return jax.lax.fori_loop(0, n, body, (params, opt_state, jnp.float32(0)))

    batch = jnp.asarray(
        np.random.default_rng(0).integers(0, cfg.vocab_size, (micro_batch, seq_len + 1)),
        jnp.int32,
    )
    batch = jax.device_put(batch, NamedSharding(mesh, sh.batch_spec()))

    with mesh:
        # n is traced: the warmup call (n=1) and the timed call (n=iters)
        # share one executable, and chained params defeat upstream
        # call-memoization on tunneled runtimes
        jmany = jax.jit(many_steps, donate_argnums=(0, 1))
        t0 = time.perf_counter()
        params, opt_state, loss = jmany(params, opt_state, batch, 1)
        float(loss)  # fetch, not block_until_ready: tunneled runtimes ack early
        compile_s = time.perf_counter() - t0

        if trace_dir:
            from ..utils.profiling import trace

            with trace(trace_dir):
                params, opt_state, loss = jmany(params, opt_state, batch, 1)
                float(loss)

        t0 = time.perf_counter()
        params, opt_state, loss = jmany(params, opt_state, batch, iters)
        float(loss)
        dt = (time.perf_counter() - t0) / iters

    tokens_per_step = micro_batch * seq_len
    tps = tokens_per_step / dt
    flops_per_seq = estimate_flops(cfg, n_params, seq_len, training=True)
    kind = jax.devices()[0].device_kind
    total_peak = device_peak_flops(kind) * n_dev
    mfu = flops_per_seq * micro_batch / dt / total_peak
    mem = device_memory_stats()
    out = {
        "model": model_name,
        "remat": remat or "none",
        "unroll": unroll,
        "lm_head_chunk": lm_head_chunk,
        "optimizer": optimizer,
        "accum": accum,
        "attn_alg": cfg.attn_alg,
        "devices": n_dev,
        "device_kind": kind,
        "micro_batch": micro_batch,
        "seq_len": seq_len,
        "n_params": n_params,
        "step_time_ms": round(dt * 1e3, 2),
        "tokens_per_sec": round(tps, 1),
        "mfu": round(float(mfu), 4),
        "loss": round(float(loss), 4),
        "compile_s": round(compile_s, 1),
        "peak_hbm_gb": round(mem["peak_bytes_in_use"] / 2**30, 2),
    }
    return out


def main() -> None:
    from ..utils.cli import CLI

    print(json.dumps(CLI(run)))


if __name__ == "__main__":
    main()
