"""QLoRA train-step benchmark at reference scale: Llama-2-7B frozen
quantized base + LoRA adapters — the reference's headline finetune
workload (tutorials/resource-tables.md:53-55 pairs tok/s-equivalents and
GB for LoRA-7B; finetune/lora.py is the recipe).

Base weights are the bench.py int8 serving representation built on-device
(random values; per-token bandwidth/compute identical to a converted
checkpoint — docs/accuracy.md bounds the int8-vs-nf4 numerics). Gradients
flow only to the LoRA leaves (frozen-base masked optimizer, the
mark_only_lora_as_trainable semantics).

  python tools/qlora_7b_bench.py --micro_batch 8 --seq_len 512

Prints one JSON line: step time, tokens/sec, min per 1k iters (the
reference's unit), MFU under the standard fwd+2bwd credit.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--micro_batch", type=int, default=8)
    ap.add_argument("--seq_len", type=int, default=512)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--lora_r", type=int, default=16)
    ap.add_argument("--base", choices=["int8", "bf16"], default="int8",
                    help="frozen-base representation: int8 (QLoRA-style) or "
                         "dense bf16 (the reference's 'no quantize' LoRA row)")
    args = ap.parse_args()

    from fastmax_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import optax

    from bench import build_fake_7b_int8
    from fastmax_tpu.models import gpt
    from fastmax_tpu.models import lora as lora_mod
    from fastmax_tpu.models.config import Config
    from fastmax_tpu.utils.flops import device_peak_flops, estimate_flops
    from fastmax_tpu.utils.loss import chunked_cross_entropy
    from fastmax_tpu.utils.profiling import device_memory_stats

    cfg = Config.from_name("Llama-2-7b-hf")
    cfg.block_size = args.seq_len

    t0 = time.perf_counter()
    params = build_fake_7b_int8(cfg)
    if args.base == "bf16":
        from fastmax_tpu.ops.quant import dequantize_model

        params = dequantize_model(params, jnp.bfloat16)
    jax.block_until_ready(params)
    print(f"7B {args.base} base build: {time.perf_counter()-t0:.0f}s", file=sys.stderr)

    lcfg = lora_mod.LoRAConfig(r=args.lora_r, alpha=2 * args.lora_r,
                               query=True, key=True, value=True)
    params = lora_mod.add_lora_params(params, cfg, lcfg, jax.random.PRNGKey(1),
                                     jnp.bfloat16)
    base, lora_only = lora_mod.split_lora_state(params)
    n_lora = sum(x.size for x in jax.tree.leaves(lora_only))
    print(f"lora trainable params: {n_lora/1e6:.1f}M", file=sys.stderr)

    def merge(b, l):
        if not isinstance(b, dict):
            return b
        out = dict(b)
        for k, v in (l or {}).items():
            out[k] = merge(b[k], v) if k in b and isinstance(b[k], dict) else v
        return out

    def loss_fn(lora_p, base_p, batch):
        p = merge(base_p, lora_p)
        inputs, targets = batch[:, :-1], batch[:, 1:]
        hidden = gpt.forward_hidden(p, cfg, inputs, remat=True)
        return chunked_cross_entropy(hidden, p["lm_head"], targets, 128)

    tx = optax.adamw(1e-4, b1=0.9, b2=0.95, weight_decay=0.01)
    opt_state = tx.init(lora_only)

    def step(lora_p, opt_state, base_p, batch):
        loss, grads = jax.value_and_grad(loss_fn)(lora_p, base_p, batch)
        updates, opt_state = tx.update(grads, opt_state, lora_p)
        return optax.apply_updates(lora_p, updates), opt_state, loss

    def many(lora_p, opt_state, base_p, batch, n):
        def body(_, carry):
            lp, os_, _ = carry
            return step(lp, os_, base_p, batch)

        return jax.lax.fori_loop(0, n, body, (lora_p, opt_state, jnp.float32(0)))

    batch = jnp.asarray(
        np.random.default_rng(0).integers(1, 32000,
                                          (args.micro_batch, args.seq_len + 1)),
        jnp.int32,
    )
    jmany = jax.jit(many, donate_argnums=(0, 1))
    t0 = time.perf_counter()
    lora_only, opt_state, loss = jmany(lora_only, opt_state, base, batch, 1)
    float(loss)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    lora_only, opt_state, loss = jmany(lora_only, opt_state, base, batch, args.iters)
    float(loss)
    dt = (time.perf_counter() - t0) / args.iters

    tokens = args.micro_batch * args.seq_len
    flops_seq = estimate_flops(cfg, 6_738_415_616, args.seq_len, training=True)
    peak = device_peak_flops(jax.devices()[0].device_kind)
    out = {
        "metric": f"qlora_7b_{args.base}_train",
        "micro_batch": args.micro_batch,
        "seq_len": args.seq_len,
        "lora_r": args.lora_r,
        "step_time_ms": round(dt * 1e3, 1),
        "tokens_per_sec": round(tokens / dt, 1),
        "min_per_1k_iters": round(dt * 1000 / 60, 2),
        "mfu": round(float(flops_seq * args.micro_batch / dt / peak), 4),
        "compile_s": round(compile_s, 1),
        "loss": round(float(loss), 4),
        "peak_hbm_gb": round(device_memory_stats()["peak_bytes_in_use"] / 2**30, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
