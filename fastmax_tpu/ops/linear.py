"""Linear / embedding application with pluggable weight representations.

Weights are stored in ``kernel`` convention (in_features, out_features) —
the natural layout for ``x @ W`` on the MXU. Checkpoint import/export
transposes to/from the torch (out, in) layout (see models/params.py).

A linear's parameter dict is either:
  {"kernel": (in, out) [, "bias": (out,)]}                 dense
  {"qweight": ..., "absmax": ..., "quant": "nf4"|...}      quantized (ops/quant.py)
plus optional LoRA terms {"lora_A", "lora_B"} handled by models/lora.py.
"""

from __future__ import annotations

import jax.numpy as jnp


def linear(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    if "kernel" in p:
        y = jnp.einsum("...i,io->...o", x, p["kernel"].astype(x.dtype))
    elif "q4" in p or "q8" in p or "q4r1" in p or "q4b" in p:
        from . import quant

        y = quant.quantized_matmul(x, p)
    else:
        raise KeyError(f"linear params missing weight: keys={list(p)}")
    if "lora_A" in p:
        # LoRA residual: ((x @ A) @ B) * (alpha/r), optionally output-masked
        # for the fused-QKV per-projection enable flags (models/lora.py)
        delta = jnp.einsum("...i,ir->...r", x, p["lora_A"].astype(x.dtype))
        delta = jnp.einsum("...r,ro->...o", delta, p["lora_B"].astype(x.dtype))
        delta = delta * p["lora_scale"].astype(x.dtype)
        if "lora_mask" in p:
            delta = delta * p["lora_mask"].astype(x.dtype)
        y = y + delta
    bias = p.get("bias")
    if bias is not None:
        y = y + bias.astype(y.dtype)
    if "adapter_scale" in p:
        # Adapter-v2 elementwise wrapper: scale * y + bias (models/adapter.py)
        y = y * p["adapter_scale"].astype(y.dtype) + p["adapter_bias"].astype(y.dtype)
    return y


def embedding(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(table, idx, axis=0)
