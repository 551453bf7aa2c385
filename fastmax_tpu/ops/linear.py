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

import jax
import jax.numpy as jnp


def slice_layer(p: dict, layer) -> dict:
    """Per-layer view of a stacked linear param dict: every array leaf
    (all carry a leading n_layer axis in the stacked layout, including the
    per-layer codebook copy) is dynamically indexed."""
    return {
        k: (jax.lax.dynamic_index_in_dim(v, layer, 0, keepdims=False)
            if hasattr(v, "ndim") and v.ndim >= 1 else v)
        for k, v in p.items()
    }


def linear(p: dict, x: jnp.ndarray, layer=None) -> jnp.ndarray:
    """Apply a linear. ``layer`` selects STACKED mode: ``p``'s leaves carry
    a leading (n_layer,) axis and this call computes layer ``layer``. The
    tiled-int4 serving format reads the stack directly inside its Pallas
    kernel (prefetched layer index — slicing a 25 MB weight leaf into a
    pallas operand materializes a copy; measured r05: the decode layer
    scan ran at 404 vs ~620 GB/s because of exactly that,
    decode_profile_r05f.jsonl). Other representations fall back to a
    dynamic per-layer view, which XLA fuses into its own dot reads."""
    if layer is not None:
        if "q4r1" in p and "lora_A" not in p and "bias" not in p \
                and jax.default_backend() == "tpu":
            from .quant_pallas import int4_matmul_rank1_stacked

            return int4_matmul_rank1_stacked(x, p, layer)
        p = slice_layer(p, layer)
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
