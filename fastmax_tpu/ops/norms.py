"""Normalization ops (functional, float32 accumulation).

TPU-native equivalents of the reference's norm layers: torch LayerNorm and
the fp32-upcasting RMSNorm with Gemma's unit offset
(/root/reference/lit_gpt/rmsnorm.py:6-34). Both upcast to float32 for the
reduction and cast back to the input dtype, which is the numerically stable
choice for bf16 activations on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x, weight, eps: float = 1e-5, add_unit_offset: bool = False):
    dtype = x.dtype
    x = x.astype(jnp.float32)
    norm_x = jnp.mean(x * x, axis=-1, keepdims=True)
    x_normed = x * jax.lax.rsqrt(norm_x + eps)
    w = weight.astype(jnp.float32)
    if add_unit_offset:
        w = 1.0 + w
    return (x_normed * w).astype(dtype)


def layer_norm(x, weight, bias, eps: float = 1e-5):
    dtype = x.dtype
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    x_normed = (x - mean) * (var + eps) ** -0.5
    out = x_normed * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(dtype)


def apply_norm(x, norm_params: dict, kind: str, eps: float, add_unit_offset: bool = False):
    if kind == "RMSNorm":
        return rms_norm(x, norm_params["weight"], eps, add_unit_offset)
    if kind == "LayerNorm":
        return layer_norm(x, norm_params["weight"], norm_params.get("bias"), eps)
    raise ValueError(f"Unknown norm class {kind!r}")
