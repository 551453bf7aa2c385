"""Blockwise int8-quantized AdamW optimizer states.

The reference's QLoRA recipe swaps AdamW for bitsandbytes' ``PagedAdamW``
when the base model is quantized (finetune/lora.py:152-160) — an 8-bit
optimizer whose Adam moments live blockwise-quantized so optimizer state
stops dominating HBM. This is the TPU-native equivalent: an optax
``GradientTransformation`` that persists

* the first moment ``m`` as int8 with per-block (default 256 elements)
  float32 absmax scales, and
* the second moment ``v`` as uint8 in **sqrt space** (store q ≈ √v /
  scale, dequantize (q·scale)²) — the square root halves v's dynamic range
  in log space, which a per-block linear code then covers well; v ≥ 0 so
  the full unsigned range is used.

State cost: 1 byte + 1/block·4 bytes per parameter per moment, vs 4 bytes
for float32 Adam — ~4x less optimizer HBM, the same ratio bnb's 8-bit
optimizers deliver. The quantize→update→requantize round trip happens
inside the jitted update, so the fp32 moments are transient; only the
int8/uint8 buffers persist between steps.

Small tensors (norm gains, biases; fewer than ``min_quant_size`` elements)
keep exact float32 moments, mirroring bnb's ``min_8bit_size=4096`` — their
memory is negligible and their sensitivity highest. Non-float leaves
(packed 4-bit codes / int8 weights of a quantized base model) carry no
state and get zero updates, matching fit.value_and_grad_floats.

Update math mirrors ``optax.adamw`` exactly (bias-corrected moments,
``m̂/(√v̂+eps) + wd·p`` scaled by the schedule), so with quantization
disabled (all-small leaves) the two are numerically identical.
"""

from __future__ import annotations

from typing import Any, Callable, List, NamedTuple, Union

import jax
import jax.numpy as jnp
import optax

BLOCK = 256
MIN_QUANT_SIZE = 4096


# ------------------------------------------------------ blockwise int8 codecs


def _to_blocks(x: jnp.ndarray, block: int) -> jnp.ndarray:
    flat = x.reshape(-1)
    pad = (-flat.size) % block
    if pad:
        flat = jnp.pad(flat, (0, pad))
    return flat.reshape(-1, block)


def _from_blocks(b: jnp.ndarray, size: int, shape) -> jnp.ndarray:
    return b.reshape(-1)[:size].reshape(shape)


def quantize_m(m: jnp.ndarray, block: int = BLOCK) -> dict:
    """Signed absmax int8: q = round(m / (absmax/127)) per block."""
    fb = _to_blocks(m.astype(jnp.float32), block)
    absmax = jnp.max(jnp.abs(fb), axis=1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    q = jnp.round(fb / scale).astype(jnp.int8)
    return {"q": q, "scale": scale}


def dequantize_m(s: dict, size: int, shape) -> jnp.ndarray:
    return _from_blocks(s["q"].astype(jnp.float32) * s["scale"], size, shape)


def quantize_v(v: jnp.ndarray, block: int = BLOCK) -> dict:
    """Unsigned sqrt-space uint8: q = round(√v / (max(√v)/255)) per block."""
    rb = _to_blocks(jnp.sqrt(v.astype(jnp.float32)), block)
    scale = jnp.maximum(jnp.max(rb, axis=1, keepdims=True), 1e-12) / 255.0
    q = jnp.round(rb / scale).astype(jnp.uint8)
    return {"q": q, "scale": scale}


def dequantize_v(s: dict, size: int, shape) -> jnp.ndarray:
    r = s["q"].astype(jnp.float32) * s["scale"]
    return _from_blocks(r * r, size, shape)


# ------------------------------------------------------------- the optimizer


class AdamW8bitState(NamedTuple):
    count: jnp.ndarray
    m: List[Any]  # per-leaf: {"q","scale"} | f32 array | () for non-float
    v: List[Any]


def _quantized_leaf(p) -> bool:
    return p.size >= MIN_QUANT_SIZE


def adamw8bit(
    learning_rate: Union[float, Callable],
    b1: float = 0.9,
    b2: float = 0.95,
    eps: float = 1e-8,
    weight_decay: float = 0.02,
    block: int = BLOCK,
) -> optax.GradientTransformation:
    """AdamW with int8 blockwise-quantized moment state (see module doc)."""

    def init(params):
        flat, _ = jax.tree.flatten(params)
        m, v = [], []
        for p in flat:
            if not jnp.issubdtype(p.dtype, jnp.floating):
                m.append(())
                v.append(())
            elif _quantized_leaf(p):
                m.append(quantize_m(jnp.zeros(p.shape, jnp.float32), block))
                v.append(quantize_v(jnp.zeros(p.shape, jnp.float32), block))
            else:
                m.append(jnp.zeros(p.shape, jnp.float32))
                v.append(jnp.zeros(p.shape, jnp.float32))
        return AdamW8bitState(jnp.zeros((), jnp.int32), m, v)

    def update(grads, state, params=None):
        if params is None:
            raise ValueError("adamw8bit requires params (weight decay)")
        gflat, treedef = jax.tree.flatten(grads)
        pflat = jax.tree.leaves(params)
        count = optax.safe_int32_increment(state.count)
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)
        lr = learning_rate(count) if callable(learning_rate) else learning_rate

        updates, new_m, new_v = [], [], []
        for g, p, ms, vs in zip(gflat, pflat, state.m, state.v):
            if not jnp.issubdtype(p.dtype, jnp.floating):
                updates.append(jnp.zeros_like(p))
                new_m.append(())
                new_v.append(())
                continue
            quant = _quantized_leaf(p)
            g32 = g.astype(jnp.float32)
            m_f = dequantize_m(ms, p.size, p.shape) if quant else ms
            v_f = dequantize_v(vs, p.size, p.shape) if quant else vs
            m_f = b1 * m_f + (1.0 - b1) * g32
            v_f = b2 * v_f + (1.0 - b2) * g32 * g32
            m_hat = m_f / bc1
            v_hat = v_f / bc2
            step = m_hat / (jnp.sqrt(v_hat) + eps) + weight_decay * p.astype(jnp.float32)
            updates.append((-lr * step).astype(p.dtype))
            new_m.append(quantize_m(m_f, block) if quant else m_f)
            new_v.append(quantize_v(v_f, block) if quant else v_f)

        return jax.tree.unflatten(treedef, updates), AdamW8bitState(count, new_m, new_v)

    return optax.GradientTransformation(init, update)


def state_nbytes(state) -> int:
    """Total bytes of persisted optimizer state (for tests/reporting)."""
    return sum(x.nbytes for x in jax.tree.leaves(state))
