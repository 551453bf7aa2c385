"""Token sampling (temperature + top-k), ref generate/base.py:22-47.

The reference uses an exponential-race trick for CUDA-graph-friendly
multinomial sampling (generate/base.py:22-27); the JAX equivalent is the
Gumbel-max trick, which is both jit-friendly and reproducible from a PRNG
key — no mutable generator state.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def sample(
    logits: jnp.ndarray,
    key: jax.Array,
    temperature: float = 1.0,
    top_k: Optional[int] = None,
) -> jnp.ndarray:
    """Sample token ids from (..., vocab) logits.

    temperature == 0.0 is greedy argmax. top_k restricts sampling to the k
    most likely tokens.
    """
    logits = logits.astype(jnp.float32)
    if temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if top_k is not None:
        kth = jnp.sort(logits, axis=-1)[..., -top_k][..., None]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    logits = logits / temperature
    gumbel = -jnp.log(-jnp.log(jax.random.uniform(key, logits.shape) + 1e-20) + 1e-20)
    return jnp.argmax(logits + gumbel, axis=-1).astype(jnp.int32)


def sample_traced(logits, key, temperature, top_k_mask_value):
    """jit-friendly variant where temperature is a traced scalar.

    ``temperature==0`` falls back to argmax via lax.cond.
    """
    return jax.lax.cond(
        temperature > 0.0,
        lambda: _sample_t(logits, key, temperature, top_k_mask_value),
        lambda: jnp.argmax(logits, axis=-1).astype(jnp.int32),
    )


def _sample_t(logits, key, temperature, kth):
    logits = jnp.where(logits < kth, -jnp.inf, logits) / temperature
    gumbel = -jnp.log(-jnp.log(jax.random.uniform(key, logits.shape) + 1e-20) + 1e-20)
    return jnp.argmax(logits + gumbel, axis=-1).astype(jnp.int32)
