"""Rotary position embeddings (half-rotation layout).

Matches the reference semantics (lit_gpt/model.py:677-708): theta_i =
base^(-2i/d), positions divided by ``condense_ratio`` (the position
interpolation context-extension mechanism used by LongChat-16k /
LLaMA-2-7B-32K), cos/sin caches of shape (seq_len, n_elem) with the
frequency vector tiled twice, and rotation x -> (x*cos + rotate_half(x)*sin)
where rotate_half concatenates (-x2, x1) of the two halves.

The cache is computed in float32 and the rotated output is cast back to the
activation dtype, mirroring apply_rope's ``.to(dtype=x.dtype)``.
"""

from __future__ import annotations

import jax.numpy as jnp


def build_rope_cache(
    seq_len: int,
    n_elem: int,
    base: int = 10000,
    condense_ratio: int = 1,
):
    """Return (cos, sin), each of shape (seq_len, n_elem), float32."""
    theta = 1.0 / (base ** (jnp.arange(0, n_elem, 2, dtype=jnp.float32) / n_elem))
    seq_idx = jnp.arange(seq_len, dtype=jnp.float32) / condense_ratio
    idx_theta = jnp.outer(seq_idx, theta)
    idx_theta = jnp.concatenate([idx_theta, idx_theta], axis=-1)
    return jnp.cos(idx_theta), jnp.sin(idx_theta)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate the last dim of ``x``.

    x: (..., T, n_elem); cos/sin: (T, n_elem) broadcast over leading dims.
    """
    half = x.shape[-1] // 2
    x1 = x[..., :half]
    x2 = x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    roped = x * cos + rotated * sin
    return roped.astype(x.dtype)
