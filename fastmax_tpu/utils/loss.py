"""Loss functions (the role of chunked_cross_entropy, ref lit_gpt/utils.py:228-272).

The reference chunks logits to cap peak memory of the fp32 (B*T, V) tensor.
Under XLA the same concern exists at trace level: computing the full logits
in fp32 for a 3B-vocab-padded model dominates activation memory. We chunk
the lm_head matmul + CE together so only (chunk, V) logits are ever live;
XLA additionally fuses the log-softmax into the matmul epilogue.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def cross_entropy(logits: jnp.ndarray, targets: jnp.ndarray, ignore_index: int = -1):
    """Mean CE over non-ignored targets. logits (..., V), targets (...)."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    tgt = jnp.where(targets == ignore_index, 0, targets)
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    mask = (targets != ignore_index).astype(jnp.float32)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def chunked_cross_entropy(
    hidden: jnp.ndarray,
    lm_head: dict,
    targets: jnp.ndarray,
    chunk_size: int = 128,
    ignore_index: int = -1,
):
    """CE over lm_head(hidden) without materializing all logits.

    hidden: (B, T, E) final hidden states; lm_head: linear param dict;
    targets: (B, T). Processes T in chunks of chunk_size.
    """
    from ..ops.linear import linear

    b, t, e = hidden.shape
    if chunk_size <= 0 or t <= chunk_size:
        return cross_entropy(linear(lm_head, hidden), targets, ignore_index)

    pad = (-t) % chunk_size
    if pad:
        hidden = jnp.pad(hidden, ((0, 0), (0, pad), (0, 0)))
        targets = jnp.pad(targets, ((0, 0), (0, pad)), constant_values=ignore_index)
    n_chunks = hidden.shape[1] // chunk_size
    hidden = hidden.reshape(b, n_chunks, chunk_size, e).transpose(1, 0, 2, 3)
    targets = targets.reshape(b, n_chunks, chunk_size).transpose(1, 0, 2)

    def body(carry, xs):
        h, tgt = xs
        logits = linear(lm_head, h).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        safe = jnp.where(tgt == ignore_index, 0, tgt)
        nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        mask = (tgt != ignore_index).astype(jnp.float32)
        loss_sum, count = carry
        return (loss_sum + jnp.sum(nll * mask), count + jnp.sum(mask)), None

    (loss_sum, count), _ = jax.lax.scan(body, (jnp.float32(0), jnp.float32(0)), (hidden, targets))
    return loss_sum / jnp.maximum(count, 1.0)
