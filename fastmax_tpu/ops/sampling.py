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


def filtered_log_probs(
    logits: jnp.ndarray, temperature: float, top_k: Optional[int] = None
) -> jnp.ndarray:
    """Log-probs of the distribution ``sample`` draws from (top-k filter,
    then temperature-scaled softmax). temperature must be > 0."""
    logits = logits.astype(jnp.float32)
    if top_k is not None:
        kth = jnp.sort(logits, axis=-1)[..., -top_k][..., None]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    return jax.nn.log_softmax(logits / temperature, axis=-1)


def speculative_accept(
    logits: jnp.ndarray,
    draft: jnp.ndarray,
    key: jax.Array,
    temperature: float,
    top_k: Optional[int] = None,
):
    """Speculative-sampling rejection rule for a deterministic draft.

    The standard rule (Leviathan et al. 2023) specialized to a point-mass
    draft distribution q = onehot(d_i): accept d_i with probability
    min(1, p_i(d_i)/q_i(d_i)) = p_i(d_i); on the first rejection emit a
    token from norm(max(p_i - q_i, 0)) — p_i with d_i removed and
    renormalized; if every draft is accepted emit a bonus token from
    p_k. Each emitted token is marginally distributed exactly as p_i, so
    the generated sequence has the same distribution as plain
    temperature/top-k ancestral sampling.

    logits: (k+1, V) verifier logits over [current, draft tokens];
    draft: (k,) drafted token ids. Returns ``(a, tokens)`` where
    ``a`` in [0, k] is the number of accepted drafts and ``tokens`` (k+1,)
    holds the accepted drafts in [:a] and the resampled/bonus token at
    [a]; entries past ``a`` are undefined.
    """
    k = draft.shape[0]
    v = logits.shape[-1]
    # point-mass q: logq = 0 at the drafted token, -inf elsewhere
    logq = jnp.where(
        jnp.arange(v)[None, :] == draft[:, None], 0.0, -jnp.inf
    )
    return speculative_accept_logq(logits, draft, logq, key, temperature, top_k)


def speculative_accept_logq(
    logits: jnp.ndarray,
    draft: jnp.ndarray,
    logq: jnp.ndarray,
    key: jax.Array,
    temperature: float,
    top_k: Optional[int] = None,
):
    """General speculative-sampling rejection rule (Leviathan et al. 2023).

    Draft token d_i was sampled from the draft distribution q_i; it is
    accepted with probability min(1, p_i(d_i) / q_i(d_i)); on the first
    rejection the emitted token is drawn from the residual
    norm(max(p_i - q_i, 0)); on full acceptance a bonus token is drawn
    from p_k. Each emitted token is marginally distributed exactly as p_i.

    logits: (k+1, V) verifier logits; draft: (k,) drafted ids;
    logq: (k, V) the log-probabilities of the distributions the drafts were
    sampled from (already temperature/top-k shaped by the drafter).
    Returns ``(a, tokens)`` as in ``speculative_accept``.
    """
    k = draft.shape[0]
    v = logits.shape[-1]
    logp = filtered_log_probs(logits, temperature, top_k)  # (k+1, V)
    key_u, key_r = jax.random.split(key)
    u = jax.random.uniform(key_u, (k,))
    idx = jnp.arange(k)
    ratio = jnp.exp(jnp.minimum(logp[idx, draft] - logq[idx, draft], 0.0))
    acc = (u < ratio).astype(jnp.int32)
    a = jnp.sum(jnp.cumprod(acc))  # accepted drafts in [0, k]
    # emission distribution: residual max(p_a - q_a, 0) on a rejection
    # (a < k), plain p_k on full acceptance (q = 0 row)
    p_a = jnp.exp(logp[a])
    q_a = jnp.where(a < k, jnp.exp(logq[jnp.minimum(a, k - 1)]), jnp.zeros((v,)))
    res = jnp.clip(p_a - q_a, 0.0, None)
    # p == q makes the residual empty, but then the acceptance prob was 1
    # (up to rounding) — fall back to p_a for numerical safety
    res = jnp.where(jnp.sum(res) > 1e-9, res, p_a)
    gumbel = -jnp.log(-jnp.log(jax.random.uniform(key_r, (v,)) + 1e-20) + 1e-20)
    log_res = jnp.where(res > 0.0, jnp.log(jnp.maximum(res, 1e-30)), -jnp.inf)
    nxt = jnp.argmax(log_res + gumbel).astype(jnp.int32)
    tokens = jnp.concatenate([draft, jnp.zeros((1,), draft.dtype)])
    tokens = tokens.at[a].set(nxt)
    return a, tokens


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
