"""Prompt-lookup speculative decoding.

A TPU-native latency optimization absent from the reference (whose decode
is strictly one-token-at-a-time, generate/base.py:87-92). Decode on TPU is
weight-bandwidth-bound: a forward over k+1 tokens streams the same bytes
from HBM as a forward over 1 token, so verifying k drafted tokens per step
is nearly free — every accepted draft is a decode step saved.

Two verification modes:

* ``temperature=0`` — greedy: a draft is accepted iff it equals the
  verifier's argmax; equivalence with plain greedy decode is guaranteed by
  construction (rejected drafts fall back to the verifier's own argmax).
* ``temperature>0`` — speculative sampling: the Leviathan et al. (2023)
  rejection rule specialized to deterministic drafts
  (``ops/sampling.speculative_accept``): accept draft d_i with probability
  p_i(d_i), on rejection resample from p_i with d_i removed. Every emitted
  token is marginally distributed exactly as plain temperature/top-k
  sampling from the same model.

The usual speculative caveat applies:
equivalence is exact up to the numerical determinism of the forward pass
across sequence lengths — in bf16 a T=k+1 forward can differ from a T=1
forward by ~1 ulp (measured 0.008 absolute on TPU v5e), which can flip a
near-tied argmax; every emitted token is still the argmax of a real
forward over the decided prefix.

Drafting needs no auxiliary model: the draft for position p is the k
tokens that followed the most recent earlier occurrence of the current
bigram in the sequence history ("prompt lookup"), found with static-shape
vector ops over the token buffer. Highly effective for extraction,
summarization, code editing, and repetitive text; harmless otherwise.

Cache-consistency argument (why rejected drafts need no rollback): writes
land at positions pos-1..pos+k-1; after accepting `a` drafts the next
step's first token is re-written at position pos+a before any read of the
stale entries, and attention masks by absolute position, so entries beyond
the current length are never attended to.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.sampling import sample, speculative_accept, speculative_accept_logq


def ngram_draft(hist: jnp.ndarray, pos: jnp.ndarray, k: int, max_seq: int) -> jnp.ndarray:
    """Draft k tokens by bigram lookup in ``hist[:pos]``.

    hist: (S,) decided tokens (prompt + generated), pos: current length.
    Returns (k,) int32 draft (falls back to repeating the last token).
    """
    s = hist.shape[0]
    idx = jnp.arange(s)
    b0 = hist[jnp.maximum(pos - 2, 0)]
    b1 = hist[jnp.maximum(pos - 1, 0)]
    nxt = jnp.roll(hist, -1)
    # candidate match start i: hist[i]==b0, hist[i+1]==b1, i+2 <= pos-2
    # (strictly earlier than the current bigram itself)
    ok = (hist == b0) & (nxt == b1) & (idx + 2 <= pos - 2)
    any_ok = jnp.any(ok)
    best = jnp.max(jnp.where(ok, idx, -1))  # most recent occurrence
    start = jnp.clip(best + 2, 0, max_seq - k)
    looked = jax.lax.dynamic_slice(hist, (start,), (k,))
    return jnp.where(any_ok, looked, jnp.full((k,), hist[jnp.maximum(pos - 1, 0)]))


def _commit(hist, pos, cand, a, k: int, eos_id, limit):
    """Scatter this verify step's decided tokens (cand[:a+1]) into ``hist``
    at pos.., honoring eos and the token budget. Returns
    (hist, new_pos, done)."""
    within = jnp.arange(k + 1)
    take = within <= a
    if eos_id is not None:
        seen_eos = jnp.cumsum((cand == eos_id) & take) > 0
        # keep the eos itself, drop everything after it
        take = take & ~jnp.roll(seen_eos, 1).at[0].set(False)
    take = take & (pos + within < limit)
    n_new = jnp.sum(take.astype(jnp.int32))
    # scatter the decided tokens into hist at pos..pos+n_new-1
    # (hist carries k+1 slack entries so this never clamps)
    seg = jax.lax.dynamic_slice(hist, (pos,), (k + 1,))
    seg = jnp.where(take, cand, seg)
    hist = jax.lax.dynamic_update_slice(hist, seg, (pos,))
    done = jnp.asarray(False)
    if eos_id is not None:
        done = jnp.any((cand == eos_id) & take)
    pos = pos + n_new
    return hist, pos, done | (pos >= limit)


class SpeculativeDecoder:
    """Decode with prompt-lookup speculation for a batch-1 engine.

    Usage: SpeculativeDecoder(engine, k=8).generate(prompt, max_returned)
    — temperature=0 output is exactly the engine's greedy output;
    temperature>0 output is distributed exactly as the engine's sampled
    output (rejection sampling, see module docstring).
    """

    def __init__(self, engine, k: int = 8):
        if engine.batch_size != 1:
            raise ValueError("speculative decoding supports batch_size=1")
        if engine._linear_alg:
            raise ValueError(
                "speculative decoding requires the KV-cache (quadratic) path: "
                "linear-attention running state cannot roll back rejected drafts"
            )
        self.engine = engine
        self.k = k
        self._loop = jax.jit(
            partial(self._loop_impl, k=k),
            static_argnames=("eos_id", "temperature", "top_k"),
            donate_argnums=(1,),
        )

    # ------------------------------------------------------------------ loop

    def _loop_impl(
        self, params, cache, hist, pos0, limit, key,
        *, k: int, eos_id, temperature: float = 0.0, top_k=None,
    ):
        """hist: (S,) with prompt + first sampled token decided; pos0 = its
        length. Decode until eos or ``limit`` tokens total."""
        eng = self.engine

        def cond(carry):
            pos, _, _, _, done, _ = carry
            return (pos < limit) & ~done

        def body(carry):
            pos, hist, cache, key, done, n_steps = carry
            draft = ngram_draft(hist, pos, k, hist.shape[0])
            cur = hist[pos - 1]
            x = jnp.concatenate([cur[None], draft])[None]  # (1, k+1)
            logits, cache = eng._model_step(params, x, cache, pos - 1)
            if temperature > 0.0:
                key, sub = jax.random.split(key)
                a, cand = speculative_accept(
                    logits[0], draft, sub, temperature, top_k
                )
            else:
                greedy = jnp.argmax(logits[0].astype(jnp.float32), axis=-1).astype(jnp.int32)
                matches = (draft == greedy[:-1]).astype(jnp.int32)
                a = jnp.sum(jnp.cumprod(matches))  # accepted drafts in [0, k]
                # decided tokens this step: greedy[0..a] (a+1 of them)
                cand = greedy  # (k+1,)
            hist, pos, done_now = _commit(hist, pos, cand, a, k, eos_id, limit)
            return pos, hist, cache, key, done_now, n_steps + 1

        done0 = jnp.asarray(False)
        if eos_id is not None:
            done0 = hist[pos0 - 1] == eos_id
        pos, hist, cache, _, _, n_steps = jax.lax.while_loop(
            cond, body, (pos0, hist, cache, key, done0, jnp.asarray(0))
        )
        return hist, pos, n_steps

    # -------------------------------------------------------------- generate

    def generate(
        self,
        prompt: jnp.ndarray,
        max_returned_tokens: int,
        *,
        eos_id: Optional[int] = None,
        temperature: float = 0.0,
        top_k: Optional[int] = None,
        key: Optional[jax.Array] = None,
    ) -> jnp.ndarray:
        """Generate with speculation; temperature=0 output is identical to
        engine.generate(..., temperature=0), temperature>0 output follows
        the engine's sampling distribution exactly (rejection rule).
        Returns (1, n) including the prompt."""
        import time as _time

        import numpy as np

        eng = self.engine
        if prompt.ndim == 1:
            prompt = prompt[None]
        t = prompt.shape[1]
        if max_returned_tokens + self.k + 1 > eng.max_seq_length:
            # a verify step writes up to k+1 cache rows past the current
            # position; the engine's cache must carry that slack
            raise ValueError(
                f"max_returned_tokens {max_returned_tokens} + k+1 ({self.k + 1}) "
                f"exceeds max_seq_length {eng.max_seq_length}; size the engine "
                "with extra headroom for speculation"
            )

        if key is None:
            key = jax.random.PRNGKey(int(_time.time_ns()) % (2**31))
        cache = eng.new_cache()
        logits, cache = eng._prefill(eng.params, prompt.astype(jnp.int32), cache, 0)
        key, sub = jax.random.split(key)
        first = sample(logits[0], sub, temperature, top_k).astype(jnp.int32)

        hist = jnp.zeros((eng.max_seq_length + self.k + 1,), jnp.int32)
        hist = jax.lax.dynamic_update_slice(hist, prompt[0].astype(jnp.int32), (0,))
        hist = hist.at[t].set(first)

        limit = jnp.asarray(max_returned_tokens, jnp.int32)
        hist, pos, n_steps = self._loop(
            eng.params, cache, hist, jnp.asarray(t + 1, jnp.int32), limit, key,
            eos_id=eos_id, temperature=temperature, top_k=top_k,
        )
        self.last_steps = int(n_steps)  # verify forwards used (diagnostics)
        pos = int(pos)
        out = hist[:pos][None]
        if eos_id is not None:
            arr = np.asarray(out[0])
            hits = (arr[t:] == eos_id).nonzero()[0]
            if hits.size:
                out = out[:, : t + int(hits[0]) + 1]
        return out


class DraftSpeculativeDecoder:
    """Draft-model speculative decoding for a batch-1 engine pair.

    A small draft model proposes k tokens autoregressively; the target
    verifies all k+1 positions in one forward and applies the general
    rejection rule (``ops/sampling.speculative_accept_logq``): accept d_i
    with probability min(1, p_i(d_i)/q_i(d_i)), resample the first
    rejection from norm(max(p_i - q_i, 0)). Emitted tokens are distributed
    exactly as the target's own temperature/top-k sampling; at
    temperature 0 the output is exactly the target's greedy decode.

    Cache consistency without rollback: both KV caches mask by absolute
    position, so stale entries past the decided length are never attended
    to before being overwritten. The draft's verify-round forward re-feeds
    the last TWO decided tokens (a full-acceptance round leaves the bonus
    token and the final draft position unwritten in the draft cache — a
    two-token hole at pos-2, pos-1; the T=2 forward writes both k/v rows
    before its attention reads them).

    Usage::

        spec = DraftSpeculativeDecoder(target_engine, draft_engine, k=4)
        out = spec.generate(prompt, max_returned, temperature=0.8)
    """

    def __init__(self, engine, draft_engine, k: int = 4):
        for eng, name in ((engine, "target"), (draft_engine, "draft")):
            if eng.batch_size != 1:
                raise ValueError(f"{name} engine must have batch_size=1")
            if eng._linear_alg:
                raise ValueError(
                    f"{name} engine must use the KV-cache (quadratic) path"
                )
        tv = engine.cfg.padded_vocab_size
        dv = draft_engine.cfg.padded_vocab_size
        if tv != dv:
            raise ValueError(
                f"target/draft padded vocab sizes differ ({tv} vs {dv}); "
                "the rejection rule subtracts the distributions elementwise"
            )
        self.engine = engine
        self.draft = draft_engine
        self.k = k
        self._loop = jax.jit(
            partial(self._loop_impl, k=k),
            static_argnames=("eos_id", "temperature", "top_k"),
            donate_argnums=(2, 3),
        )

    # ------------------------------------------------------------------ loop

    def _draft_tokens(self, dparams, dcache, hist, pos, key, k, temperature, top_k):
        """Run the draft model k steps. Returns (draft (k,), logq (k, V),
        dcache, key). The first forward is T=2 over the last two decided
        tokens (see class docstring)."""
        from ..ops.sampling import filtered_log_probs

        deng = self.draft
        x2 = jax.lax.dynamic_slice(hist, (pos - 2,), (2,))[None]  # (1, 2)
        logits, dcache = deng._model_step(dparams, x2, dcache, pos - 2)
        v = logits.shape[-1]

        def pick(logits_row, key):
            if temperature > 0.0:
                lq = filtered_log_probs(logits_row, temperature, top_k)
                key, sub = jax.random.split(key)
                g = -jnp.log(-jnp.log(jax.random.uniform(sub, (v,)) + 1e-20) + 1e-20)
                tok = jnp.argmax(lq + g).astype(jnp.int32)
            else:
                tok = jnp.argmax(logits_row.astype(jnp.float32)).astype(jnp.int32)
                lq = jnp.zeros((v,))  # unused in greedy verification
            return tok, lq, key

        d0, lq0, key = pick(logits[0, -1], key)

        def dstep(carry, _):
            tok, ip, dcache, key = carry
            logits, dcache = deng._model_step(dparams, tok[None, None], dcache, ip)
            nxt, lq, key = pick(logits[0, -1], key)
            return (nxt, ip + 1, dcache, key), (nxt, lq)

        if k > 1:
            (_, _, dcache, key), (rest, lq_rest) = jax.lax.scan(
                dstep, (d0, jnp.asarray(pos, jnp.int32), dcache, key), None,
                length=k - 1,
            )
            draft = jnp.concatenate([d0[None], rest])
            logq = jnp.concatenate([lq0[None], lq_rest])
        else:
            draft, logq = d0[None], lq0[None]
        return draft, logq, dcache, key

    def _loop_impl(
        self, tparams, dparams, tcache, dcache, hist, pos0, limit, key,
        *, k: int, eos_id, temperature: float = 0.0, top_k=None,
    ):
        eng = self.engine

        def cond(carry):
            pos, _, _, _, _, done, _, _ = carry
            return (pos < limit) & ~done

        def body(carry):
            pos, hist, tcache, dcache, key, done, n_steps, n_acc = carry
            draft, logq, dcache, key = self._draft_tokens(
                dparams, dcache, hist, pos, key, k, temperature, top_k
            )
            cur = hist[pos - 1]
            x = jnp.concatenate([cur[None], draft])[None]  # (1, k+1)
            logits, tcache = eng._model_step(tparams, x, tcache, pos - 1)
            if temperature > 0.0:
                key, sub = jax.random.split(key)
                a, cand = speculative_accept_logq(
                    logits[0], draft, logq, sub, temperature, top_k
                )
            else:
                greedy = jnp.argmax(logits[0].astype(jnp.float32), axis=-1).astype(jnp.int32)
                matches = (draft == greedy[:-1]).astype(jnp.int32)
                a = jnp.sum(jnp.cumprod(matches))
                cand = greedy
            hist, pos, done_now = _commit(hist, pos, cand, a, k, eos_id, limit)
            return pos, hist, tcache, dcache, key, done_now, n_steps + 1, n_acc + a

        done0 = jnp.asarray(False)
        if eos_id is not None:
            done0 = hist[pos0 - 1] == eos_id
        pos, hist, tcache, dcache, _, _, n_steps, n_acc = jax.lax.while_loop(
            cond, body,
            (pos0, hist, tcache, dcache, key, done0, jnp.asarray(0), jnp.asarray(0, jnp.int32)),
        )
        return hist, pos, n_steps, n_acc

    # -------------------------------------------------------------- generate

    def generate(
        self,
        prompt: jnp.ndarray,
        max_returned_tokens: int,
        *,
        eos_id: Optional[int] = None,
        temperature: float = 0.0,
        top_k: Optional[int] = None,
        key: Optional[jax.Array] = None,
    ) -> jnp.ndarray:
        """Generate with draft-model speculation. Returns (1, n) including
        the prompt; sets ``last_steps`` (verify forwards) and
        ``last_accepted`` (drafts accepted) diagnostics."""
        import time as _time

        import numpy as np

        eng, deng = self.engine, self.draft
        if prompt.ndim == 1:
            prompt = prompt[None]
        t = prompt.shape[1]
        if t < 2:
            raise ValueError("draft speculation needs a prompt of >= 2 tokens")
        for e, name in ((eng, "target"), (deng, "draft")):
            if max_returned_tokens + self.k + 1 > e.max_seq_length:
                raise ValueError(
                    f"max_returned_tokens {max_returned_tokens} + k+1 ({self.k + 1}) "
                    f"exceeds the {name} engine's max_seq_length {e.max_seq_length}; "
                    "size both engines with headroom for speculation"
                )
        if key is None:
            key = jax.random.PRNGKey(int(_time.time_ns()) % (2**31))

        tcache = eng.new_cache()
        dcache = deng.new_cache()
        logits, tcache = eng._prefill(eng.params, prompt.astype(jnp.int32), tcache, 0)
        _, dcache = deng._prefill(deng.params, prompt.astype(jnp.int32), dcache, 0)
        key, sub = jax.random.split(key)
        first = sample(logits[0], sub, temperature, top_k).astype(jnp.int32)

        hist = jnp.zeros((eng.max_seq_length + self.k + 1,), jnp.int32)
        hist = jax.lax.dynamic_update_slice(hist, prompt[0].astype(jnp.int32), (0,))
        hist = hist.at[t].set(first)

        limit = jnp.asarray(max_returned_tokens, jnp.int32)
        hist, pos, n_steps, n_acc = self._loop(
            eng.params, deng.params, tcache, dcache, hist,
            jnp.asarray(t + 1, jnp.int32), limit, key,
            eos_id=eos_id, temperature=temperature, top_k=top_k,
        )
        self.last_steps = int(n_steps)
        self.last_accepted = int(n_acc)
        pos = int(pos)
        out = hist[:pos][None]
        if eos_id is not None:
            arr = np.asarray(out[0])
            hits = (arr[t:] == eos_id).nonzero()[0]
            if hits.size:
                out = out[:, : t + int(hits[0]) + 1]
        return out
