"""Continuous batching engine.

A capability the reference lacks (its decode loop is batch-1,
generate/base.py:50-93) and BASELINE.json asks for: a slotted KV cache
where sequences enter and leave the running batch independently.

Design (static shapes throughout, the XLA discipline):
* ``n_slots`` sequences share one cache (L, n_slots, G, S, hs);
* per-slot position and active-flag vectors drive a single jitted
  ``decode step`` that advances every active slot one token (inactive slots
  compute garbage that is masked out — compute is uniform, control flow is
  data);
* prefill runs per-request on a bucketed-length jit and its KV rows are
  written into the slot;
* the host-side scheduler (``ContinuousBatcher``) admits queued requests
  into free slots between steps and retires finished ones — the role a
  serving frontend plays around the device step.

``speculative_k > 0`` enables batched prompt-lookup speculation (quadratic
path only): every step drafts k tokens per slot from its own history on the
host, verifies all slots' drafts in one (n_slots, k+1) forward with
per-slot positions, and advances each slot by its accepted count + 1. At
temperature 0 emitted tokens match plain greedy decode exactly; at
temperature > 0 they follow the Leviathan rejection rule (see
inference/speculative.py for the cache-consistency argument — it is
per-slot positional, so it holds unchanged under slotting).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import Config
from ..models import gpt
from ..ops.rope import build_rope_cache
from ..ops.sampling import sample


@dataclass
class Request:
    request_id: int
    prompt: np.ndarray
    max_new_tokens: int
    temperature: float = 0.0
    top_k: Optional[int] = None
    eos_id: Optional[int] = None
    generated: List[int] = field(default_factory=list)
    done: bool = False


class ContinuousBatcher:
    def __init__(
        self,
        cfg: Config,
        params,
        *,
        n_slots: int = 4,
        max_seq_length: Optional[int] = None,
        prefill_bucket: int = 128,
        weights_mode: str = "auto",
        speculative_k: int = 0,
    ):
        from .engine import InferenceEngine

        self.cfg = cfg
        self.params = params = InferenceEngine.prepare_params(params, weights_mode)
        self.n_slots = n_slots
        self.max_seq_length = min(max_seq_length or cfg.block_size, cfg.block_size)
        self.prefill_bucket = prefill_bucket
        self.speculative_k = int(speculative_k)
        # a speculative verify writes k+1 cache rows past each slot's position
        self._headroom = self.speculative_k + 1
        self.rope = build_rope_cache(
            self.max_seq_length, cfg.rope_n_elem, cfg.rope_base, cfg.rope_condense_ratio
        )
        dtype = params["wte"].dtype
        self._linear_alg = cfg.attn_alg in ("fastmax", "fastmax_cuda", "linearmax", "performer")
        if self.speculative_k and self._linear_alg:
            raise ValueError(
                "speculative continuous batching requires the KV-cache "
                "(quadratic) path: linear-attention running state cannot "
                "roll back rejected drafts"
            )
        if self._linear_alg:
            # O(1)-state slots: one running linear-attention state per slot.
            # NOTE: linear-state prefill must see the EXACT prompt (padding
            # tokens would be absorbed into the running sums), so prefill
            # compiles per distinct prompt length instead of per bucket.
            self.cache = gpt.init_linear_cache(cfg, n_slots)
        else:
            self.cache = gpt.init_kv_cache(cfg, n_slots, self.max_seq_length, dtype)
        self.positions = np.zeros(n_slots, np.int32)  # next write position
        self.slots: List[Optional[Request]] = [None] * n_slots
        self.queue: List[Request] = []
        self._next_id = 0
        self._key = jax.random.PRNGKey(0)

        # single-sequence prefill over a bucketed length; returns last logits
        # and the new KV rows for the slot
        def prefill(params, tokens, n_valid, cache_k_row, cache_v_row):
            # tokens (1, Tb) padded; run as an independent batch-1 model pass
            row_cache = {"k": cache_k_row, "v": cache_v_row}
            logits, row_cache = gpt.forward(
                params, cfg, tokens, input_pos=0, kv_cache=row_cache, rope_cache=self.rope
            )
            last = jnp.take_along_axis(
                logits, (n_valid - 1)[None, None, None].astype(jnp.int32), axis=1
            )[:, 0]
            return last, row_cache["k"], row_cache["v"]

        # NOTE: no donation here — an identity slice (n_slots == 1) can alias
        # the whole cache, and donating it would delete the live cache
        self._prefill = jax.jit(prefill)

        def prefill_linear(params, tokens, n_valid, state_row):
            # bucketed prompt: rows >= n_valid are masked out of the running
            # sums inside the forward, so one compile serves all lengths in
            # the bucket
            logits, state_row = gpt.forward_linear_cache(
                params, cfg, tokens, state=state_row, input_pos=0,
                rope_cache=self.rope, is_prefill=True, n_valid=n_valid,
            )
            last = jnp.take_along_axis(
                logits, (n_valid - 1)[None, None, None].astype(jnp.int32), axis=1
            )[:, 0]
            return last, state_row

        self._prefill_linear = jax.jit(prefill_linear)

        def step(params, cache, tokens, positions, active, key, temperature, top_k):
            if self._linear_alg:
                logits, cache = gpt.forward_linear_cache(
                    params, cfg, tokens[:, None], state=cache,
                    input_pos=positions, rope_cache=self.rope, is_prefill=False,
                )
            else:
                logits, cache = gpt.forward(
                    params, cfg, tokens[:, None], input_pos=positions,
                    kv_cache=cache, rope_cache=self.rope,
                )
            logits = logits[:, -1, :].astype(jnp.float32)
            greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            # per-slot top-k threshold: the k-th largest logit of each row
            v = logits.shape[-1]
            asc = jnp.sort(logits, axis=-1)
            idx = jnp.clip(v - top_k, 0, v - 1)
            kth = jnp.take_along_axis(asc, idx[:, None], axis=1)[:, 0]
            gumbel = -jnp.log(-jnp.log(jax.random.uniform(key, logits.shape) + 1e-20) + 1e-20)
            sampled = jnp.argmax(
                jnp.where(logits < kth[:, None], -jnp.inf, logits)
                / jnp.maximum(temperature[:, None], 1e-6) + gumbel,
                axis=-1,
            ).astype(jnp.int32)
            nxt = jnp.where(temperature > 0, sampled, greedy)
            return nxt, cache

        self._step = jax.jit(step, donate_argnums=(1,))

        def step_spec(params, cache, tokens, positions, key, temperature, top_k):
            """Batched speculative verify: tokens (B, k+1) = [current, k
            drafts] per slot; returns (accepted counts a (B,), decided
            candidates cand (B, k+1) — cand[b, :a[b]+1] are this step's
            tokens — and the updated cache)."""
            kd = tokens.shape[1] - 1
            logits, cache = gpt.forward(
                params, cfg, tokens, input_pos=positions,
                kv_cache=cache, rope_cache=self.rope,
            )
            logits = logits.astype(jnp.float32)  # (B, k+1, V)
            bsz, v = logits.shape[0], logits.shape[-1]
            rows = jnp.arange(bsz)
            draft = tokens[:, 1:]
            greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (B, k+1)
            a_g = jnp.sum(
                jnp.cumprod((draft == greedy[:, :-1]).astype(jnp.int32), axis=1), axis=1
            )
            # ---- sampled path (Leviathan rule, point-mass drafts), per-slot
            # traced temperature/top-k (same filter construction as step())
            asc = jnp.sort(logits, axis=-1)
            idx = jnp.clip(v - top_k, 0, v - 1)
            kth = jnp.take_along_axis(
                asc, jnp.broadcast_to(idx[:, None, None], (bsz, kd + 1, 1)), axis=-1
            )
            filt = jnp.where(logits < kth, -jnp.inf, logits)
            logp = jax.nn.log_softmax(
                filt / jnp.maximum(temperature, 1e-6)[:, None, None], axis=-1
            )
            key_u, key_r = jax.random.split(key)
            u = jax.random.uniform(key_u, (bsz, kd))
            logp_d = jnp.take_along_axis(logp[:, :kd], draft[..., None], axis=-1)[..., 0]
            acc = (u < jnp.exp(logp_d)).astype(jnp.int32)
            a_s = jnp.sum(jnp.cumprod(acc, axis=1), axis=1)  # (B,)
            # residual resample at position a_s: p_a with the rejected draft
            # removed (a_s < k), plain p_k on full acceptance
            p_a = jnp.take_along_axis(
                jnp.exp(logp), jnp.broadcast_to(a_s[:, None, None], (bsz, 1, v)), axis=1
            )[:, 0]  # (B, V)
            d_a = jnp.take_along_axis(draft, jnp.minimum(a_s, kd - 1)[:, None], axis=1)[:, 0]
            res = jnp.where(
                (jnp.arange(v)[None, :] == d_a[:, None]) & (a_s[:, None] < kd), 0.0, p_a
            )
            res = jnp.where(jnp.sum(res, axis=1, keepdims=True) > 1e-9, res, p_a)
            gumbel = -jnp.log(-jnp.log(jax.random.uniform(key_r, (bsz, v)) + 1e-20) + 1e-20)
            nxt_s = jnp.argmax(
                jnp.where(res > 0.0, jnp.log(jnp.maximum(res, 1e-30)), -jnp.inf) + gumbel,
                axis=-1,
            ).astype(jnp.int32)
            cand_s = jnp.concatenate([draft, jnp.zeros((bsz, 1), draft.dtype)], axis=1)
            cand_s = cand_s.at[rows, a_s].set(nxt_s)
            # ---- merge: greedy rows take the verifier argmaxes directly
            a = jnp.where(temperature > 0, a_s, a_g)
            cand = jnp.where((temperature > 0)[:, None], cand_s, greedy)
            return a, cand, cache

        if self.speculative_k:
            self._step_spec = jax.jit(step_spec, donate_argnums=(1,))

    # ------------------------------------------------------------- requests

    def submit(self, prompt: np.ndarray, max_new_tokens: int, *,
               temperature: float = 0.0, top_k: Optional[int] = None,
               eos_id: Optional[int] = None) -> int:
        req = Request(self._next_id, np.asarray(prompt, np.int32), max_new_tokens,
                      temperature, top_k, eos_id)
        self._next_id += 1
        self.queue.append(req)
        return req.request_id

    def _admit(self) -> None:
        for slot in range(self.n_slots):
            if self.slots[slot] is None and self.queue:
                req = self.queue.pop(0)
                t = len(req.prompt)
                if self._linear_alg:
                    state_row = gpt.init_linear_cache(self.cfg, 1)
                    bucket = min(
                        self.max_seq_length,
                        ((t + self.prefill_bucket - 1) // self.prefill_bucket) * self.prefill_bucket,
                    )
                    padded = np.zeros(bucket, np.int32)
                    padded[:t] = req.prompt[:bucket]
                    last, state_row = self._prefill_linear(
                        self.params, jnp.asarray(padded)[None], jnp.asarray(t), state_row
                    )
                    for key_ in self.cache:
                        self.cache[key_] = (
                            self.cache[key_].at[:, slot : slot + 1].set(state_row[key_])
                        )
                else:
                    bucket = min(
                        self.max_seq_length,
                        ((t + self.prefill_bucket - 1) // self.prefill_bucket) * self.prefill_bucket,
                    )
                    padded = np.zeros(bucket, np.int32)
                    padded[:t] = req.prompt[:bucket]
                    k_row = self.cache["k"][:, slot : slot + 1]
                    v_row = self.cache["v"][:, slot : slot + 1]
                    last, k_row, v_row = self._prefill(
                        self.params, jnp.asarray(padded)[None], jnp.asarray(t), k_row, v_row
                    )
                    self.cache["k"] = self.cache["k"].at[:, slot : slot + 1].set(k_row)
                    self.cache["v"] = self.cache["v"].at[:, slot : slot + 1].set(v_row)
                self._key, sub = jax.random.split(self._key)
                first = int(sample(last[0], sub, req.temperature, req.top_k))
                req.generated.append(first)
                self.positions[slot] = t
                self.slots[slot] = req
                self._maybe_finish(slot, first)

    def _maybe_finish(self, slot: int, token: int) -> None:
        req = self.slots[slot]
        if req is None:
            return
        if (req.eos_id is not None and token == req.eos_id) or len(
            req.generated
        ) >= req.max_new_tokens or self.positions[slot] + self._headroom >= self.max_seq_length:
            req.done = True
            self.slots[slot] = None

    def _draft_np(self, req: Request, k: int) -> np.ndarray:
        """Host-side prompt-lookup draft: the k tokens that followed the most
        recent earlier occurrence of the current bigram in this request's
        history (see inference/speculative.ngram_draft — same rule, done in
        numpy because histories live on the host here)."""
        hist = np.concatenate([req.prompt, np.asarray(req.generated, np.int32)])
        n = len(hist)
        if n >= 4:
            b0, b1 = hist[-2], hist[-1]
            starts = np.nonzero((hist[:-1] == b0) & (hist[1:] == b1))[0]
            starts = starts[starts + 2 <= n - 2]  # strictly earlier occurrence
            if starts.size:
                d = hist[starts[-1] + 2 : starts[-1] + 2 + k]
                if d.size < k:
                    d = np.concatenate([d, np.full(k - d.size, hist[-1], np.int32)])
                return d.astype(np.int32)
        return np.full(k, hist[-1], np.int32)

    def step(self):
        """Advance every active slot; returns {request_id: token} (one token
        per slot), or {request_id: [tokens]} when ``speculative_k`` is set
        (one to k+1 tokens per slot per verify step)."""
        if self.speculative_k:
            return self._step_speculative()
        self._admit()
        active = np.asarray([s is not None for s in self.slots])
        if not active.any():
            return {}
        tokens = np.zeros(self.n_slots, np.int32)
        temps = np.zeros(self.n_slots, np.float32)
        topk = np.full(self.n_slots, self.cfg.padded_vocab_size, np.int32)
        for i, req in enumerate(self.slots):
            if req is not None:
                tokens[i] = req.generated[-1]
                temps[i] = req.temperature
                if req.top_k:
                    topk[i] = req.top_k
        self._key, sub = jax.random.split(self._key)
        nxt, self.cache = self._step(
            self.params, self.cache, jnp.asarray(tokens),
            jnp.asarray(self.positions), jnp.asarray(active), sub,
            jnp.asarray(temps), jnp.asarray(topk),
        )
        nxt = np.asarray(nxt)
        out: Dict[int, int] = {}
        for i, req in enumerate(self.slots):
            if req is None:
                continue
            self.positions[i] += 1
            tok = int(nxt[i])
            req.generated.append(tok)
            out[req.request_id] = tok
            self._maybe_finish(i, tok)
        return out

    def _step_speculative(self) -> Dict[int, List[int]]:
        """One batched draft-verify step over all active slots."""
        self._admit()
        active = [i for i, s in enumerate(self.slots) if s is not None]
        if not active:
            return {}
        k = self.speculative_k
        tokens = np.zeros((self.n_slots, k + 1), np.int32)
        temps = np.zeros(self.n_slots, np.float32)
        topk = np.full(self.n_slots, self.cfg.padded_vocab_size, np.int32)
        for i, req in enumerate(self.slots):
            if req is not None:
                tokens[i, 0] = req.generated[-1]
                tokens[i, 1:] = self._draft_np(req, k)
                temps[i] = req.temperature
                if req.top_k:
                    topk[i] = req.top_k
        self._key, sub = jax.random.split(self._key)
        a, cand, self.cache = self._step_spec(
            self.params, self.cache, jnp.asarray(tokens),
            jnp.asarray(self.positions), sub, jnp.asarray(temps), jnp.asarray(topk),
        )
        a, cand = np.asarray(a), np.asarray(cand)
        out: Dict[int, List[int]] = {}
        for i, req in enumerate(self.slots):
            if req is None:
                continue
            toks = cand[i, : int(a[i]) + 1].tolist()
            # budget, then eos truncation (keep the eos itself)
            toks = toks[: req.max_new_tokens - len(req.generated)]
            if req.eos_id is not None and req.eos_id in toks:
                toks = toks[: toks.index(req.eos_id) + 1]
            req.generated.extend(toks)
            self.positions[i] += len(toks)
            out[req.request_id] = toks
            self._maybe_finish(i, toks[-1] if toks else -1)
        return out

    def run_to_completion(self, max_steps: int = 100_000) -> Dict[int, List[int]]:
        """Drain queue + slots; returns {request_id: generated tokens}."""
        results: Dict[int, List[int]] = {}
        tracked: List[Request] = list(self.queue)
        tracked += [s for s in self.slots if s is not None]
        for _ in range(max_steps):
            if not self.queue and all(s is None for s in self.slots):
                break
            self.step()
        for req in tracked:
            results[req.request_id] = req.generated
        return results
