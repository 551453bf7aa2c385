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

``decode_quantum = Q > 1`` runs Q decode steps per scheduler sync as one
on-device ``lax.scan`` (every slot advances Q tokens; the host admits and
retires only at quantum boundaries). One jit dispatch then amortizes the
host round trip over Q tokens — the dominant cost on high-dispatch-latency
links (a tunneled chip pays ~tens of ms per dispatch). Slots that hit eos
or their budget mid-quantum waste their remaining lane steps; the extra
cache rows they wrote are stale-but-masked, exactly like rejected
speculative drafts.

``prefill_chunk = C > 0`` enables chunked prefill (quadratic path only):
admission assigns a slot immediately but runs the prompt through the model
C tokens at a time, ONE chunk per scheduler step (round-robin over
mid-prefill slots), interleaved with decode steps for the running slots.
A long prompt then costs each running request at most one chunk-forward of
added inter-token latency per step instead of stalling every lane for the
whole prompt. Static shapes: one jitted (1, C) forward with a traced
position offset serves every chunk of every prompt. Mid-prefill slots are
excluded from decode; the garbage rows a decode step writes at a
mid-prefill slot's position are overwritten by its next chunk (hence the
``prefill_chunk >= decode_quantum / speculative_k+1`` guard).

``prefix_cache_size > 0`` enables prefix caching (quadratic path only):
each admitted prompt's KV rows are kept in an LRU on the host, and a new
request whose prompt starts with a cached prompt skips prefill for the
shared prefix — its rows are copied into the slot and only the suffix runs
through the model. The serving pattern this pays for is a long shared
system prompt with short per-request suffixes. Attention masks by absolute
position, so reused rows are bit-identical to recomputed ones (exactness
tested against the uncached batcher).
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
        prefix_cache_size: int = 0,
        cache_dtype=None,
        decode_quantum: int = 1,
        adaptive_quantum: bool = False,
        prefill_chunk: int = 0,
        mesh=None,
    ):
        from .engine import InferenceEngine

        self.cfg = cfg
        self.params = params = InferenceEngine.prepare_params(params, weights_mode)
        self.n_slots = n_slots
        self.max_seq_length = min(max_seq_length or cfg.block_size, cfg.block_size)
        self.prefill_bucket = prefill_bucket
        self.speculative_k = int(speculative_k)
        self.decode_quantum = int(decode_quantum)
        # The quantum is a throughput/latency trade (docs/perf.md): long
        # quanta amortize the host sync (q48 = 1261 tok/s closed-loop at 7B)
        # but admission only happens at quantum boundaries, so under open-loop
        # arrivals long quanta starve the queue (q48 = 230 tok/s / TTFT p95
        # 23 s at 10 req/s, vs q24's 748 / 1.4 s — serving_ladder_r05c.jsonl).
        # adaptive_quantum resolves the trade with one occupancy test: run a
        # SHORT quantum whenever a slot is free after admission (the next
        # admission boundary arrives quickly for whoever shows up), the full
        # quantum when every slot is busy (nothing could be admitted anyway —
        # amortize). Closed-loop batches run at the long-q rate; trickle
        # arrivals see short-q admission latency. Costs one extra executable.
        self.adaptive_quantum = bool(adaptive_quantum)
        if self.adaptive_quantum and self.decode_quantum <= 1:
            raise ValueError("adaptive_quantum requires decode_quantum > 1")
        self._q_small = min(8, self.decode_quantum)
        if self.speculative_k and self.decode_quantum > 1:
            raise ValueError(
                "decode_quantum and speculative_k are mutually exclusive "
                "(speculation needs host drafts between verify steps)"
            )
        # a speculative verify writes k+1 cache rows past each slot's
        # position; a quantum writes Q rows
        self._headroom = max(self.speculative_k + 1, self.decode_quantum)
        # draft-acceptance telemetry: accepted draft tokens / drafted
        # tokens across the batcher's lifetime (0 when not speculating).
        # Serving results quote this beside tok/s so speculation numbers
        # carry their honesty term (verdict r03 weak #6).
        self.spec_accepted = 0
        self.spec_drafted = 0
        self.prefill_chunk = int(prefill_chunk)
        if self.prefill_chunk and self._headroom > self.prefill_chunk:
            raise ValueError(
                "prefill_chunk must be >= decode_quantum and speculative_k+1: "
                "a mid-prefill slot's garbage decode rows must fit inside the "
                "range its next chunk overwrites"
            )
        self._prefilling: Dict[int, int] = {}  # slot -> tokens prefilled so far
        self._pf_next = 0  # round-robin pointer over mid-prefill slots
        self.prefix_cache_size = int(prefix_cache_size)
        from collections import OrderedDict

        self._prefix_cache: "OrderedDict[bytes, dict]" = OrderedDict()
        self.prefix_cache_hits = 0  # diagnostics: tokens skipped via reuse
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
        if self.prefix_cache_size and self._linear_alg:
            raise ValueError(
                "prefix caching requires the KV-cache (quadratic) path"
            )
        if self.prefill_chunk and self._linear_alg:
            raise ValueError(
                "chunked prefill requires the KV-cache (quadratic) path: "
                "linear-state prefill must absorb the exact prompt in one pass"
            )
        if self._linear_alg:
            # O(1)-state slots: one running linear-attention state per slot.
            # NOTE: linear-state prefill must see the EXACT prompt (padding
            # tokens would be absorbed into the running sums), so prefill
            # compiles per distinct prompt length instead of per bucket.
            self.cache = gpt.init_linear_cache(cfg, n_slots)
        else:
            self.cache = gpt.init_kv_cache(
                cfg, n_slots, self.max_seq_length, cache_dtype or dtype
            )
        self.mesh = mesh
        if mesh is not None and not self._linear_alg:
            # multi-chip serving: keep the slotted cache head-sharded over the
            # model axis (same layout TP attention computes in, so cache
            # updates never re-gather; the generate/tp.py KV split role)
            from jax.sharding import NamedSharding, PartitionSpec as P
            from ..parallel.sharding import MODEL_AXIS

            tp_size = mesh.shape.get(MODEL_AXIS, 1)
            grp = (
                MODEL_AXIS
                if tp_size > 1 and cfg.n_query_groups % tp_size == 0
                else None
            )
            kv_spec = P(None, None, grp, None, None)
            sc_spec = P(None, None, grp, None)
            self._cache_spec = {
                k: kv_spec if v.ndim == 5 else sc_spec
                for k, v in self.cache.items()
            }
            self.cache = {
                k: jax.device_put(v, NamedSharding(mesh, self._cache_spec[k]))
                for k, v in self.cache.items()
            }

        def constrain(cache):
            # pin the cache to its group-sharded layout so donated-output
            # sharding never drifts across steps (XLA would otherwise
            # re-propagate, e.g. splitting head_size over the model axis)
            if mesh is None or self._linear_alg:
                return cache
            from jax.sharding import NamedSharding

            return {
                k: jax.lax.with_sharding_constraint(
                    v, NamedSharding(mesh, self._cache_spec[k])
                )
                for k, v in cache.items()
            }
        self.positions = np.zeros(n_slots, np.int32)  # next write position
        self.slots: List[Optional[Request]] = [None] * n_slots
        self.queue: List[Request] = []
        self._next_id = 0
        self._key = jax.random.PRNGKey(0)

        # single-sequence prefill over a bucketed length; returns last logits
        # and the new KV rows for the slot. ``p0`` (traced) is the absolute
        # position of tokens[0] — 0 for a full prefill, the reused-prefix
        # length for a prefix-cache-hit suffix prefill (one compile serves
        # every offset).
        def prefill(params, tokens, n_valid, row_cache, p0):
            # tokens (1, Tb) padded; run as an independent batch-1 model pass
            # (row_cache is the slot's full cache pytree — k/v plus the int8
            # scale planes when the cache is quantized)
            logits, row_cache = gpt.forward(
                params, cfg, tokens, input_pos=p0, kv_cache=row_cache, rope_cache=self.rope
            )
            last = jnp.take_along_axis(
                logits, (n_valid - p0 - 1)[None, None, None].astype(jnp.int32), axis=1
            )[:, 0]
            return last, constrain(row_cache)

        # NOTE: no donation here — an identity slice (n_slots == 1) can alias
        # the whole cache, and donating it would delete the live cache
        self._prefill = jax.jit(prefill)

        # batched admission prefill: P queued requests sharing a bucket run
        # as ONE (P, Tb) forward into FRESH zero cache rows (valid because a
        # slot's positions >= its prompt length are never attended before
        # decode overwrites them — the causal frontier is per-row). The
        # serialized per-request admission was ~40% of closed-loop serving
        # wall at 32 slots (bench_results/serving_r05b.jsonl q48 row:
        # ~45 ms x 96 admissions of a 10.0 s run); prefill compute is
        # MXU-bound at m >= 128, so batching P rows costs ~P/2.5x less wall
        # than P separate calls (shared weight stream + one dispatch).
        def prefill_batch(params, tokens, n_valid, key, temperature, top_k,
                          p_rows):
            row_cache = {
                k: jnp.zeros(v.shape[:1] + (p_rows,) + v.shape[2:], v.dtype)
                for k, v in self.cache.items()
            }
            logits, row_cache = gpt.forward(
                params, cfg, tokens, input_pos=0, kv_cache=row_cache,
                rope_cache=self.rope, logits_at=n_valid - 1,
            )
            logits = logits[:, 0].astype(jnp.float32)
            # first token sampled ON DEVICE (same batched sampler as the
            # decode step): fetching (P, V) logits and re-uploading rows
            # for host-side sampling cost ~6 tunnel round-trips per wave —
            # measured 857 vs 891 tok/s same-window against sequential
            # admission before this; only (P,) ints cross the wire now
            greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)

            def hot_sample():
                v = logits.shape[-1]
                asc = jnp.sort(logits, axis=-1)
                idx = jnp.clip(v - top_k, 0, v - 1)
                kth = jnp.take_along_axis(asc, idx[:, None], axis=1)[:, 0]
                gumbel = -jnp.log(
                    -jnp.log(jax.random.uniform(key, logits.shape) + 1e-20)
                    + 1e-20
                )
                sampled = jnp.argmax(
                    jnp.where(logits < kth[:, None], -jnp.inf, logits)
                    / jnp.maximum(temperature[:, None], 1e-6) + gumbel,
                    axis=-1,
                ).astype(jnp.int32)
                return jnp.where(temperature > 0, sampled, greedy)

            first = jax.lax.cond(jnp.any(temperature > 0), hot_sample,
                                 lambda: greedy)
            return first, constrain(row_cache)

        self._prefill_batch = jax.jit(prefill_batch, static_argnames=("p_rows",))
        # P buckets bound the executable count; remainders admit one-by-one.
        # Capped at 16: a P=32 x Tb=128 wave OOMs the 16 GB chip at 7B (the
        # prefill's per-layer dequant + activation transients scale with
        # P*Tb rows; 16 already amortizes the weight stream and dispatch)
        self.prefill_batch_buckets = tuple(
            p for p in (16, 8, 4) if p <= n_slots)
        self.batched_admissions = 0  # telemetry: requests admitted in waves

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

            def hot_sample():
                # per-slot top-k threshold: the k-th largest logit per row
                v = logits.shape[-1]
                asc = jnp.sort(logits, axis=-1)
                idx = jnp.clip(v - top_k, 0, v - 1)
                kth = jnp.take_along_axis(asc, idx[:, None], axis=1)[:, 0]
                gumbel = -jnp.log(
                    -jnp.log(jax.random.uniform(key, logits.shape) + 1e-20) + 1e-20
                )
                sampled = jnp.argmax(
                    jnp.where(logits < kth[:, None], -jnp.inf, logits)
                    / jnp.maximum(temperature[:, None], 1e-6) + gumbel,
                    axis=-1,
                ).astype(jnp.int32)
                return jnp.where(temperature > 0, sampled, greedy)

            # all-greedy batches skip the (B, V) sort entirely — a real
            # per-step cost when the decode step itself is ~10 ms
            nxt = jax.lax.cond(jnp.any(temperature > 0), hot_sample, lambda: greedy)
            return nxt, constrain(cache)

        self._step = jax.jit(step, donate_argnums=(1,))

        def make_step_many(q):
            def step_many(params, cache, tokens, positions, key, temperature, top_k):
                """q decode steps in one dispatch (see decode_quantum above).
                Returns (toks (q, B), cache)."""

                def body(carry, _):
                    cache, tokens, positions, key = carry
                    key, sub = jax.random.split(key)
                    nxt, cache = step(params, cache, tokens, positions, None, sub,
                                      temperature, top_k)
                    return (cache, nxt, positions + 1, key), nxt

                (cache, _, _, _), toks = jax.lax.scan(
                    body, (cache, tokens, positions, key), None, length=q,
                )
                return toks, cache

            return jax.jit(step_many, donate_argnums=(1,))

        if self.decode_quantum > 1:
            self._step_many = make_step_many(self.decode_quantum)
            if self.adaptive_quantum and self._q_small < self.decode_quantum:
                self._step_many_small = make_step_many(self._q_small)
            else:
                self._step_many_small = self._step_many

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
            return a, cand, constrain(cache)

        if self.speculative_k:
            self._step_spec = jax.jit(step_spec, donate_argnums=(1,))

    # ------------------------------------------------------------- requests

    def submit(self, prompt: np.ndarray, max_new_tokens: int, *,
               temperature: float = 0.0, top_k: Optional[int] = None,
               eos_id: Optional[int] = None, return_request: bool = False):
        """Queue a request; returns its id (or the Request itself with
        ``return_request=True`` — a serving frontend tracks progress through
        ``Request.generated``/``.done``, see inference/server.py)."""
        req = Request(self._next_id, np.asarray(prompt, np.int32), max_new_tokens,
                      temperature, top_k, eos_id)
        self._next_id += 1
        self.queue.append(req)
        return req if return_request else req.request_id

    def inflight(self) -> int:
        """Requests queued or occupying a slot."""
        return len(self.queue) + sum(s is not None for s in self.slots)

    def _admit(self) -> None:
        self._admit_batched()
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
                elif self.prefill_chunk:
                    # chunked admission: claim the slot, start at the shared
                    # prefix (if cached); _prefill_tick does the actual work
                    p0 = 0
                    if self.prefix_cache_size:
                        entry = self._prefix_lookup(req.prompt[:t])
                        if entry is not None:
                            p0 = entry["len"]
                            for k in self.cache:
                                self.cache[k] = self.cache[k].at[
                                    :, slot : slot + 1, :, :p0
                                ].set(jnp.asarray(entry[k]))
                            self.prefix_cache_hits += p0
                    self._prefilling[slot] = p0
                    self.positions[slot] = p0
                    self.slots[slot] = req
                    continue
                else:
                    row = {k: v[:, slot : slot + 1] for k, v in self.cache.items()}
                    p0 = 0
                    if self.prefix_cache_size:
                        entry = self._prefix_lookup(req.prompt[:t])
                        if entry is not None:
                            p0 = entry["len"]
                            row = {
                                k: row[k].at[:, :, :, :p0].set(jnp.asarray(entry[k]))
                                for k in row
                            }
                            self.prefix_cache_hits += p0
                    n_suffix = t - p0
                    bucket = min(
                        self.max_seq_length - p0,
                        ((n_suffix + self.prefill_bucket - 1) // self.prefill_bucket)
                        * self.prefill_bucket,
                    )
                    padded = np.zeros(bucket, np.int32)
                    padded[:n_suffix] = req.prompt[p0 : p0 + bucket][: n_suffix]
                    last, row = self._prefill(
                        self.params, jnp.asarray(padded)[None], jnp.asarray(t),
                        row, jnp.asarray(p0),
                    )
                    for k in self.cache:
                        self.cache[k] = self.cache[k].at[:, slot : slot + 1].set(row[k])
                    if self.prefix_cache_size:
                        self._prefix_insert(req.prompt[:t], row)
                self._key, sub = jax.random.split(self._key)
                first = int(sample(last[0], sub, req.temperature, req.top_k))
                req.generated.append(first)
                self.positions[slot] = t
                self.slots[slot] = req
                self._maybe_finish(slot, first)

    def _admit_batched(self) -> None:
        """Admit waves of queued requests through the (P, Tb) batched
        prefill. Only the plain quadratic path qualifies (linear-state and
        chunked admissions have their own machinery; prefix-cache hits need
        a per-request suffix prefill) and only full P-bucket groups sharing
        a padded bucket length run batched — the per-request loop in
        _admit handles every remainder identically, so this is purely a
        wall-clock fast path. Numerics: the same forward at batch P
        instead of 1. On TPU a bf16 matmul may round differently per
        batch size (~1 ulp), so a greedy near-tie can resolve differently
        than a sequential admission would — cache rows verified
        bf16-identical on chip (max |diff| < 1e-2, the quantization step
        of bf16 at these magnitudes); the batched decode step carries the
        exact same property. CPU (f32 accumulate) is token-exact — the
        parity tests assert it."""
        if self._linear_alg or self.prefill_chunk or not self.prefill_batch_buckets:
            return
        while True:
            free = [s for s in range(self.n_slots) if self.slots[s] is None]
            if len(free) < self.prefill_batch_buckets[-1] or not self.queue:
                return
            # head-of-queue group sharing the first request's bucket (FIFO
            # order is preserved: we never admit request j past request i<j)
            def bucket_of(req):
                t = len(req.prompt)
                return min(
                    self.max_seq_length,
                    ((t + self.prefill_bucket - 1) // self.prefill_bucket)
                    * self.prefill_bucket,
                )

            b0 = bucket_of(self.queue[0])
            group = []
            for req in self.queue:
                if len(group) >= min(len(free), self.prefill_batch_buckets[0]):
                    break
                if bucket_of(req) != b0:
                    break
                if self.prefix_cache_size and \
                        self._prefix_lookup(req.prompt) is not None:
                    break
                group.append(req)
            p = next((p for p in self.prefill_batch_buckets
                      if p <= len(group)), None)
            if p is None:
                return
            group, slots = group[:p], free[:p]
            tokens = np.zeros((p, b0), np.int32)
            n_valid = np.zeros(p, np.int32)
            temps = np.zeros(p, np.float32)
            topk = np.full(p, self.cfg.padded_vocab_size, np.int32)
            for i, req in enumerate(group):
                t = min(len(req.prompt), b0)
                tokens[i, :t] = req.prompt[:t]
                n_valid[i] = t
                temps[i] = req.temperature
                if req.top_k:
                    topk[i] = req.top_k
            self._key, sub = jax.random.split(self._key)
            first, rows = self._prefill_batch(
                self.params, jnp.asarray(tokens), jnp.asarray(n_valid), sub,
                jnp.asarray(temps), jnp.asarray(topk), p)
            self.batched_admissions += p
            idx = np.asarray(slots)
            for k in self.cache:
                self.cache[k] = self.cache[k].at[:, idx].set(rows[k])
            first = np.asarray(first)
            for i, (req, slot) in enumerate(zip(group, slots)):
                self.queue.remove(req)
                if self.prefix_cache_size:
                    self._prefix_insert(
                        req.prompt, {k: rows[k][:, i : i + 1] for k in rows})
                req.generated.append(int(first[i]))
                self.positions[slot] = n_valid[i]
                self.slots[slot] = req
                self._maybe_finish(slot, int(first[i]))

    def _prefill_tick(self) -> None:
        """Advance ONE mid-prefill slot by one chunk (round-robin), bounding
        the prefill work injected between decode steps to a single (1, C)
        forward. On the final chunk, samples the request's first token and
        hands the slot to the decode path."""
        if not self._prefilling:
            return
        order = sorted(self._prefilling)
        slot = next(
            (s for s in order if s >= self._pf_next), order[0]
        )
        self._pf_next = slot + 1
        req = self.slots[slot]
        t = len(req.prompt)
        p = self._prefilling[slot]
        n = min(self.prefill_chunk, t - p)
        padded = np.zeros(self.prefill_chunk, np.int32)
        padded[:n] = req.prompt[p : p + n]
        row = {k: v[:, slot : slot + 1] for k, v in self.cache.items()}
        last, row = self._prefill(
            self.params, jnp.asarray(padded)[None], jnp.asarray(t),
            row, jnp.asarray(p),
        )
        for k in self.cache:
            self.cache[k] = self.cache[k].at[:, slot : slot + 1].set(row[k])
        p += n
        if p < t:
            self._prefilling[slot] = p
            self.positions[slot] = p
            return
        del self._prefilling[slot]
        if self.prefix_cache_size:
            self._prefix_insert(req.prompt, row)
        self._key, sub = jax.random.split(self._key)
        first = int(sample(last[0], sub, req.temperature, req.top_k))
        req.generated.append(first)
        self.positions[slot] = t
        self._maybe_finish(slot, first)

    def _decodable(self, slot: int) -> bool:
        """Slot holds a request that is past prefill (decode may advance it)."""
        return self.slots[slot] is not None and slot not in self._prefilling

    def _maybe_finish(self, slot: int, token: int) -> None:
        req = self.slots[slot]
        if req is None:
            return
        if (req.eos_id is not None and token == req.eos_id) or len(
            req.generated
        ) >= req.max_new_tokens or self.positions[slot] + self._headroom >= self.max_seq_length:
            req.done = True
            self.slots[slot] = None

    def register_prefix(self, tokens: np.ndarray) -> None:
        """Prefill and cache a shared prefix (e.g. a system prompt) without
        occupying a slot: subsequent requests whose prompts start with it
        skip its prefill entirely. Admitted prompts are also auto-cached in
        full, which serves the multi-turn pattern (each follow-up turn
        extends the previous full prompt)."""
        if not self.prefix_cache_size:
            raise ValueError("prefix_cache_size is 0: enable the prefix cache first")
        if self.mesh is not None:
            with self.mesh:
                return self._register_prefix(tokens)
        return self._register_prefix(tokens)

    def _register_prefix(self, tokens: np.ndarray) -> None:
        tokens = np.asarray(tokens, np.int32)
        t = len(tokens)
        entry = self._prefix_lookup(np.concatenate([tokens, [0]]).astype(np.int32))
        p0 = 0
        row = {k: jnp.zeros_like(v[:, :1]) for k, v in self.cache.items()}
        if entry is not None:
            p0 = entry["len"]
            row = {k: row[k].at[:, :, :, :p0].set(jnp.asarray(entry[k])) for k in row}
        n_suffix = t - p0
        bucket = min(
            self.max_seq_length - p0,
            ((n_suffix + self.prefill_bucket - 1) // self.prefill_bucket)
            * self.prefill_bucket,
        )
        padded = np.zeros(bucket, np.int32)
        padded[:n_suffix] = tokens[p0 : p0 + bucket][:n_suffix]
        _, row = self._prefill(
            self.params, jnp.asarray(padded)[None], jnp.asarray(t),
            row, jnp.asarray(p0),
        )
        self._prefix_insert(tokens, row)

    def _prefix_lookup(self, prompt: np.ndarray):
        """Longest cached prompt that is a strict prefix of ``prompt``
        (strict: at least one suffix token must remain to produce logits).
        LRU-refreshes the hit."""
        best_key, best = None, None
        for key_b, entry in self._prefix_cache.items():
            pl = entry["len"]
            if (best is None or pl > best["len"]) and pl <= len(prompt) - 1 and np.array_equal(
                prompt[:pl], entry["tokens"]
            ):
                best_key, best = key_b, entry
        if best_key is not None:
            self._prefix_cache.move_to_end(best_key)
        return best

    def _prefix_insert(self, prompt: np.ndarray, row: dict) -> None:
        """Remember this prompt's KV rows (host copy), LRU-bounded."""
        key_b = prompt.tobytes()
        if key_b in self._prefix_cache:
            self._prefix_cache.move_to_end(key_b)
            return
        t = len(prompt)
        entry = {"tokens": prompt.copy(), "len": t}
        for k, v in row.items():
            entry[k] = np.asarray(v[:, :, :, :t])
        self._prefix_cache[key_b] = entry
        while len(self._prefix_cache) > self.prefix_cache_size:
            self._prefix_cache.popitem(last=False)

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
        per slot), or {request_id: [tokens]} when ``speculative_k`` or
        ``decode_quantum`` batches multiple tokens per dispatch."""
        if self.mesh is not None:
            # sharded serving: run host-driven dispatches under the mesh so
            # GSPMD lowers them against the (model-axis) cache/param shardings
            # regardless of which thread calls step() (mesh context is
            # thread-local — the serving scheduler runs on its own thread)
            with self.mesh:
                return self._step_dispatch()
        return self._step_dispatch()

    def _step_dispatch(self):
        if self.speculative_k:
            return self._step_speculative()
        if self.decode_quantum > 1:
            return self._step_quantum()
        self._admit()
        self._prefill_tick()
        active = np.asarray([self._decodable(i) for i in range(self.n_slots)])
        if not active.any():
            return {}
        tokens = np.zeros(self.n_slots, np.int32)
        temps = np.zeros(self.n_slots, np.float32)
        topk = np.full(self.n_slots, self.cfg.padded_vocab_size, np.int32)
        for i, req in enumerate(self.slots):
            if active[i]:
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
            if not active[i]:
                continue
            self.positions[i] += 1
            tok = int(nxt[i])
            req.generated.append(tok)
            out[req.request_id] = tok
            self._maybe_finish(i, tok)
        return out

    def _step_quantum(self) -> Dict[int, List[int]]:
        """Advance every active slot by up to ``decode_quantum`` tokens in a
        single device dispatch."""
        self._admit()
        self._prefill_tick()
        decodable = [self._decodable(i) for i in range(self.n_slots)]
        if not any(decodable):
            return {}
        tokens = np.zeros(self.n_slots, np.int32)
        temps = np.zeros(self.n_slots, np.float32)
        topk = np.full(self.n_slots, self.cfg.padded_vocab_size, np.int32)
        for i, req in enumerate(self.slots):
            if decodable[i]:
                tokens[i] = req.generated[-1]
                temps[i] = req.temperature
                if req.top_k:
                    topk[i] = req.top_k
        self._key, sub = jax.random.split(self._key)
        # adaptive: a free slot after admission means someone could be
        # admitted at the next boundary — keep the boundary close. All
        # slots busy: run the full quantum, nothing is waiting on us.
        fn = (self._step_many_small
              if self.adaptive_quantum and any(s is None for s in self.slots)
              else self._step_many)
        toks, self.cache = fn(
            self.params, self.cache, jnp.asarray(tokens),
            jnp.asarray(self.positions), sub, jnp.asarray(temps), jnp.asarray(topk),
        )
        toks = np.asarray(toks)  # (Q, B)
        out: Dict[int, List[int]] = {}
        for i, req in enumerate(self.slots):
            if not decodable[i]:
                continue
            lane = toks[:, i].tolist()
            lane = lane[: req.max_new_tokens - len(req.generated)]
            if req.eos_id is not None and req.eos_id in lane:
                lane = lane[: lane.index(req.eos_id) + 1]
            req.generated.extend(lane)
            self.positions[i] += len(lane)
            out[req.request_id] = lane
            self._maybe_finish(i, lane[-1] if lane else -1)
        return out

    def _step_speculative(self) -> Dict[int, List[int]]:
        """One batched draft-verify step over all active slots."""
        self._admit()
        self._prefill_tick()
        active = [i for i in range(self.n_slots) if self._decodable(i)]
        if not active:
            return {}
        k = self.speculative_k
        tokens = np.zeros((self.n_slots, k + 1), np.int32)
        temps = np.zeros(self.n_slots, np.float32)
        topk = np.full(self.n_slots, self.cfg.padded_vocab_size, np.int32)
        for i, req in enumerate(self.slots):
            if i in active:
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
            if i not in active:
                continue
            self.spec_accepted += min(int(a[i]), k)
            self.spec_drafted += k
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
