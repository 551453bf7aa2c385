"""Evaluation harness.

Two layers (parity: /root/reference/eval/lm_eval_harness.py:23-193):

1. ``FastmaxLM`` — a model adapter exposing the EleutherAI lm-eval contract
   (loglikelihood over (context, continuation) pairs, greedy generation,
   batched full-context forwards). When the ``lm_eval`` package is
   installed, ``run_eval_harness`` registers it and runs the reference's
   default task set (arc_challenge, piqa, hellaswag, mmlu —
   eval/lm_eval_harness.py:141).
2. Self-contained evaluators that need no external package: token-level
   perplexity over a text file, and multiple-choice accuracy over local
   JSON tasks — the accuracy gate used to compare fp16 vs quantized models
   (the BASELINE "lm-eval acc delta" axis) in network-restricted
   environments.
"""

from __future__ import annotations

import json
import math
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import Config
from ..models import gpt
from ..models.tokenizer import Tokenizer


class FastmaxLM:
    """Loglikelihood/generation adapter over the functional model."""

    def __init__(self, cfg: Config, params, tokenizer: Tokenizer,
                 max_seq_length: Optional[int] = None, batch_size: int = 1):
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        self.max_seq_length = min(max_seq_length or cfg.block_size, cfg.block_size)
        self.batch_size = batch_size

        @jax.jit
        def fwd(params, idx):
            logits, _ = gpt.forward(params, cfg, idx)
            return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

        @jax.jit
        def score(params, idx, mask):
            """Batched continuation scoring, one device round-trip per batch.

            idx: (B, T) tokens; mask: (B, T) 1.0 where the token is part of
            the scored continuation. Returns (sum logprob, is_greedy) per row
            — the role of the reference harness's _model_call + per-token
            host loop (eval/lm_eval_harness.py:72-74), vectorized.
            """
            logits, _ = gpt.forward(params, cfg, idx)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            # logits at position i predict token i+1
            tok_lp = jnp.take_along_axis(
                logp[:, :-1], idx[:, 1:, None].astype(jnp.int32), axis=-1
            )[..., 0]
            hit = jnp.argmax(logp[:, :-1], axis=-1) == idx[:, 1:]
            m = mask[:, 1:]
            ll = jnp.sum(tok_lp * m, axis=-1)
            greedy = jnp.all(jnp.where(m > 0, hit, True), axis=-1)
            return ll, greedy

        self._fwd = fwd
        self._score = score
        self._cached_engine = None

    def _engine(self):
        """One engine per LM (compiles the decode loop once, not per request)."""
        if self._cached_engine is None:
            from ..inference.engine import InferenceEngine

            self._cached_engine = InferenceEngine(
                self.cfg, self.params, max_seq_length=self.max_seq_length, batch_size=1
            )
        return self._cached_engine

    # -- lm-eval style interface ------------------------------------------

    @property
    def eot_token_id(self):
        return self.tokenizer.eos_id

    def tok_encode(self, string: str) -> List[int]:
        return self.tokenizer.encode(string, bos=False, eos=False).tolist()

    def tok_decode(self, tokens: Sequence[int]) -> str:
        return self.tokenizer.decode(np.asarray(tokens))

    def _prep_tokens(self, context: List[int], continuation: List[int]):
        """Truncate to max_seq_length with standard lm-eval semantics and
        return (tokens, n_ctx)."""
        if len(continuation) >= self.max_seq_length:
            # keep at least one context token; score only the continuation
            # tail that fits (standard lm-eval truncation semantics)
            continuation = continuation[-(self.max_seq_length - 1):]
        tokens = (context + continuation)[-self.max_seq_length :]
        n_ctx = len(tokens) - len(continuation)
        assert n_ctx >= 1, (len(tokens), len(continuation))
        return tokens, n_ctx

    def loglikelihood_tokens(self, context: List[int], continuation: List[int]) -> Tuple[float, bool]:
        """(sum logprob of continuation, is_greedy) for one request."""
        return self.loglikelihood_tokens_batch([(context, continuation)])[0]

    def loglikelihood_tokens_batch(
        self, requests: List[Tuple[List[int], List[int]]]
    ) -> List[Tuple[float, bool]]:
        """Score many (context_tokens, continuation_tokens) pairs.

        Requests are grouped by length bucket (multiples of 64) and packed
        into (batch_size, bucket) forwards — the role of the reference
        harness's batched _model_call; compiled shapes stay bounded (a few
        buckets x one batch size).
        """
        prepped = [self._prep_tokens(c, t) for c, t in requests]
        order = sorted(
            range(len(prepped)), key=lambda i: len(prepped[i][0])
        )
        results: List[Optional[Tuple[float, bool]]] = [None] * len(prepped)
        bs = self.batch_size
        for group_start in range(0, len(order), bs):
            idxs = order[group_start : group_start + bs]
            bucket = min(
                self.max_seq_length,
                ((max(len(prepped[i][0]) for i in idxs) + 63) // 64) * 64,
            )
            toks = np.zeros((bs, bucket), np.int32)
            mask = np.zeros((bs, bucket), np.float32)
            for row, i in enumerate(idxs):
                tokens, n_ctx = prepped[i]
                toks[row, : len(tokens)] = tokens
                mask[row, n_ctx : len(tokens)] = 1.0
            ll, greedy = self._score(
                self.params, jnp.asarray(toks), jnp.asarray(mask)
            )
            ll = np.asarray(ll)
            greedy = np.asarray(greedy)
            for row, i in enumerate(idxs):
                results[i] = (float(ll[row]), bool(greedy[row]))
        return results  # type: ignore[return-value]

    def loglikelihood(self, requests: List[Tuple[str, str]]) -> List[Tuple[float, bool]]:
        token_reqs = []
        for context, continuation in requests:
            ctx = self.tok_encode(context) or [self.eot_token_id]
            cont = self.tok_encode(continuation)
            token_reqs.append((ctx, cont))
        return self.loglikelihood_tokens_batch(token_reqs)

    def loglikelihood_rolling_tokens(self, toks: List[int]) -> float:
        """Rolling loglikelihood of a full token stream under lm-eval's
        exact windowing contract (``get_rolling_token_windows(context_len=1)``
        + ``make_disjoint_window``, which the reference inherits via BaseLM,
        ref eval/lm_eval_harness.py): every token is scored exactly once in
        DISJOINT windows — the first window is conditioned on the EOT prefix
        token only, and every later window on a single preceding token.
        This makes rolling metrics (wikitext-style perplexity, bits/byte)
        directly comparable to published lm-eval numbers; a sliding-window
        variant that keeps extra history would systematically overstate
        loglikelihood.

        One deliberate deviation from lm-eval's windowing: each window
        scores ``max_seq_length - 1`` tokens (context token + predictions
        fill the forward buffer INCLUDING the final target), where
        ``get_rolling_token_windows(context_len=1)`` scores
        ``max_seq_length`` per window because BaseLM drops the last
        continuation token from the model input. Every token is still
        scored exactly once with >= 1 token of context — only the window
        boundaries shift by one token — so the summed loglikelihood is
        exact, not approximated."""
        if not toks:
            return 0.0
        # 1 context token + pred_len scored tokens fill the model buffer
        pred_len = max(self.max_seq_length - 1, 1)
        reqs: List[Tuple[List[int], List[int]]] = []
        first = min(len(toks), pred_len)
        reqs.append(([self.eot_token_id], list(toks[:first])))
        pos = first
        while pos < len(toks):
            n_new = min(pred_len, len(toks) - pos)
            reqs.append(([int(toks[pos - 1])], list(toks[pos : pos + n_new])))
            pos += n_new
        results = self.loglikelihood_tokens_batch(reqs)
        return float(sum(ll for ll, _ in results))

    def greedy_until(self, prompt: str, max_new_tokens: int = 64, stop: Sequence[str] = ()) -> str:
        # clamp so prompt + generation always fit the static buffer; the
        # naive `[-max_seq + max_new:]` slice becomes `[-0:]` (keep all!)
        # when max_new_tokens == max_seq_length
        max_new_tokens = min(max_new_tokens, self.max_seq_length - 1)
        enc = self.tokenizer.encode(prompt)[-(self.max_seq_length - max_new_tokens) :]
        engine = self._engine()
        out = engine.generate(jnp.asarray(enc), len(enc) + max_new_tokens,
                              temperature=0.0, eos_id=self.tokenizer.eos_id)
        text = self.tokenizer.decode(np.asarray(out[0, len(enc):]))
        for s in stop:
            if s in text:
                text = text.split(s)[0]
        return text


class CachingLM:
    """Persistent request-level result cache around a FastmaxLM (the role of
    the reference's CachingLM wrapper, eval/lm_eval_harness.py:113-118,
    ``--use_cache``): re-running an evaluation only recomputes requests not
    yet in the sqlite-free JSON cache file. Misses are computed in one
    batched call and appended."""

    def __init__(self, lm: FastmaxLM, cache_path: Path):
        self.lm = lm
        self.cache_path = Path(cache_path)
        self._cache: dict = {}
        if self.cache_path.exists():
            with open(self.cache_path, encoding="utf-8") as fp:
                self._cache = json.load(fp)

    def __getattr__(self, name):
        return getattr(self.lm, name)

    @staticmethod
    def _key(context: str, continuation: str) -> str:
        import hashlib

        h = hashlib.sha256()
        h.update(context.encode())
        h.update(b"\x1f")
        h.update(continuation.encode())
        return h.hexdigest()

    def loglikelihood(self, requests: List[Tuple[str, str]]) -> List[Tuple[float, bool]]:
        keys = [self._key(c, t) for c, t in requests]
        miss = [i for i, k in enumerate(keys) if k not in self._cache]
        if miss:
            computed = self.lm.loglikelihood([requests[i] for i in miss])
            for i, res in zip(miss, computed):
                self._cache[keys[i]] = list(res)
            self._save()
        return [(self._cache[k][0], bool(self._cache[k][1])) for k in keys]

    def _save(self) -> None:
        tmp = self.cache_path.with_suffix(".tmp")
        with open(tmp, "w", encoding="utf-8") as fp:
            json.dump(self._cache, fp)
        tmp.replace(self.cache_path)


# --------------------------------------------------------- local evaluators


def perplexity_on_tokens(lm: FastmaxLM, tokens: np.ndarray, stride: int = 512) -> float:
    """Sliding-window token perplexity over a long token stream."""
    total_nll, total_count = 0.0, 0
    n = len(tokens)
    for start in range(0, max(n - 1, 1), stride):
        window = tokens[start : start + stride + 1]
        if len(window) < 2:
            break
        idx = jnp.asarray(np.asarray(window[:-1])[None], jnp.int32)
        logp = lm._fwd(lm.params, idx)[0]
        tgt = np.asarray(window[1:])
        total_nll += -float(jnp.sum(logp[np.arange(len(tgt)), tgt]))
        total_count += len(tgt)
    return math.exp(total_nll / max(total_count, 1))


def multiple_choice_accuracy(lm: FastmaxLM, task_file: Path) -> dict:
    """Accuracy over a local JSON task: a list of
    {"query": str, "choices": [str, ...], "gold": int} records (the
    arc/piqa/hellaswag record shape)."""
    with open(task_file, encoding="utf-8") as fp:
        records = json.load(fp)
    # flatten every (query, choice) pair into one batched loglikelihood call
    requests = [
        (rec["query"], " " + choice) for rec in records for choice in rec["choices"]
    ]
    lls = iter(lm.loglikelihood(requests))
    correct = correct_norm = 0
    for rec in records:
        scores = [
            (ll, ll / max(len(choice), 1))
            for choice, (ll, _) in zip(rec["choices"], lls)
        ]
        pred = int(np.argmax([s[0] for s in scores]))
        pred_norm = int(np.argmax([s[1] for s in scores]))
        correct += pred == rec["gold"]
        correct_norm += pred_norm == rec["gold"]
    n = len(records)
    return {"acc": correct / n, "acc_norm": correct_norm / n, "n": n}


# --------------------------------------------------------------- lm-eval


def run_eval_harness(
    checkpoint_dir: Path,
    tasks: Optional[str] = None,
    quantize: Optional[str] = None,
    attn_alg: Optional[str] = None,
    precision: str = "float32",
    num_fewshot: int = 0,
    limit: Optional[int] = None,
    save_filepath: Optional[Path] = None,
    local_task_file: Optional[Path] = None,
    ppl_text_file: Optional[Path] = None,
    batch_size: int = 8,
    use_cache: Optional[Path] = None,
) -> dict:
    """Evaluate a checkpoint. Uses the EleutherAI harness when installed;
    --local_task_file / --ppl_text_file run the built-in evaluators.
    batch_size: loglikelihood requests scored per forward;
    use_cache: JSON file caching per-request results across runs."""
    from ..inference.generate import load_and_prepare

    cfg, params = load_and_prepare(
        Path(checkpoint_dir), quantize=quantize, attn_alg=attn_alg, precision=precision
    )
    tokenizer = Tokenizer(Path(checkpoint_dir))
    lm = FastmaxLM(cfg, params, tokenizer, batch_size=batch_size)
    if use_cache:
        lm = CachingLM(lm, Path(use_cache))

    results: dict = {"model": cfg.name, "quantize": quantize}
    if local_task_file:
        results["local_task"] = multiple_choice_accuracy(lm, Path(local_task_file))
    if ppl_text_file:
        text = Path(ppl_text_file).read_text(encoding="utf-8")
        toks = tokenizer.encode(text)
        results["perplexity"] = perplexity_on_tokens(lm, toks)
    if tasks:
        try:
            import lm_eval  # noqa: F401
        except ImportError:
            raise ImportError(
                "the lm_eval package is not installed; use --local_task_file / "
                "--ppl_text_file for the built-in evaluators"
            )
        results["harness"] = _run_lm_eval(lm, tasks.split(","), num_fewshot, limit)

    if save_filepath:
        Path(save_filepath).write_text(json.dumps(results, indent=2))
    print(json.dumps(results, indent=2))
    return results


def _run_lm_eval(lm: FastmaxLM, tasks: List[str], num_fewshot: int, limit):
    import lm_eval
    from lm_eval.api.model import LM

    class _Wrapper(LM):
        def loglikelihood(self, requests):
            return lm.loglikelihood([req.args for req in requests])

        def loglikelihood_rolling(self, requests):
            out = []
            for req in requests:
                (text,) = req.args
                toks = lm.tok_encode(text)
                out.append((lm.loglikelihood_rolling_tokens(toks),))
            return out

        def generate_until(self, requests):
            out = []
            for req in requests:
                context, gen_kwargs = req.args
                out.append(lm.greedy_until(context, stop=gen_kwargs.get("until", [])))
            return out

    return lm_eval.simple_evaluate(
        model=_Wrapper(), tasks=tasks, num_fewshot=num_fewshot, limit=limit
    )["results"]


def main() -> None:
    from ..utils.cli import CLI

    CLI(run_eval_harness)


if __name__ == "__main__":
    main()
