"""Interactive chat REPL with streaming token-by-token decode.

Parity with the reference chat/base.py (23-377): a yield-based generator
with a stop-token ring buffer (chat/base.py:50-68), incremental
sentencepiece-safe decode (:81-96), and per-model-family prompt templates +
stop-token sets (prompt_config, :191-370).

TPU-native notes: streaming requires one device->host sync per token, so
the decode step here is a per-token jit (prefill jit + step jit) rather
than the engine's fused on-device loop; XLA caches both shapes after the
first turn.
"""

from __future__ import annotations

import re
import sys
import time
from pathlib import Path
from typing import Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import Config
from ..models import gpt
from ..models.tokenizer import Tokenizer
from ..ops.rope import build_rope_cache
from ..ops.sampling import sample


# --------------------------------------------------------------- templates


def prompt_config(checkpoint_name: str, tokenizer: Tokenizer) -> Tuple[str, Tuple[List[int], ...]]:
    """(system template with {prompt}, stop-token sequences) per family
    (ref chat/base.py:191-370)."""
    name = checkpoint_name.lower()

    if re.search(r"stablelm-tuned-alpha", name):
        system = (
            "<|SYSTEM|># StableLM Tuned (Alpha version)\n- StableLM is a helpful and harmless "
            "open-source AI language model developed by StabilityAI.\n- StableLM will refuse to "
            "participate in anything that could harm a human."
            "\n<|USER|>{prompt}<|ASSISTANT|>"
        )
        return system, _stops(tokenizer, ["<|SYSTEM|>"], ["<|ASSISTANT|>"], ["<|USER|>"])
    if re.search(r"stablelm-zephyr", name):
        return "<|user|>\n{prompt}<|endoftext|>\n<|assistant|>\n", ([tokenizer.eos_id],)
    if re.search(r"redpajama-incite.*chat", name):
        # <human>/<bot> turns; no dedicated stop token, so match the
        # multi-token speaker tags (ref chat/base.py:214-223)
        stop = _stops(tokenizer, ["<", "human", ">:"], ["<", "bot", ">:"])
        return "<human>: {prompt}\n<bot>:", stop
    if re.search(r"redpajama-incite.*instruct", name):
        stop = _stops(tokenizer, ["Q", ":"], ["A", ":"],
                      [187, 187], [535])  # 187/535: gpt-neox newline ids
        return "Q: {prompt}\nA:", stop
    if re.search(r"falcon.*-instruct", name):
        # Falcon rarely emits eos; stop on a new "User:" turn instead
        # (ref chat/base.py:239-251)
        stop = _stops(tokenizer, ["User", ":"], [193, "User"])  # 193 = '\n'
        return "Do not prefix your replies with 'Bot: '\nUser: {prompt}\n", stop
    if re.search(r"function-calling", name):
        # function-calling Llama-2: a FUNCTIONS block precedes the normal
        # [INST] wrapping (ref chat/base.py:261-284)
        import json as _json

        fn = _json.dumps(
            {
                "function": "search_web",
                "description": "Search the web for content.",
                "arguments": [
                    {"name": "query", "type": "string", "description": "The search query"}
                ],
            }
        ).replace("{", "{{").replace("}", "}}")
        system = (
            f"<FUNCTIONS>{fn}</FUNCTIONS>\n\n[INST]<<SYS>>\nYou are a helpful assistant "
            "that responds only with JSON-formatted function calls\n<</SYS>>\n\n"
            "{prompt}[/INST]\n\n"
        )
        return system, ([tokenizer.eos_id],)
    if re.search(r"vicuna|longchat", name):
        system = (
            "A chat between a curious user and an artificial intelligence assistant. The "
            "assistant gives helpful, detailed, and polite answers to the user's questions. "
            "USER: {prompt} ASSISTANT:"
        )
        return system, ([tokenizer.eos_id],)
    if re.search(r"llama-2.*-chat", name):
        system = (
            "[INST] <<SYS>>\nYou are a helpful, respectful and honest assistant.\n<</SYS>>\n\n"
            "{prompt} [/INST]"
        )
        return system, ([tokenizer.eos_id],)
    if re.search(r"gemma.*-it", name):
        return "<start_of_turn>user\n{prompt}<end_of_turn>\n<start_of_turn>model\n", ([tokenizer.eos_id],)
    if re.search(r"freewilly2", name):
        system = "### System:\nThis is a system prompt, please behave and help the user.\n\n### User:\n{prompt}\n\n### Assistant:\n"
        return system, ([tokenizer.eos_id],)
    if re.search(r"platypus", name):
        return "### Instruction:\n\n{prompt}\n\n### Response:\n", ([tokenizer.eos_id],)
    if re.search(r"nous-hermes", name):
        return "### Instruction:\n{prompt}\n\n### Response:\n", ([tokenizer.eos_id],)
    if re.search(r"stablecode-instruct", name):
        return "###Instruction\n{prompt}###Response\n", ([tokenizer.eos_id],)
    if re.search(r"codellama.*-instruct|mistral.*-instruct|mixtral.*-instruct", name):
        return "<s>[INST] {prompt} [/INST]", ([tokenizer.eos_id],)
    if re.search(r"tinyllama.*chat", name):
        system = "<|system|>\nYou are a friendly chatbot.</s>\n<|user|>\n{prompt}</s>\n<|assistant|>\n"
        return system, ([tokenizer.eos_id],)
    if re.search(r"phi-1", name):
        # phi-1.5 rarely emits eos; stop on a new "Answer:" turn
        stop = _stops(tokenizer, ["Answer", ":"], [198, "Answer", ":"])
        return "{prompt}\n\nAnswer:", stop
    if re.search(r"phi-2", name):
        return "Instruct:{prompt}\nOutput:", ([tokenizer.eos_id],)
    if re.search(r"phi", name):
        return "{prompt}\n\nAnswer:", ([tokenizer.eos_id],)
    # default: raw continuation
    return "{prompt}", ([tokenizer.eos_id],)


def _has(tokenizer: Tokenizer, token: str) -> bool:
    try:
        tokenizer.token_to_id(token)
        return True
    except Exception:
        return False


def _stops(tokenizer: Tokenizer, *seqs) -> tuple:
    """Build stop-token sequences, dropping any whose named tokens this
    tokenizer doesn't have (family templates assume the family's own
    tokenizer; degrade to eos-only elsewhere)."""
    out = [[tokenizer.eos_id]]
    for seq in seqs:
        ids = []
        for item in seq:
            if isinstance(item, int):
                ids.append(item)
            elif _has(tokenizer, item):
                ids.append(tokenizer.token_to_id(item))
            else:
                ids = None
                break
        if ids:
            out.append(ids)
    return tuple(out)


# --------------------------------------------------------------- streaming


class StreamingSession:
    """Holds the jitted prefill/step and yields tokens one at a time."""

    def __init__(self, cfg: Config, params, max_seq_length: int):
        self.cfg = cfg
        self.params = params
        self.max_seq_length = min(max_seq_length, cfg.block_size)
        self.rope = build_rope_cache(
            self.max_seq_length, cfg.rope_n_elem, cfg.rope_base, cfg.rope_condense_ratio
        )
        dtype = params["wte"].dtype

        def fwd(params, idx, pos, cache):
            logits, cache = gpt.forward(
                params, cfg, idx, input_pos=pos, kv_cache=cache, rope_cache=self.rope
            )
            return logits[:, -1, :], cache

        self._fwd = jax.jit(fwd, donate_argnums=(3,))
        self._dtype = dtype

    def generate_stream(
        self,
        encoded: np.ndarray,
        max_returned_tokens: int,
        *,
        temperature: float = 0.8,
        top_k: Optional[int] = None,
        stop_tokens: Tuple[List[int], ...] = (),
        key=None,
    ) -> Iterator[np.ndarray]:
        """Yield generated token ids; buffers a ring of up to the longest
        stop sequence and stops when one matches (ref chat/base.py:50-68)."""
        key = key if key is not None else jax.random.PRNGKey(int(time.time_ns()) % (2**31))
        cache = gpt.init_kv_cache(self.cfg, 1, self.max_seq_length, self._dtype)
        t = len(encoded)
        logits, cache = self._fwd(
            self.params, jnp.asarray(encoded, jnp.int32)[None], 0, cache
        )
        buffer: List[int] = []
        max_stop_len = max((len(s) for s in stop_tokens), default=0)
        pos = t
        while pos < max_returned_tokens:
            key, sub = jax.random.split(key)
            tok = int(sample(logits[0], sub, temperature, top_k))
            buffer.append(tok)
            for s in stop_tokens:
                if len(buffer) >= len(s) and buffer[-len(s):] == list(s):
                    # flush everything before the stop sequence
                    head = buffer[: len(buffer) - len(s)]
                    if head:
                        yield np.asarray(head)
                    return
            if max_stop_len and len(buffer) > max_stop_len:
                yield np.asarray([buffer.pop(0)])
            elif not max_stop_len:
                yield np.asarray([buffer.pop(0)])
            logits, cache = self._fwd(
                self.params, jnp.asarray([[tok]], jnp.int32), pos, cache
            )
            pos += 1
        if buffer:
            yield np.asarray(buffer)


def decode_stream(tokenizer: Tokenizer, token_stream: Iterator[np.ndarray], out=sys.stdout) -> int:
    """Incremental detokenization that respects sentencepiece word
    boundaries (ref chat/base.py:81-96): decode a growing window so spaces
    reconstruct correctly."""
    tokens_printed = 0
    so_far: List[int] = []
    text_printed = ""
    for tok in token_stream:
        so_far.extend(int(x) for x in np.asarray(tok).reshape(-1))
        text = tokenizer.decode(np.asarray(so_far))
        new = text[len(text_printed):]
        out.write(new)
        out.flush()
        text_printed = text
        tokens_printed = len(so_far)
    return tokens_printed


# -------------------------------------------------------------------- REPL


def main(
    checkpoint_dir: Path = Path("checkpoints"),
    quantize: Optional[str] = None,
    attn_alg: Optional[str] = None,
    precision: str = "bfloat16",
    max_new_tokens: int = 256,
    top_k: Optional[int] = 200,
    temperature: float = 0.8,
    tp: int = 1,
) -> None:
    """Interactive chat (ref chat/base.py main)."""
    from .generate import load_and_prepare

    cfg, params = load_and_prepare(
        Path(checkpoint_dir), quantize=quantize, attn_alg=attn_alg,
        precision=precision, tp=tp,
    )
    if tp == 1:
        from .engine import InferenceEngine

        params = InferenceEngine.prepare_params(params, "auto")
    tokenizer = Tokenizer(Path(checkpoint_dir))
    system_prompt, stop_tokens = prompt_config(cfg.name, tokenizer)
    session = StreamingSession(cfg, params, cfg.block_size)

    print(f"Now chatting with {cfg.name}.\nTo exit, press 'Enter' on an empty prompt.\n")
    while True:
        try:
            prompt = input(">> Prompt: ")
        except (EOFError, KeyboardInterrupt):
            break
        if not prompt:
            break
        full_prompt = system_prompt.format(prompt=prompt)
        encoded = tokenizer.encode(full_prompt)
        print(">> Reply: ", end="", flush=True)
        t0 = time.perf_counter()
        stream = session.generate_stream(
            encoded, min(len(encoded) + max_new_tokens, session.max_seq_length),
            temperature=temperature, top_k=top_k, stop_tokens=stop_tokens,
        )
        n = decode_stream(tokenizer, stream)
        dt = time.perf_counter() - t0
        print(f"\n** {n} tokens, {n / dt:.2f} tokens/sec **\n", file=sys.stderr)


def cli() -> None:
    from ..utils.cli import CLI

    CLI(main)


if __name__ == "__main__":
    cli()
