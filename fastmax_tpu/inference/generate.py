"""Generation CLI — the reference's generate/ script family in one tool
(generate/base.py, full.py, lora.py, adapter.py, adapter_v2.py; the role of
generate/tp.py and sequentially.py is covered by --tp/--fsdp mesh flags,
SURVEY.md §2.4/§2.7).

  python -m fastmax_tpu.inference.generate --checkpoint_dir ckpt \\
      --prompt "Hello, my name is" --quantize bnb.nf4 --attn_alg fastmax

Finetuned variants: --finetuned_path points at a delta checkpoint saved by
training/finetune.py (LoRA deltas are merged before decode, the
generate/lora.py:42,91 flow); --prompt_style alpaca|flan wraps the prompt.
Multi-chip: --tp N shards weights/KV over the model mesh axis, --fsdp N
over the fsdp axis (one process, SPMD).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import Config
from ..models.tokenizer import Tokenizer
from .engine import InferenceEngine


def load_and_prepare(
    checkpoint_dir: Path,
    *,
    quantize: Optional[str] = None,
    attn_alg: Optional[str] = None,
    finetuned_path: Optional[Path] = None,
    method: str = "lora",
    precision: str = "bfloat16",
    tp: int = 1,
    fsdp: int = 1,
    gptq_calib_tokens=None,
):
    """Load config+params (+finetuned deltas), quantize, shard.

    gptq_calib_tokens: (B, T) int token ids — when given with a 4-bit
    ``quantize`` mode, weights are quantized with GPTQ error compensation
    against these calibration activations (ops/gptq.py) instead of plain
    round-to-nearest."""
    from ..utils.checkpoint import load_model_params

    checkpoint_dir = Path(checkpoint_dir)
    kw = {"attn_alg": attn_alg} if attn_alg else {}
    cfg = Config.from_checkpoint(checkpoint_dir, **kw)
    dtype = getattr(jnp, precision)

    if (tp > 1 or fsdp > 1) and finetuned_path is None and not quantize:
        # multi-chip dense load: stream each host's shard slices straight
        # from checkpoint mmap to the mesh — no host holds a full model
        # (utils/sharded_load.py; the reference's xla/utils.py:34-113 role)
        from ..parallel import sharding as sh
        from ..utils.sharded_load import load_sharded_model_params

        mesh = sh.make_mesh(data=1, fsdp=fsdp, model=tp)
        _, params = load_sharded_model_params(
            checkpoint_dir, mesh, cfg=cfg, dtype=dtype, tp=tp > 1, fsdp_size=fsdp
        )
        return cfg, params

    _, params = load_model_params(checkpoint_dir, cfg, dtype)

    if finetuned_path is not None:
        params = apply_finetuned(params, cfg, Path(finetuned_path), method, dtype)

    if quantize:
        four_bit = quantize in ("gptq.int4", "bnb.nf4", "bnb.nf4-dq",
                                "bnb.fp4", "bnb.fp4-dq")
        if gptq_calib_tokens is not None and four_bit:
            from ..ops.gptq import gptq_quantize_model

            kind = quantize.split(".")[1].split("-")[0]
            params = gptq_quantize_model(
                params, cfg, gptq_calib_tokens, kind=kind,
                double_quant=quantize.endswith("-dq"),
            )
        else:
            from ..ops.quant import quantize_model

            params = quantize_model(params, quantize)

    if tp > 1 or fsdp > 1:
        from ..parallel import sharding as sh

        mesh = sh.make_mesh(data=1, fsdp=fsdp, model=tp)
        specs = sh.param_specs(cfg, params, tp=tp > 1, fsdp_size=fsdp)
        params = sh.shard_params(params, mesh, specs)
    return cfg, params


def apply_finetuned(params, cfg, finetuned_path: Path, method: str, dtype):
    """Attach finetuned weights.

    method "full": the file holds a complete lit-named state dict — replace
    all params (generate/full.py role). lora/adapter: the file holds delta
    leaves addressed by internal pytree dot-paths (training/finetune.py's
    checkpoint_fn contract); LoRA deltas are merged into the base
    (generate/lora.py:42,91)."""
    from safetensors import safe_open

    from ..models import lora as lora_mod

    with safe_open(str(finetuned_path), framework="np") as sf:
        delta = {name: sf.get_tensor(name) for name in sf.keys()}

    if method == "full":
        from ..models.params import flat_to_params

        return flat_to_params(delta, cfg, dtype)

    def set_path(tree, dotted, value):
        parts = dotted.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(value, dtype)

    for name, arr in delta.items():
        set_path(params, name, arr)
    if method == "lora":
        params = lora_mod.merge_lora(params)
    return params


def main(
    prompt: str = "Hello, my name is",
    checkpoint_dir: Path = Path("checkpoints"),
    num_samples: int = 1,
    max_new_tokens: int = 50,
    top_k: Optional[int] = 200,
    temperature: float = 0.8,
    quantize: Optional[str] = None,
    attn_alg: Optional[str] = None,
    finetuned_path: Optional[Path] = None,
    method: str = "lora",
    prompt_style: Optional[str] = None,
    precision: str = "bfloat16",
    tp: int = 1,
    fsdp: int = 1,
    seed: int = 1234,
    weights_mode: str = "auto",
    kv_cache_dtype: Optional[str] = None,
    speculative_k: int = 0,
    draft_checkpoint_dir: Optional[Path] = None,
    gptq_calib: Optional[Path] = None,
) -> None:
    """Generate text samples from a checkpoint (ref generate/base.py:96-187).

    weights_mode: quantized|preload|preload_int8|auto (see InferenceEngine);
    kv_cache_dtype: e.g. int8 for the quantized KV cache, bfloat16, ...;
    speculative_k: >0 enables speculative decoding with k drafted tokens
    per verify step (greedy at temperature 0; otherwise exact speculative
    sampling via the rejection rule). Drafts come from prompt lookup, or
    from a small draft model when --draft_checkpoint_dir is given (must
    share the tokenizer/vocab, e.g. pythia-14m drafting for pythia-410m);
    gptq_calib: path to a plain-text calibration file — with a 4-bit
    --quantize mode, quantizes with GPTQ error compensation against the
    model's own activations on this text (ops/gptq.py).
    """
    tokenizer = Tokenizer(Path(checkpoint_dir))
    calib_tokens = None
    if gptq_calib is not None:
        text = Path(gptq_calib).read_text()
        ids = tokenizer.encode(text)
        cfg0 = Config.from_checkpoint(Path(checkpoint_dir))
        t = min(len(ids), cfg0.block_size)
        calib_tokens = np.asarray(ids[:t], np.int32)[None]
    cfg, params = load_and_prepare(
        checkpoint_dir, quantize=quantize, attn_alg=attn_alg,
        finetuned_path=finetuned_path, method=method, precision=precision,
        tp=tp, fsdp=fsdp, gptq_calib_tokens=calib_tokens,
    )
    if prompt_style:
        from ..data.prompts import STYLES

        prompt = STYLES[prompt_style]({"instruction": prompt, "input": ""})
    encoded = tokenizer.encode(prompt)
    prompt_len = len(encoded)
    max_returned = prompt_len + max_new_tokens

    mesh = None
    if tp > 1 or fsdp > 1:
        from ..parallel import sharding as sh

        # deterministic over the same device list, so this is the mesh
        # load_and_prepare sharded the params onto
        mesh = sh.make_mesh(data=1, fsdp=fsdp, model=tp)
    engine = InferenceEngine(
        cfg, params,
        max_seq_length=max_returned + (speculative_k + 1 if speculative_k else 0),
        batch_size=1,
        weights_mode=weights_mode,
        cache_dtype=getattr(jnp, kv_cache_dtype) if kv_cache_dtype else None,
        mesh=mesh,
    )
    spec = None
    if speculative_k and draft_checkpoint_dir:
        from .speculative import DraftSpeculativeDecoder

        dcfg, dparams = load_and_prepare(
            Path(draft_checkpoint_dir), quantize=quantize, precision=precision
        )
        draft_engine = InferenceEngine(
            dcfg, dparams, max_seq_length=engine.max_seq_length, batch_size=1,
            weights_mode=weights_mode,
        )
        spec = DraftSpeculativeDecoder(engine, draft_engine, k=speculative_k)
    elif speculative_k:
        from .speculative import SpeculativeDecoder

        spec = SpeculativeDecoder(engine, k=speculative_k)
    print(f"model {cfg.name}: attn_alg={cfg.attn_alg}"
          + (f", quantized {quantize}" if quantize else ""), file=sys.stderr)

    key = jax.random.PRNGKey(seed)
    for i in range(num_samples):
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        if spec is not None:
            out = spec.generate(jnp.asarray(encoded), max_returned,
                                eos_id=tokenizer.eos_id,
                                temperature=temperature, top_k=top_k, key=sub)
        else:
            out = engine.generate(
                jnp.asarray(encoded), max_returned,
                temperature=temperature, top_k=top_k,
                eos_id=tokenizer.eos_id, key=sub,
            )
        dt = time.perf_counter() - t0
        print(tokenizer.decode(np.asarray(out[0])))
        n_new = out.shape[1] - prompt_len
        print(
            f"Time for inference {i + 1}: {dt:.02f} sec total, "
            f"{n_new / dt:.02f} tokens/sec",
            file=sys.stderr,
        )

    # peak device memory next to the tok/s line — every reference baseline
    # row pairs both (ref generate/base.py:186-187, resource-tables.md)
    from ..utils.profiling import device_memory_stats

    peak = device_memory_stats()["peak_bytes_in_use"]
    if peak:
        print(f"Memory used: {peak / 2**30:.02f} GB", file=sys.stderr)


def cli() -> None:
    from ..utils.cli import CLI

    CLI(main)


if __name__ == "__main__":
    cli()
