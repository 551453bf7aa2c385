"""Convert HuggingFace checkpoints to the framework's native format.

Capability parity with the reference converter
(/root/reference/scripts/convert_hf_checkpoint.py:23-356): per-family weight
maps (gpt-neox, falcon 7b-vs-40b/180B layernorm naming, llama/Mixtral with
separate q/k/v reconstituted into the GQA-interleaved fused QKV, phi), with
streaming so a model larger than host RAM converts — each tensor is loaded,
renamed, written to the output, and dropped before the next one (the role of
the reference's incremental_save pickler, lit_gpt/utils.py:77-222).

Output layout (a checkpoint dir the engine and Tokenizer consume directly):
  lit_config.json        model architecture (reference-compatible keys)
  model/<name>.npy       one numpy file per flat lit-style tensor name
                         ('/' replaces '.' in filenames)
plus the tokenizer files already present in the source dir.

The npy-per-tensor layout is deliberately simple and mmap-friendly: loading
N sharded tensors for a pjit mesh reads only the slices each host needs.
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Dict, Iterator, Optional, Tuple

import numpy as np

from ..models.config import Config

# --------------------------------------------------------------------- maps


def neox_weight_map() -> Dict[str, Optional[str]]:
    return {
        "gpt_neox.embed_in.weight": "transformer.wte.weight",
        "gpt_neox.layers.{}.input_layernorm.bias": "transformer.h.{}.norm_1.bias",
        "gpt_neox.layers.{}.input_layernorm.weight": "transformer.h.{}.norm_1.weight",
        "gpt_neox.layers.{}.attention.query_key_value.bias": "transformer.h.{}.attn.attn.bias",
        "gpt_neox.layers.{}.attention.query_key_value.weight": "transformer.h.{}.attn.attn.weight",
        "gpt_neox.layers.{}.attention.dense.bias": "transformer.h.{}.attn.proj.bias",
        "gpt_neox.layers.{}.attention.dense.weight": "transformer.h.{}.attn.proj.weight",
        "gpt_neox.layers.{}.attention.rotary_emb.inv_freq": None,
        "gpt_neox.layers.{}.attention.bias": None,
        "gpt_neox.layers.{}.attention.masked_bias": None,
        "gpt_neox.layers.{}.post_attention_layernorm.bias": "transformer.h.{}.norm_2.bias",
        "gpt_neox.layers.{}.post_attention_layernorm.weight": "transformer.h.{}.norm_2.weight",
        "gpt_neox.layers.{}.mlp.dense_h_to_4h.bias": "transformer.h.{}.mlp.fc.bias",
        "gpt_neox.layers.{}.mlp.dense_h_to_4h.weight": "transformer.h.{}.mlp.fc.weight",
        "gpt_neox.layers.{}.mlp.dense_4h_to_h.bias": "transformer.h.{}.mlp.proj.bias",
        "gpt_neox.layers.{}.mlp.dense_4h_to_h.weight": "transformer.h.{}.mlp.proj.weight",
        "gpt_neox.final_layer_norm.bias": "transformer.ln_f.bias",
        "gpt_neox.final_layer_norm.weight": "transformer.ln_f.weight",
        "embed_out.weight": "lm_head.weight",
    }


def falcon_weight_map(model_name: str) -> Dict[str, Optional[str]]:
    m = {
        "transformer.word_embeddings.weight": "transformer.wte.weight",
        "transformer.h.{}.self_attention.query_key_value.weight": "transformer.h.{}.attn.attn.weight",
        "transformer.h.{}.self_attention.dense.weight": "transformer.h.{}.attn.proj.weight",
        "transformer.h.{}.mlp.dense_h_to_4h.weight": "transformer.h.{}.mlp.fc.weight",
        "transformer.h.{}.mlp.dense_4h_to_h.weight": "transformer.h.{}.mlp.proj.weight",
        "transformer.ln_f.bias": "transformer.ln_f.bias",
        "transformer.ln_f.weight": "transformer.ln_f.weight",
        "lm_head.weight": "lm_head.weight",
    }
    if "7b" in model_name:
        m["transformer.h.{}.input_layernorm.bias"] = "transformer.h.{}.norm_1.bias"
        m["transformer.h.{}.input_layernorm.weight"] = "transformer.h.{}.norm_1.weight"
    elif "40b" in model_name or "180B" in model_name:
        m["transformer.h.{}.ln_attn.bias"] = "transformer.h.{}.norm_1.bias"
        m["transformer.h.{}.ln_attn.weight"] = "transformer.h.{}.norm_1.weight"
        m["transformer.h.{}.ln_mlp.bias"] = "transformer.h.{}.norm_2.bias"
        m["transformer.h.{}.ln_mlp.weight"] = "transformer.h.{}.norm_2.weight"
    else:
        raise NotImplementedError(f"unknown falcon variant {model_name}")
    return m


def llama_weight_map(cfg: Config) -> Dict[str, Optional[str]]:
    m = {
        "model.embed_tokens.weight": "transformer.wte.weight",
        "model.layers.{}.input_layernorm.weight": "transformer.h.{}.norm_1.weight",
        "model.layers.{}.input_layernorm.bias": "transformer.h.{}.norm_1.bias",
        "model.layers.{}.self_attn.o_proj.weight": "transformer.h.{}.attn.proj.weight",
        "model.layers.{}.self_attn.rotary_emb.inv_freq": None,
        "model.layers.{}.post_attention_layernorm.weight": "transformer.h.{}.norm_2.weight",
        "model.layers.{}.post_attention_layernorm.bias": "transformer.h.{}.norm_2.bias",
        "model.norm.weight": "transformer.ln_f.weight",
        "model.norm.bias": "transformer.ln_f.bias",
        "lm_head.weight": "lm_head.weight",
    }
    if cfg.mlp_class_name == "LLaMAMoE":
        m.update(
            {
                "model.layers.{}.block_sparse_moe.gate.weight": "transformer.h.{}.mlp.gate.weight",
                "model.layers.{}.block_sparse_moe.experts.{e}.w1.weight": "transformer.h.{}.mlp.experts.{e}.fc_1.weight",
                "model.layers.{}.block_sparse_moe.experts.{e}.w3.weight": "transformer.h.{}.mlp.experts.{e}.fc_2.weight",
                "model.layers.{}.block_sparse_moe.experts.{e}.w2.weight": "transformer.h.{}.mlp.experts.{e}.proj.weight",
            }
        )
    else:
        m.update(
            {
                "model.layers.{}.mlp.gate_proj.weight": "transformer.h.{}.mlp.fc_1.weight",
                "model.layers.{}.mlp.up_proj.weight": "transformer.h.{}.mlp.fc_2.weight",
                "model.layers.{}.mlp.down_proj.weight": "transformer.h.{}.mlp.proj.weight",
            }
        )
    return m


def phi_weight_map() -> Dict[str, Optional[str]]:
    return {
        "model.embed_tokens.weight": "transformer.wte.weight",
        "model.layers.{}.input_layernorm.weight": "transformer.h.{}.norm_1.weight",
        "model.layers.{}.input_layernorm.bias": "transformer.h.{}.norm_1.bias",
        "model.layers.{}.self_attn.dense.weight": "transformer.h.{}.attn.proj.weight",
        "model.layers.{}.self_attn.dense.bias": "transformer.h.{}.attn.proj.bias",
        "model.layers.{}.mlp.fc1.weight": "transformer.h.{}.mlp.fc.weight",
        "model.layers.{}.mlp.fc1.bias": "transformer.h.{}.mlp.fc.bias",
        "model.layers.{}.mlp.fc2.weight": "transformer.h.{}.mlp.proj.weight",
        "model.layers.{}.mlp.fc2.bias": "transformer.h.{}.mlp.proj.bias",
        "model.final_layernorm.weight": "transformer.ln_f.weight",
        "model.final_layernorm.bias": "transformer.ln_f.bias",
        "lm_head.weight": "lm_head.weight",
        "lm_head.bias": "lm_head.bias",
    }


def interleave_qkv(q: np.ndarray, k: np.ndarray, v: np.ndarray, cfg: Config) -> np.ndarray:
    """Fuse separate q/k/v projections into the grouped-interleaved layout.

    The fused tensor cycles per query group: [q_1..q_{q_per_kv}, k, v]
    (ref: convert_hf_checkpoint.py:186-200). Works for weights (2D, rows are
    out-features) and biases (1D).
    """
    g = cfg.n_query_groups
    qs = np.split(q, g, axis=0)  # per-group blocks of q_per_kv * head_size rows
    ks = np.split(k, g, axis=0)
    vs = np.split(v, g, axis=0)
    cycled = [t for group in zip(qs, ks, vs) for t in group]
    return np.concatenate(cycled, axis=0)


def split_qkv(qkv: np.ndarray, cfg: Config) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Inverse of interleave_qkv (for the lit->HF direction)."""
    q_per_kv = cfg.n_head // cfg.n_query_groups
    hs = cfg.head_size
    g = cfg.n_query_groups
    blocks = np.split(qkv, g, axis=0)
    qs, ks, vs = [], [], []
    for blk in blocks:
        qs.append(blk[: q_per_kv * hs])
        ks.append(blk[q_per_kv * hs : (q_per_kv + 1) * hs])
        vs.append(blk[(q_per_kv + 1) * hs :])
    return np.concatenate(qs, axis=0), np.concatenate(ks, axis=0), np.concatenate(vs, axis=0)


# ----------------------------------------------------------------- streaming


def iter_hf_tensors(checkpoint_dir: Path) -> Iterator[Tuple[str, np.ndarray]]:
    """Yield (name, array) from HF .safetensors or .bin shards, one at a time."""
    st_files = sorted(checkpoint_dir.glob("*.safetensors"))
    if st_files:
        from safetensors import safe_open

        for f in st_files:
            with safe_open(str(f), framework="np") as sf:
                for name in sf.keys():
                    yield name, sf.get_tensor(name)
        return
    bin_files = sorted(f for f in checkpoint_dir.glob("*.bin") if f.name != "training_args.bin")
    if not bin_files:
        raise ValueError(f"Expected {str(checkpoint_dir)!r} to contain .safetensors or .bin files")
    import torch

    for f in bin_files:
        sd = torch.load(str(f), map_location="cpu", weights_only=True, mmap=True)
        for name, t in sd.items():
            yield name, t.to(torch.float32).numpy() if t.dtype == torch.bfloat16 else t.numpy()


def _template(name: str, idx: int) -> Tuple[str, int]:
    parts = name.split(".")
    number = int(parts[idx])
    parts[idx] = "{}"
    return ".".join(parts), number


class NativeCheckpointWriter:
    """Writes one .npy per tensor under <out_dir>/model/ — streaming-friendly."""

    def __init__(self, out_dir: Path):
        self.model_dir = Path(out_dir) / "model"
        self.model_dir.mkdir(parents=True, exist_ok=True)
        self.names = []

    def put(self, name: str, array: np.ndarray) -> None:
        fname = name.replace("/", "_") + ".npy"
        np.save(self.model_dir / fname, np.ascontiguousarray(array))
        self.names.append(name)

    def finish(self) -> None:
        with open(self.model_dir / "index.json", "w") as fp:
            json.dump(sorted(self.names), fp, indent=0)


def convert_hf_checkpoint(
    checkpoint_dir: Path,
    model_name: Optional[str] = None,
    out_dir: Optional[Path] = None,
    dtype: Optional[str] = None,
) -> Path:
    """Convert an HF checkpoint dir into the native format. Returns out_dir."""
    checkpoint_dir = Path(checkpoint_dir)
    if model_name is None:
        model_name = checkpoint_dir.name
    out_dir = Path(out_dir) if out_dir else checkpoint_dir
    cfg = Config.from_name(model_name)
    out_dir.mkdir(parents=True, exist_ok=True)
    cfg.to_json(out_dir / "lit_config.json")

    if "falcon" in model_name:
        weight_map = falcon_weight_map(model_name)
        family = "falcon"
    elif cfg.mlp_class_name in ("LLaMAMLP", "GemmaMLP", "LLaMAMoE"):
        weight_map = llama_weight_map(cfg)
        family = "llama"
    elif "phi" in model_name:
        weight_map = phi_weight_map()
        family = "phi"
    else:
        weight_map = neox_weight_map()
        family = "neox"

    writer = NativeCheckpointWriter(out_dir)
    # q/k/v shards awaiting fusion: layer -> {"weight"|"bias" -> {q|k|v}}
    pending: Dict[int, Dict[str, Dict[str, np.ndarray]]] = {}
    saw_lm_head = False
    wte: Optional[np.ndarray] = None

    np_dtype = np.dtype(dtype) if dtype else None

    for name, param in iter_hf_tensors(checkpoint_dir):
        if np_dtype is not None and param.dtype != np_dtype and param.dtype.kind == "f":
            param = param.astype(np_dtype)
        layer = None
        expert = None
        from_name = name
        if re.search(r"\.(layers|h)\.\d+\.", name):
            from_name, layer = _template(name, 2)
            if "block_sparse_moe.experts" in from_name:
                from_name, expert = _template(from_name, 5)
                from_name = re.sub(r"experts\.\{\}\.", "experts.{e}.", from_name)
        # q/k/v gathering for the split-projection families
        if family in ("llama", "phi") and any(
            t in name for t in ("q_proj", "k_proj", "v_proj")
        ):
            proj, kind = name.split(".")[-2:]  # e.g. q_proj, weight
            pending.setdefault(layer, {}).setdefault(kind, {})[proj[0]] = param
            trio = pending[layer][kind]
            if len(trio) == 3:
                fused = interleave_qkv(trio["q"], trio["k"], trio["v"], cfg)
                writer.put(f"transformer.h.{layer}.attn.attn.{kind}", fused)
                del pending[layer][kind]
            continue

        if expert is not None:
            to_name = weight_map.get(from_name)
            if to_name is None:
                continue
            writer.put(to_name.format(layer, e=expert), param)
            continue

        to_name = weight_map.get(from_name)
        if to_name is None:
            if from_name not in weight_map:
                raise KeyError(f"no mapping for HF tensor {name!r}")
            continue
        if layer is not None:
            to_name = to_name.format(layer)
        if to_name == "lm_head.weight":
            saw_lm_head = True
        if to_name == "transformer.wte.weight":
            wte = param
        writer.put(to_name, param)

    if family == "llama" and not saw_lm_head and wte is not None:
        # tied embeddings (ref convert_hf_checkpoint.py:182-183)
        writer.put("lm_head.weight", wte)
    writer.finish()
    return out_dir


def main() -> None:
    from ..utils.cli import CLI

    CLI(convert_hf_checkpoint)


if __name__ == "__main__":
    main()
