"""Convert a native/lit checkpoint back to HuggingFace layout
(parity: /root/reference/scripts/convert_lit_checkpoint.py:21-272).

The fused GQA-interleaved QKV is split back into separate q/k/v
projections (the qkv_split inverse, ref :220-236); refuses unmerged
LoRA/adapter checkpoints (:239-243). Streams tensor-by-tensor.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import numpy as np

from ..models.config import Config
from ..utils.checkpoint import iter_flat_checkpoint, save_flat_checkpoint
from .convert_hf_checkpoint import (
    falcon_weight_map,
    llama_weight_map,
    neox_weight_map,
    phi_weight_map,
    split_qkv,
)


def _invert(weight_map: Dict[str, Optional[str]]) -> Dict[str, str]:
    return {v: k for k, v in weight_map.items() if v is not None}


def convert_lit_checkpoint(
    checkpoint_path: Path,
    output_path: Path,
    model_name: Optional[str] = None,
) -> None:
    checkpoint_path = Path(checkpoint_path)
    cfg_dir = checkpoint_path if checkpoint_path.is_dir() else checkpoint_path.parent
    cfg = Config.from_checkpoint(cfg_dir, **({} if model_name is None else {"name": model_name}))
    name = model_name or cfg.name

    if "falcon" in name:
        inv = _invert(falcon_weight_map(name))
        family = "falcon"
    elif cfg.mlp_class_name in ("LLaMAMLP", "GemmaMLP", "LLaMAMoE"):
        inv = _invert(llama_weight_map(cfg))
        family = "llama"
    elif "phi" in name:
        inv = _invert(phi_weight_map())
        family = "phi"
    else:
        inv = _invert(neox_weight_map())
        family = "neox"

    out: Dict[str, np.ndarray] = {}
    untied_lm_head = False
    for lit_name, arr in iter_flat_checkpoint(checkpoint_path):
        if "lora_" in lit_name or "adapter" in lit_name:
            raise ValueError(
                f"{lit_name!r} is a PEFT delta — merge it first "
                "(scripts/merge_lora.py), as the reference converter requires"
            )
        arr = np.asarray(arr)
        parts = lit_name.split(".")
        layer = None
        template = lit_name
        if len(parts) > 2 and parts[1] == "h":
            layer = parts[2]
            parts[2] = "{}"
            template = ".".join(parts)
        if family in ("llama", "phi") and template.startswith("transformer.h.{}.attn.attn."):
            kind = parts[-1]  # weight / bias
            q, k, v = split_qkv(arr, cfg)
            for proj, tensor in (("q_proj", q), ("k_proj", k), ("v_proj", v)):
                out[f"model.layers.{layer}.self_attn.{proj}.{kind}"] = tensor
            continue
        expert = None
        if "mlp.experts." in template:
            e_idx = 4 + 1  # transformer.h.{}.mlp.experts.E...
            expert = parts[5]
            parts[5] = "{e}"
            template = ".".join(parts)
        hf_tmpl = inv.get(template)
        if hf_tmpl is None:
            continue
        # resolve the named {e} field BEFORE positional .format (mixing
        # auto-numbered and named fields raises KeyError)
        if expert is not None:
            hf_tmpl = hf_tmpl.replace("{e}", expert)
        hf_name = hf_tmpl.format(layer) if layer is not None else hf_tmpl
        if lit_name == "lm_head.weight":
            untied_lm_head = True
        out[hf_name] = arr

    save_flat_checkpoint(out, Path(output_path))
    print(f"wrote {len(out)} tensors -> {output_path}")


def main() -> None:
    from ..utils.cli import CLI

    CLI(convert_lit_checkpoint)


if __name__ == "__main__":
    main()
