"""Merge a LoRA delta checkpoint into base weights and save a deployable
checkpoint (parity: /root/reference/scripts/merge_lora.py:20-83).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax.numpy as jnp

from ..models.config import Config
from ..models import lora as lora_mod
from ..models.params import params_to_flat
from ..utils.checkpoint import load_model_params, save_flat_checkpoint


def merge_lora(
    checkpoint_dir: Path,
    lora_path: Path,
    out_dir: Optional[Path] = None,
    precision: str = "float32",
) -> None:
    """Load base + delta, merge, save plain weights (lora keys stripped)."""
    checkpoint_dir = Path(checkpoint_dir)
    out_dir = Path(out_dir) if out_dir else checkpoint_dir / "merged"
    cfg = Config.from_checkpoint(checkpoint_dir)
    _, params = load_model_params(checkpoint_dir, cfg, getattr(jnp, precision))

    from ..inference.generate import apply_finetuned

    params = apply_finetuned(params, cfg, Path(lora_path), "lora", getattr(jnp, precision))
    flat = params_to_flat(params, cfg)
    out_dir.mkdir(parents=True, exist_ok=True)
    save_flat_checkpoint(flat, out_dir)
    cfg.to_json(out_dir / "lit_config.json")
    print(f"merged checkpoint -> {out_dir}")


def main() -> None:
    from ..utils.cli import CLI

    CLI(merge_lora)


if __name__ == "__main__":
    main()
