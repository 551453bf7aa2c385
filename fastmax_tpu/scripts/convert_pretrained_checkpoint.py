"""Turn a training-state checkpoint into a deployable checkpoint dir
(parity: /root/reference/scripts/convert_pretrained_checkpoint.py:20-78):
strips optimizer state, bundles config + tokenizer files.
"""

from __future__ import annotations

import shutil
from pathlib import Path
from typing import Optional

from ..models.config import Config
from ..models.params import params_to_flat
from ..utils.checkpoint import save_flat_checkpoint


def convert_pretrained_checkpoint(
    checkpoint_dir: Path,
    output_dir: Path,
    tokenizer_dir: Optional[Path] = None,
) -> None:
    """checkpoint_dir: a training out_dir containing state/ (orbax) and
    lit_config.json (or final/)."""
    checkpoint_dir = Path(checkpoint_dir)
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)

    cfg_path = None
    for cand in (checkpoint_dir / "lit_config.json", checkpoint_dir / "final" / "lit_config.json"):
        if cand.is_file():
            cfg_path = cand
            break
    if cfg_path is None:
        raise FileNotFoundError(f"no lit_config.json under {checkpoint_dir}")
    cfg = Config.from_json(cfg_path)

    state_dir = checkpoint_dir / "state"
    if state_dir.exists():
        from ..training.fit import load_train_state

        state = load_train_state(state_dir)
        flat = params_to_flat(state.params, cfg)
        save_flat_checkpoint(flat, output_dir)
    elif (checkpoint_dir / "final" / "model").exists():
        shutil.copytree(checkpoint_dir / "final" / "model", output_dir / "model",
                        dirs_exist_ok=True)
    else:
        raise FileNotFoundError(f"no weights under {checkpoint_dir}")

    cfg.to_json(output_dir / "lit_config.json")
    if tokenizer_dir:
        for f in Path(tokenizer_dir).glob("tokenizer*"):
            shutil.copy2(f, output_dir / f.name)
        gen_cfg = Path(tokenizer_dir) / "generation_config.json"
        if gen_cfg.is_file():
            shutil.copy2(gen_cfg, output_dir / gen_cfg.name)
    print(f"deployable checkpoint -> {output_dir}")


def main() -> None:
    from ..utils.cli import CLI

    CLI(convert_pretrained_checkpoint)


if __name__ == "__main__":
    main()
