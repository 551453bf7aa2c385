"""Checkpoint I/O: flat state dicts in several on-disk formats.

Covers the reference's checkpoint plane (SURVEY.md §5 checkpoint/resume):

* deploy checkpoints: a dir with lit_config.json + weights + tokenizer files
  (``check_valid_checkpoint_dir``, ref lit_gpt/utils.py:44-74),
* weight formats: our native npy-per-tensor dir (streaming-friendly, written
  by scripts/convert_hf_checkpoint.py), torch ``lit_model.pth`` (reference
  compatibility), and ``.safetensors``,
* training state via orbax (utils/orbax_io.py wraps it; optimizer state and
  step counters ride the same flat-dict contract).

Loads stream one tensor at a time — the host never holds two copies of the
model (the reference needed a custom incremental pickler for this,
lit_gpt/utils.py:77-222; numpy mmap + per-tensor files make it free here).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Iterator, Tuple

import numpy as np


def save_flat_checkpoint(flat: Dict[str, np.ndarray], path: Path) -> None:
    """Save a flat name->array dict. Directory -> native npy layout;
    .safetensors -> safetensors; .pth -> torch pickle."""
    path = Path(path)
    if path.suffix == ".safetensors":
        from safetensors.numpy import save_file

        save_file({k: np.ascontiguousarray(v) for k, v in flat.items()}, str(path))
    elif path.suffix in (".pth", ".pt", ".bin"):
        import torch

        torch.save({k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in flat.items()}, str(path))
    else:
        model_dir = path / "model"
        model_dir.mkdir(parents=True, exist_ok=True)
        names = []
        for name, arr in flat.items():
            np.save(model_dir / (name.replace("/", "_") + ".npy"), np.ascontiguousarray(arr))
            names.append(name)
        with open(model_dir / "index.json", "w") as fp:
            json.dump(sorted(names), fp, indent=0)


def iter_flat_checkpoint(path: Path) -> Iterator[Tuple[str, np.ndarray]]:
    """Stream (name, array) pairs from any supported checkpoint layout."""
    path = Path(path)
    if path.is_dir() and (path / "model" / "index.json").is_file():
        model_dir = path / "model"
        with open(model_dir / "index.json") as fp:
            names = json.load(fp)
        for name in names:
            yield name, np.load(model_dir / (name.replace("/", "_") + ".npy"), mmap_mode="r")
        return
    if path.is_dir():
        # checkpoint dir containing a weights file
        for candidate in ("lit_model.pth", "model.safetensors"):
            if (path / candidate).is_file():
                yield from iter_flat_checkpoint(path / candidate)
                return
        raise FileNotFoundError(f"no weights found under {path}")
    if path.suffix == ".safetensors":
        from safetensors import safe_open

        with safe_open(str(path), framework="np") as sf:
            for name in sf.keys():
                yield name, sf.get_tensor(name)
        return
    if path.suffix in (".pth", ".pt", ".bin"):
        import torch

        sd = torch.load(str(path), map_location="cpu", weights_only=True, mmap=True)
        for name, t in sd.items():
            arr = t.to(torch.float32).numpy() if t.dtype == torch.bfloat16 else t.numpy()
            yield name, arr
        return
    raise ValueError(f"unsupported checkpoint path {path}")


def load_flat_checkpoint(path: Path) -> Dict[str, np.ndarray]:
    return dict(iter_flat_checkpoint(path))


def load_model_params(checkpoint_dir: Path, cfg=None, dtype=None):
    """Load (config, params-pytree) from a converted checkpoint dir."""
    import jax.numpy as jnp

    from ..models.config import Config
    from ..models.params import flat_to_params

    checkpoint_dir = Path(checkpoint_dir)
    if cfg is None:
        cfg = Config.from_checkpoint(checkpoint_dir)
    flat = load_flat_checkpoint(checkpoint_dir)
    params = flat_to_params(flat, cfg, dtype or jnp.float32)
    return cfg, params


def check_valid_checkpoint_dir(checkpoint_dir: Path) -> None:
    """Validate the deploy-checkpoint contract (ref lit_gpt/utils.py:44-74)."""
    checkpoint_dir = Path(checkpoint_dir)
    files = {
        "weights": (checkpoint_dir / "model" / "index.json").is_file()
        or (checkpoint_dir / "lit_model.pth").is_file()
        or (checkpoint_dir / "model.safetensors").is_file(),
        "lit_config.json": (checkpoint_dir / "lit_config.json").is_file(),
        "tokenizer": (checkpoint_dir / "tokenizer.json").is_file()
        or (checkpoint_dir / "tokenizer.model").is_file(),
        "tokenizer_config.json": (checkpoint_dir / "tokenizer_config.json").is_file(),
    }
    if all(files.values()):
        return
    missing = [k for k, ok in files.items() if not ok]
    raise OSError(
        f"checkpoint_dir {str(checkpoint_dir)!r} is missing: {missing}. "
        "Run scripts/download.py and scripts/convert_hf_checkpoint.py first."
    )
