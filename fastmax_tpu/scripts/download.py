"""Download model weights from HuggingFace Hub
(parity: /root/reference/scripts/download.py:22-97).

Network access may be unavailable in some environments; the tool fails with
a clear message in that case. ``--convert`` chains straight into
convert_hf_checkpoint so one command produces a ready checkpoint dir.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional

from ..models.config import available_models


def download(
    repo_id: Optional[str] = None,
    checkpoint_dir: Path = Path("checkpoints"),
    access_token: Optional[str] = None,
    tokenizer_only: bool = False,
    convert: bool = True,
) -> None:
    if repo_id is None:
        print("Supported models:")
        for name in available_models():
            print(" ", name)
        return

    from huggingface_hub import snapshot_download

    directory = Path(checkpoint_dir) / repo_id
    allow = ["tokenizer*", "generation_config.json"] if tokenizer_only else [
        "*.safetensors*", "*.bin*", "*.json", "tokenizer*",
    ]
    snapshot_download(
        repo_id,
        local_dir=directory,
        allow_patterns=allow,
        token=access_token or os.getenv("HF_TOKEN"),
    )
    print(f"downloaded to {directory}")
    if convert and not tokenizer_only:
        from .convert_hf_checkpoint import convert_hf_checkpoint

        convert_hf_checkpoint(directory, model_name=Path(repo_id).name)


def main() -> None:
    from ..utils.cli import CLI

    CLI(download)


if __name__ == "__main__":
    main()
