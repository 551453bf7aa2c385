"""Prepare a nanoGPT-style train.bin/val.bin token memmap
(parity: /root/reference/scripts/prepare_openwebtext.py:21-81).

Works from local text/jsonl files or, when network and the ``datasets``
package cooperate, from an HF dataset name. Tokenizes with the checkpoint's
tokenizer and writes concatenated uint16 streams.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Iterable

import numpy as np

from ..models.tokenizer import Tokenizer


def _iter_texts(source: str) -> Iterable[str]:
    p = Path(source)
    if p.is_file():
        if p.suffix == ".jsonl":
            with open(p, encoding="utf-8") as f:
                for line in f:
                    if line.strip():
                        yield json.loads(line).get("text", "")
        else:
            yield p.read_text(encoding="utf-8")
        return
    if p.is_dir():
        for f in sorted(p.glob("**/*.txt")):
            yield f.read_text(encoding="utf-8")
        return
    # fall back to an HF dataset name (requires network)
    from datasets import load_dataset

    ds = load_dataset(source, split="train")
    for rec in ds:
        yield rec.get("text", "")


def prepare(
    source: str,
    checkpoint_dir: Path,
    destination_path: Path = Path("data/openwebtext"),
    test_size: float = 0.0005,
    seed: int = 2357,
) -> None:
    destination_path = Path(destination_path)
    destination_path.mkdir(parents=True, exist_ok=True)
    tokenizer = Tokenizer(Path(checkpoint_dir))

    # uint16 only fits vocabularies below 65500 (the PackedDatasetBuilder
    # rule); larger vocabs (e.g. Gemma's 256k) must use int32
    dtype = np.uint16 if tokenizer.vocab_size < 65500 else np.int32
    all_tokens = []
    for text in _iter_texts(source):
        if not text:
            continue
        toks = tokenizer.encode(text, bos=False, eos=True)
        all_tokens.append(np.asarray(toks, dtype))
    stream = np.concatenate(all_tokens)
    n_val = max(int(len(stream) * test_size), 1)
    splits = {"train": stream[:-n_val], "val": stream[-n_val:]}
    for name, arr in splits.items():
        out = destination_path / f"{name}.bin"
        arr.astype(dtype).tofile(out)
        print(f"{name}: {len(arr):,} tokens ({np.dtype(dtype).name}) -> {out}")
    (destination_path / "meta.json").write_text(
        json.dumps({"dtype": np.dtype(dtype).name, "vocab_size": tokenizer.vocab_size})
    )


def main() -> None:
    from ..utils.cli import CLI

    CLI(prepare)


if __name__ == "__main__":
    main()
