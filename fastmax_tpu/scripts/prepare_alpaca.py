"""Prepare instruction datasets (alpaca / flan / dolly / lima / longform /
csv / booksum style) into tokenized train/test files.

Covers the reference's prepare_* family (scripts/prepare_alpaca.py and
siblings, ~1.1k LoC across 7 scripts — SURVEY.md §2.6) with one tool: any
JSON/JSONL/CSV file becomes {input_ids, labels} examples with the prompt
masked to ignore_index, saved as .npz (native) — loadable by
training/finetune.py (which also reads the reference's .pt files directly).
Per-dataset field layouts (dolly's context/response, flan's inputs/targets,
lima's multi-turn conversations, booksum's chapter/summary_text) are handled
by ``--style`` via data/prompts.NORMALIZERS; prompt+response concatenation
and masking match the reference's prepare_sample
(scripts/prepare_alpaca.py:103-124).

Downloading is left to scripts/download.py (network-gated); this tool works
from a local file.
"""

from __future__ import annotations

import csv as csv_mod
import json
from pathlib import Path
from typing import List

import numpy as np

from ..data.lm_datasets import IGNORE_INDEX
from ..data.prompts import NORMALIZERS, STYLES
from ..models.tokenizer import Tokenizer


def load_records(path: Path) -> List[dict]:
    path = Path(path)
    if path.suffix == ".json":
        with open(path, encoding="utf-8") as f:
            return json.load(f)
    if path.suffix == ".jsonl":
        with open(path, encoding="utf-8") as f:
            return [json.loads(line) for line in f if line.strip()]
    if path.suffix == ".csv":
        with open(path, encoding="utf-8", newline="") as f:
            return list(csv_mod.DictReader(f))
    raise ValueError(f"unsupported dataset file {path}")


def prepare_example(
    example: dict,
    tokenizer: Tokenizer,
    max_seq_length: int,
    mask_inputs: bool = True,
    style: str = "alpaca",
) -> dict:
    """Tokenize one record; prompt tokens get ignore_index labels
    (ref prepare_alpaca.py prepare_sample). The response is appended with no
    separator, exactly as the reference concatenates
    (prepare_alpaca.py:121)."""
    full_prompt = STYLES[style](example)
    full = full_prompt + example.get("output", "")
    enc_prompt = tokenizer.encode(full_prompt, max_length=max_seq_length)
    enc_full = tokenizer.encode(full, eos=True, max_length=max_seq_length)
    labels = enc_full.copy().astype(np.int64)
    if mask_inputs:
        labels[: len(enc_prompt)] = IGNORE_INDEX
    return {"input_ids": enc_full.astype(np.int64), "labels": labels}


def prepare(
    data_file: Path,
    checkpoint_dir: Path,
    destination_path: Path = Path("data/alpaca"),
    test_split_fraction: float = 0.04,
    max_seq_length: int = 512,
    mask_inputs: bool = True,
    style: str = "alpaca",
    seed: int = 42,
    include_multiturn: bool = False,
) -> None:
    """``include_multiturn``: lima style only — emit every (question, answer)
    pair of a conversation instead of just the first
    (ref prepare_lima.py:105-116)."""
    destination_path = Path(destination_path)
    destination_path.mkdir(parents=True, exist_ok=True)
    tokenizer = Tokenizer(Path(checkpoint_dir))
    normalize = NORMALIZERS.get(style, lambda r: [r])
    kw = {"include_multiturn": include_multiturn} if style == "lima" else {}
    records = [ex for r in load_records(data_file) for ex in normalize(r, **kw)]

    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(records))
    n_test = int(len(records) * test_split_fraction)
    splits = {
        "test": [records[i] for i in perm[:n_test]],
        "train": [records[i] for i in perm[n_test:]],
    }
    for split, recs in splits.items():
        examples = [
            prepare_example(r, tokenizer, max_seq_length, mask_inputs, style) for r in recs
        ]
        out = destination_path / f"{split}.npz"
        np.savez_compressed(out, examples=np.asarray(examples, dtype=object))
        print(f"{split}: {len(examples)} examples -> {out}")


def main() -> None:
    from ..utils.cli import CLI

    CLI(prepare)


if __name__ == "__main__":
    main()
