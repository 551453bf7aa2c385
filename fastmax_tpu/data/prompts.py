"""Instruction prompt templates (the generate_prompt functions of the
reference's prepare scripts: scripts/prepare_alpaca.py:133-147 and
scripts/prepare_flan.py:220-228 — the flan style is what finetune/lora.py
imports)."""

from __future__ import annotations


def alpaca_prompt(example: dict) -> str:
    if example.get("input"):
        return (
            "Below is an instruction that describes a task, paired with an input that provides further context. "
            "Write a response that appropriately completes the request.\n\n"
            f"### Instruction:\n{example['instruction']}\n\n### Input:\n{example['input']}\n\n### Response:"
        )
    return (
        "Below is an instruction that describes a task. "
        "Write a response that appropriately completes the request.\n\n"
        f"### Instruction:\n{example['instruction']}\n\n### Response:"
    )


def flan_prompt(example: dict) -> str:
    return (
        "Below is an instruction that describes a task. "
        "Write a response that appropriately completes the request.\n\n"
        f"### Instruction:\n{example['instruction']}\n\n### Response:"
    )


STYLES = {"alpaca": alpaca_prompt, "flan": flan_prompt}
