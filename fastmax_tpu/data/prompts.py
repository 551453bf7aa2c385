"""Instruction prompt templates and per-dataset record normalizers.

The reference ships one prepare script per instruction dataset
(scripts/prepare_{alpaca,flan,dolly,lima,longform,csv,booksum}.py); all of
them funnel records into the same {instruction, input, output} shape and
then apply one of two prompt templates (generate_prompt at
prepare_alpaca.py:127-147 / prepare_flan.py:220-228). Here the dataset
differences live in small normalizers (NORMALIZERS) so every dataset runs
through one prepare tool (scripts/prepare_alpaca.py):

* alpaca / longform / csv — records already carry instruction/input/output
  (prepare_longform.py:94-112, prepare_csv.py:109).
* dolly — context->input, response->output (prepare_dolly.py:54-55).
* flan — inputs->instruction, targets->output; flan's template shows the
  task text under "### Instruction:" (prepare_flan.py:208,220-228).
* lima — records are {"conversations": [q, a, q, a, ...]}; the first pair
  becomes one example, or every (q, a) pair with
  ``include_multiturn`` (prepare_lima.py:105-116).
* booksum — chapter->input, summary_text->output with a fixed
  summarization instruction (prepare_booksum.py:104-105,130).
"""

from __future__ import annotations

from typing import Callable, Dict, List


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


# every style renders through one of the two reference templates; the
# dataset-specific part is the record normalization below
STYLES: Dict[str, Callable[[dict], str]] = {
    "alpaca": alpaca_prompt,
    "flan": flan_prompt,
    "dolly": alpaca_prompt,
    "lima": alpaca_prompt,
    "longform": alpaca_prompt,
    "csv": alpaca_prompt,
    "booksum": alpaca_prompt,
}


def _identity(record: dict) -> List[dict]:
    return [record]


def _dolly(record: dict) -> List[dict]:
    return [{
        "instruction": record.get("instruction", ""),
        "input": record.get("context", record.get("input", "")),
        "output": record.get("response", record.get("output", "")),
    }]


def _flan(record: dict) -> List[dict]:
    return [{
        "instruction": record.get("inputs", record.get("instruction", "")),
        "input": "",
        "output": record.get("targets", record.get("output", "")),
    }]


def _lima(record: dict, include_multiturn: bool = False) -> List[dict]:
    convo = record.get("conversations")
    if convo is None:
        return [record]
    if include_multiturn:
        return [
            {"instruction": convo[i], "input": "", "output": convo[i + 1]}
            for i in range(0, len(convo) - 1, 2)
        ]
    return [{"instruction": convo[0], "input": "", "output": convo[1]}]


def _booksum(record: dict) -> List[dict]:
    return [{
        "instruction": "Write a summary for the following text.",
        "input": record.get("chapter", record.get("input", "")),
        "output": record.get("summary_text", record.get("output", "")),
    }]


# style -> record -> list of {instruction, input, output} examples
NORMALIZERS: Dict[str, Callable[..., List[dict]]] = {
    "alpaca": _identity,
    "longform": _identity,
    "csv": _identity,
    "dolly": _dolly,
    "flan": _flan,
    "lima": _lima,
    "booksum": _booksum,
}
