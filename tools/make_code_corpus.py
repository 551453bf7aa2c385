"""Build an offline byte-level text corpus + eval tasks from local Python
sources.

The image has no network egress and no cached pretrained checkpoints, so
the accuracy-delta measurement (BASELINE "lm-eval accuracy delta at matched
bit-width") trains a small byte-level model on REAL text that is present in
the image — the Python standard library and site-packages sources — and
evaluates quantization modes against it:

  * corpus.txt      ~N MB of ASCII .py sources (90/5/5 split consumed by
                    data/lm_datasets.Enwik8Dataset — same loader as enwik8)
  * tasks/code_cloze.json   multiple-choice: given 256 bytes of context,
                    pick the true 64-byte continuation out of 4 (the
                    arc-style {"query", "choices", "gold"} record shape
                    that eval/harness.multiple_choice_accuracy consumes)

Usage:  python tools/make_code_corpus.py --out eval_assets --mb 8
"""

from __future__ import annotations

import argparse
import json
import random
from pathlib import Path

ROOTS = [
    "/opt/venv/lib/python3.12/site-packages",
    "/usr/lib/python3.12",
]


def gather(mb: float) -> bytes:
    budget = int(mb * 2**20)
    chunks, total = [], 0
    files = []
    for root in ROOTS:
        files.extend(sorted(Path(root).rglob("*.py")))
    rng = random.Random(0)
    rng.shuffle(files)
    for f in files:
        try:
            raw = f.read_bytes()
        except OSError:
            continue
        if not raw or len(raw) > 512 * 1024:
            continue
        try:
            raw.decode("ascii")
        except UnicodeDecodeError:
            continue
        chunks.append(raw + b"\n\n")
        total += len(raw) + 2
        if total >= budget:
            break
    return b"".join(chunks)[:budget]


def make_cloze_tasks(val: bytes, n: int, ctx: int = 256, cont: int = 64,
                     seed: int = 1) -> list:
    rng = random.Random(seed)
    records = []
    max_start = len(val) - ctx - cont - 1
    while len(records) < n:
        s = rng.randrange(0, max_start)
        query = val[s : s + ctx].decode("ascii")
        true_cont = val[s + ctx : s + ctx + cont].decode("ascii")
        distractors = []
        while len(distractors) < 3:
            o = rng.randrange(0, max_start)
            if abs(o - s) < ctx + cont:
                continue
            d = val[o + ctx : o + ctx + cont].decode("ascii")
            if d != true_cont:
                distractors.append(d)
        choices = [true_cont] + distractors
        order = list(range(4))
        rng.shuffle(order)
        records.append({
            "query": query,
            "choices": [choices[i] for i in order],
            "gold": order.index(0),
        })
    return records


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="eval_assets")
    ap.add_argument("--mb", type=float, default=8.0)
    ap.add_argument("--n_tasks", type=int, default=200)
    args = ap.parse_args()

    out = Path(args.out)
    (out / "tasks").mkdir(parents=True, exist_ok=True)
    corpus = gather(args.mb)
    (out / "corpus.txt").write_bytes(corpus)
    # the cloze tasks come from the VAL split (bytes 90%..95%) so the model
    # never trained on them
    lo, hi = int(len(corpus) * 0.90), int(len(corpus) * 0.95)
    records = make_cloze_tasks(corpus[lo:hi], args.n_tasks)
    (out / "tasks" / "code_cloze.json").write_text(json.dumps(records))
    print(f"corpus: {len(corpus)/2**20:.1f} MB -> {out}/corpus.txt")
    print(f"tasks : {len(records)} records -> {out}/tasks/code_cloze.json")


if __name__ == "__main__":
    main()
