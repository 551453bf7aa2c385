"""Accuracy-delta table across quantization modes (the BASELINE north-star
"lm-eval accuracy delta at matched bit-width" axis, measured offline).

Evaluates ONE trained model under every serving representation the engine
supports and reports perplexity + multiple-choice accuracy deltas against
the unquantized baseline:

  fp32 (baseline) | bnb.nf4 | bnb.nf4-dq | nf4->int8 (the engine's "auto"
  serving re-representation measured by bench.py) | bnb.int8 | gptq.int4

The model is a byte-level GPT trained in-image on the Python-source corpus
(tools/make_code_corpus.py) — no network egress, so no pretrained weights;
what matters here is the DELTA between representations on a genuinely
trained model, the quantity the reference's tutorials publish for bnb modes
(tutorials/quantize.md) and that bench.py's headline metric leans on.

Usage:
  python tools/make_code_corpus.py --out eval_assets --mb 8
  python -m fastmax_tpu.training.pretrain --model_name easy-transformer \
      --data_format enwik8 --io.train_data_dir eval_assets/corpus.txt ...
  python tools/accuracy_delta.py --ckpt out/.../step-N --assets eval_assets
"""

from __future__ import annotations

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import json
from pathlib import Path

import numpy as np


class ByteTokenizer:
    """Byte-level tokenizer for the in-image corpus model (duck-typed to
    the models.tokenizer.Tokenizer surface FastmaxLM uses)."""

    eos_id = 0
    bos_id = None

    def encode(self, s: str, bos: bool = False, eos: bool = False):
        import jax.numpy as jnp

        ids = np.frombuffer(s.encode("ascii", "replace"), np.uint8).astype(np.int32)
        return jnp.asarray(ids)

    def decode(self, tokens) -> str:
        return bytes(np.asarray(tokens, np.uint8)).decode("ascii", "replace")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="orbax train-state dir")
    ap.add_argument("--assets", default="eval_assets")
    ap.add_argument("--model_name", default="easy-transformer")
    ap.add_argument(
        "--modes",
        default="fp32,bnb.nf4,bnb.nf4-dq,nf4-int8,nf4-int4,nf4-int4-block,"
                "bnb.int8,gptq.int4",
    )
    ap.add_argument("--ppl_bytes", type=int, default=65536)
    ap.add_argument("--seq_len", type=int, default=512)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from fastmax_tpu.models.config import Config
    from fastmax_tpu.eval.harness import (
        FastmaxLM, multiple_choice_accuracy, perplexity_on_tokens)
    from fastmax_tpu.ops import quant

    cfg = Config.from_name(args.model_name)
    cfg.vocab_size = 256
    cfg.padded_vocab_size = max(cfg.padded_vocab_size, 256)
    ckpt = Path(args.ckpt)
    if (ckpt / "lit_config.json").exists() or (ckpt / "model").exists():
        # deploy-format checkpoint (per-tensor npy, training/fit.py export)
        from fastmax_tpu.utils.checkpoint import load_model_params

        cfg, params = load_model_params(ckpt, cfg=cfg)
    else:
        restored = ocp.PyTreeCheckpointer().restore(str(ckpt.absolute()))
        params = restored["params"] if "params" in restored else restored
    params = jax.tree.map(lambda a: np.asarray(a, np.float32), params)

    assets = Path(args.assets)
    corpus = assets.joinpath("corpus.txt").read_bytes()
    lo, hi = int(len(corpus) * 0.95), len(corpus)  # TEST split (train never saw)
    test_bytes = np.frombuffer(corpus[lo : lo + args.ppl_bytes], np.uint8)
    task_file = assets / "tasks" / "code_cloze.json"
    tok = ByteTokenizer()

    calib = None
    rows = []
    for mode in args.modes.split(","):
        mode = mode.strip()
        if mode in ("fp32", "bf16", "none"):
            p = jax.tree.map(jnp.asarray, params)
        elif mode == "nf4-int8":
            # what the engine actually serves for NF4 checkpoints in "auto"
            # weights mode (bench.py headline): NF4 -> dequant -> per-channel
            # int8. Measures the re-representation the verdict flagged.
            p = quant.requantize_int8_model(quant.quantize_model(params, "bnb.nf4"))
        elif mode in ("nf4-int4", "nf4-int4-block"):
            # the r04 tiled linear-int4 serving re-representations
            # (weights_mode preload_int4{,_block}): NF4 -> dequant ->
            # signed nibbles with a rank-1 (u x v) or exact per-64-block
            # scale. Gates whether "auto" may serve them.
            scheme = "block" if mode.endswith("block") else "rank1"
            p = quant.requantize_int4_model(
                quant.quantize_model(params, "bnb.nf4"), scheme)
        elif mode == "gptq.int4":
            from fastmax_tpu.ops.gptq import gptq_quantize_model

            if calib is None:
                tr = np.frombuffer(corpus[: args.seq_len * 64], np.uint8)
                calib = tr[: args.seq_len * 8].reshape(8, args.seq_len)
            p = gptq_quantize_model(jax.tree.map(jnp.asarray, params), cfg, calib)
        else:
            p = quant.quantize_model(params, mode)
        lm = FastmaxLM(cfg, p, tok, max_seq_length=args.seq_len, batch_size=32)
        ppl = perplexity_on_tokens(lm, test_bytes, stride=args.seq_len - 1)
        mc = multiple_choice_accuracy(lm, task_file)
        bpb = float(np.log2(ppl))
        se = float(np.sqrt(mc["acc"] * (1 - mc["acc"]) / mc["n"]))  # binomial se
        rows.append((mode, ppl, bpb, mc["acc"], mc["acc_norm"], se, mc["n"]))
        print(f"{mode:12s} ppl={ppl:8.4f} bits/byte={bpb:6.4f} "
              f"acc={mc['acc']:.3f}±{se:.3f} acc_norm={mc['acc_norm']:.3f}",
              flush=True)

    base = rows[0]
    print("\n| mode | byte ppl | bits/byte | cloze acc (±se) | Δacc vs fp32 |")
    print("|---|---|---|---|---|")
    for mode, ppl, bpb, acc, accn, se, n in rows:
        print(f"| {mode} | {ppl:.4f} | {bpb:.4f} | {acc:.3f} ± {se:.3f} "
              f"| {acc - base[3]:+.3f} |")
    out = {m: {"ppl": p_, "bits_per_byte": b, "acc": a, "acc_norm": an,
               "acc_se": s, "n_tasks": n}
           for m, p_, b, a, an, s, n in rows}
    Path("eval_assets/accuracy_delta.json").write_text(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
