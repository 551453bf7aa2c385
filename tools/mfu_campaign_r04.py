"""Round-4 evidence-grade MFU campaign (verdict r03 next #2, #5).

Runs N alternating rounds of each kernel arm IN ONE PROCESS (same-window
protocol: the tunneled chip's window drift reaches 1.7x for identical
executables, so only interleaved arms are comparable) and emits:

  - one JSON line per leg (full bench_mfu record + arm/round tags)
  - a summary line per arm: median / min / max MFU over its legs
  - pairwise same-round ratios arm_i/arm_0 with their median

Crash-prone arms (fastmax XLA-scan at large shapes) can be process-isolated
with --isolate: every leg then runs as a `python -m
fastmax_tpu.training.bench_mfu` subprocess (persistent compile cache keeps
this cheap after the first), so one leg's TPU fault cannot kill the
campaign. Alternation across subprocesses still bounds drift — each round
holds one leg of every arm adjacent in time.

  python tools/mfu_campaign_r04.py --arms flash2,blockwise \
      --micro_batch 16 --seq_len 1024 --pairs 10
  python tools/mfu_campaign_r04.py --arms fastmax_scan,fastmax_pallas \
      --micro_batch 16 --seq_len 1024 --pairs 5 --isolate
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import statistics
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

QUAD_ARMS = ("flash2", "flash", "blockwise")
FASTMAX_ARMS = ("fastmax_scan", "fastmax_pallas")
ALG_ARMS = ("performer", "linearmax")


def leg_inprocess(arm: str, args) -> dict:
    import fastmax_tpu.ops.attention as attn_mod
    import fastmax_tpu.ops.fastmax as fm_mod
    from fastmax_tpu.training import bench_mfu

    attn_alg = None
    if arm in QUAD_ARMS:
        attn_mod.TRAIN_ATTN = arm
    elif arm in FASTMAX_ARMS:
        attn_alg = "fastmax"
        fm_mod.FASTMAX_IMPL = arm.split("_", 1)[1]
    elif arm in ALG_ARMS:
        attn_alg = arm
    else:
        raise ValueError(f"unknown arm {arm}")
    try:
        return bench_mfu.run(
            model_name=args.model_name, seq_len=args.seq_len,
            micro_batch=args.micro_batch, iters=args.iters,
            attn_alg=attn_alg, remat=args.remat, accum=args.accum,
            lm_head_chunk=args.lm_head_chunk, unroll=args.unroll,
            optimizer=args.optimizer,
        )
    except Exception as e:  # TPU faults surface as runtime errors
        return {"error": f"{type(e).__name__}: {e}"[:300]}


def leg_subprocess(arm: str, args) -> dict:
    env = dict(os.environ)
    cmd = [sys.executable, "-m", "fastmax_tpu.training.bench_mfu",
           "--model_name", args.model_name, "--seq_len", str(args.seq_len),
           "--micro_batch", str(args.micro_batch), "--iters", str(args.iters),
           "--remat", args.remat, "--accum", str(args.accum),
           "--lm_head_chunk", str(args.lm_head_chunk),
           "--unroll", str(args.unroll), "--optimizer", args.optimizer]
    if arm in QUAD_ARMS:
        env["FASTMAX_TPU_TRAIN_ATTN"] = arm
    elif arm in FASTMAX_ARMS:
        cmd += ["--attn_alg", "fastmax"]
        env["FASTMAX_TPU_FASTMAX_IMPL"] = arm.split("_", 1)[1]
    elif arm in ALG_ARMS:
        cmd += ["--attn_alg", arm]
    else:
        raise ValueError(f"unknown arm {arm}")
    try:
        proc = subprocess.run(cmd, env=env, cwd=REPO, capture_output=True,
                              text=True, timeout=args.leg_timeout)
    except subprocess.TimeoutExpired:
        return {"error": f"timeout after {args.leg_timeout}s"}
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    return {"error": f"rc={proc.returncode}: {proc.stderr[-250:]}"}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_name", default="tiny-llama-1.1b")
    ap.add_argument("--micro_batch", type=int, default=16)
    ap.add_argument("--seq_len", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--pairs", type=int, default=10,
                    help="alternating rounds; each round runs every arm once")
    ap.add_argument("--arms", default="flash2,blockwise")
    ap.add_argument("--remat", default="full")
    ap.add_argument("--accum", type=int, default=1)
    ap.add_argument("--lm_head_chunk", type=int, default=128)
    ap.add_argument("--unroll", type=int, default=1)
    ap.add_argument("--optimizer", default="adamw")
    ap.add_argument("--isolate", action="store_true",
                    help="run every leg in its own subprocess")
    ap.add_argument("--leg_timeout", type=int, default=900)
    args = ap.parse_args()

    arms = args.arms.split(",")
    leg = leg_subprocess if args.isolate else leg_inprocess
    by_arm: dict = {a: [] for a in arms}
    rounds: list = []

    for rnd in range(args.pairs):
        this_round = {}
        for arm in arms:
            out = leg(arm, args)
            out.update(tag=arm, round=rnd,
                       shape=f"bs{args.micro_batch}x{args.seq_len}")
            print(json.dumps(out), flush=True)
            if "mfu" in out:
                by_arm[arm].append(out["mfu"])
                this_round[arm] = out["mfu"]
        rounds.append(this_round)

    base = arms[0]
    for arm in arms:
        vals = by_arm[arm]
        summary = {
            "summary": arm, "shape": f"bs{args.micro_batch}x{args.seq_len}",
            "n": len(vals),
            "median_mfu": round(statistics.median(vals), 4) if vals else None,
            "min_mfu": min(vals) if vals else None,
            "max_mfu": max(vals) if vals else None,
        }
        if arm != base:
            ratios = [r[arm] / r[base] for r in rounds
                      if arm in r and base in r and r[base]]
            summary["same_round_ratio_vs_" + base] = {
                "median": round(statistics.median(ratios), 3) if ratios else None,
                "all": [round(x, 3) for x in ratios],
            }
        print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
