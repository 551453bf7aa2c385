"""Round-5 interleaved MFU record at the headline shapes.

Arms (all flash2 attention, the r04 default):
  full           remat=full — the r04-record configuration
  dots_attn6     remat=dots_attn@6:full — 6 layers save matmul outputs AND
                 the flash2 attention residuals; the rest full-remat
  attn           remat=attn (save attention residuals everywhere)

Protocol: same as tools/mfu_campaign_r04.py — N alternating rounds in one
process; same-round ratios are the drift-immune comparison (this chip's
window drift reaches 1.45x for identical executables; measured again r05:
the r04-record config read 0.345 MFU in the r05 window vs its 0.494
committed median).

  python tools/mfu_campaign_r05.py --pairs 6 [--shape 16x1024]
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import pathlib

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

ARMS = {
    "full": {"remat": "full"},
    "dots_attn6": {"remat": "dots_attn@6:full"},
    "attn": {"remat": "attn"},
    "chunk512": {"remat": "full", "lm_head_chunk": 512},
    "unroll2": {"remat": "full", "unroll": 2},
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=6)
    ap.add_argument("--shape", default="16x1024")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--arms", default="full,dots_attn6,attn")
    args = ap.parse_args()
    mb, sl = (int(x) for x in args.shape.split("x"))

    from fastmax_tpu.training import bench_mfu

    arms = args.arms.split(",")
    by_arm: dict = {a: [] for a in arms}
    rounds: list = []
    for rnd in range(args.pairs):
        this_round = {}
        for arm in arms:
            try:
                out = bench_mfu.run(
                    model_name="tiny-llama-1.1b", seq_len=sl, micro_batch=mb,
                    iters=args.iters, **ARMS[arm])
            except Exception as e:  # noqa: BLE001
                out = {"error": f"{type(e).__name__}: {e}"[:200]}
            out.update(tag=arm, round=rnd, shape=f"bs{mb}x{sl}")
            print(json.dumps(out), flush=True)
            if "mfu" in out:
                by_arm[arm].append(out["mfu"])
                this_round[arm] = out["mfu"]
        rounds.append(this_round)

    base = arms[0]
    for arm in arms:
        vals = by_arm[arm]
        summary = {
            "summary": arm, "shape": f"bs{mb}x{sl}", "n": len(vals),
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
