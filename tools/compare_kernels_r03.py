"""Same-window kernel comparison: run several train-step configs back to
back in ONE process so the tunneled chip's window-to-window throughput
variance (measured 29% -> 47.5% MFU for the identical executable, r03)
cannot masquerade as a kernel effect. Prints one JSON line per config plus
a repeat of the first config at the end to bound in-window drift.

  python tools/compare_kernels_r03.py --micro_batch 16 --seq_len 1024
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_name", default="tiny-llama-1.1b")
    ap.add_argument("--micro_batch", type=int, default=16)
    ap.add_argument("--seq_len", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--configs", default="blockwise,flash,flash2,drift")
    ap.add_argument("--fastmax", action="store_true",
                    help="also compare fastmax p=2 scan vs pallas")
    args = ap.parse_args()

    import fastmax_tpu.ops.attention as attn_mod
    import fastmax_tpu.ops.fastmax as fm_mod
    from fastmax_tpu.training import bench_mfu

    def run(tag, train_attn=None, attn_alg=None, fastmax_impl=None):
        if train_attn:
            attn_mod.TRAIN_ATTN = train_attn
        if fastmax_impl:
            fm_mod.FASTMAX_IMPL = fastmax_impl
        try:
            out = bench_mfu.run(
                model_name=args.model_name, seq_len=args.seq_len,
                micro_batch=args.micro_batch, iters=args.iters,
                attn_alg=attn_alg, remat="full",
            )
        except Exception as e:  # TPU worker crashes surface as runtime errors
            out = {"error": f"{type(e).__name__}: {e}"[:300]}
        out["tag"] = tag
        print(json.dumps(out), flush=True)

    if args.fastmax:
        for i, impl in enumerate(["scan", "pallas", "scan", "pallas"]):
            run(f"fastmax_{impl}#{i}", attn_alg="fastmax", fastmax_impl=impl)
        return
    for i, name in enumerate(args.configs.split(",")):
        kern = "blockwise" if name == "drift" else name
        run(f"{name}#{i}", train_attn=kern)


if __name__ == "__main__":
    main()
