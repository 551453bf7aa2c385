#!/bin/bash
# Round-3 MFU sweep: remat policy / optimizer / unroll levers at the
# headline train shape (TinyLlama-1.1B bs16 seq1024, blockwise attention).
cd /root/repo
LOG=bench_results/mfu_sweep_r03.jsonl
run() {
  echo "### $*" >&2
  timeout 2000 python -m fastmax_tpu.training.bench_mfu \
    --model_name tiny-llama-1.1b --micro_batch 16 --seq_len 1024 --iters 10 "$@" \
    2>>bench_results/mfu_sweep_r03.err | tail -1 >> "$LOG"
  echo "rc=$? after $*" >&2
}
run --remat full
run --remat attn
run --remat dots
run --remat attn --optimizer adamw8bit
run --remat attn --unroll 2
