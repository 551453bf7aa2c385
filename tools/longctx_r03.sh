#!/bin/bash
cd /root/repo
LOG=bench_results/longctx_r03.jsonl
timeout 3000 python tools/compare_kernels_r03.py --micro_batch 4 --seq_len 4096 \
  --configs flash2,blockwise,flash2 --iters 8 >> "$LOG" 2>>bench_results/longctx_r03.err
for cfg in "2048 8" "4096 4"; do
  set -- $cfg
  echo "### fastmax pallas seq=$1 bs=$2" >> "$LOG"
  FASTMAX_TPU_FASTMAX_IMPL=pallas timeout 2400 python -m fastmax_tpu.training.bench_mfu \
    --model_name tiny-llama-1.1b --micro_batch $2 --seq_len $1 --iters 8 \
    --attn_alg fastmax --remat full 2>>bench_results/longctx_r03.err | tail -1 >> "$LOG"
done
