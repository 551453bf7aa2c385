#!/bin/bash
# Process-per-config fastmax A/B (crash isolation: a TPU worker fault kills
# the client for the whole process, so interleaved in-process runs die in
# sympathy). FASTMAX_TPU_FASTMAX_IMPL is read at import time per process.
cd /root/repo
LOG=bench_results/fastmax_ab_r03.jsonl
for impl in scan pallas scan pallas; do
  echo "### $impl" >> "$LOG"
  FASTMAX_TPU_FASTMAX_IMPL=$impl timeout 2000 python -m fastmax_tpu.training.bench_mfu \
    --model_name tiny-llama-1.1b --micro_batch 16 --seq_len 1024 --iters 8 \
    --attn_alg fastmax --remat full 2>>bench_results/fastmax_ab_r03.err | tail -1 >> "$LOG"
done
