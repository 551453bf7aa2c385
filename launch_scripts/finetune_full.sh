#!/usr/bin/env bash
# Full-parameter finetune (reference finetune_full*.sh).
set -euo pipefail
CKPT=${1:?checkpoint_dir}
DATA=${2:?train data}
ALG=${3:-quadratic}
python -m fastmax_tpu.training.finetune \
  --method full --attn_alg "$ALG" \
  --checkpoint_dir "$CKPT" --data_path "$DATA" \
  --precision bfloat16 \
  --train.micro_batch_size 1 --train.global_batch_size 64 \
  --train.max_iters 1000 --train.learning_rate 2e-5 \
  --io.out_dir "out/full_${ALG}"
