#!/usr/bin/env bash
# QLoRA finetune on an instruction dataset with a selectable attention
# algorithm (the reference's finetune_QLoRA_* family).
# Usage: ./finetune_qlora.sh <checkpoint_dir> <data.npz> [attn_alg] [quantize]
set -euo pipefail
CKPT=${1:?checkpoint_dir}
DATA=${2:?train data (npz or reference .pt)}
ALG=${3:-fastmax}
QUANT=${4:-bnb.nf4}

python -m fastmax_tpu.training.finetune \
  --method lora --quantize "$QUANT" --attn_alg "$ALG" \
  --checkpoint_dir "$CKPT" --data_path "$DATA" \
  --lora_r 8 --lora_alpha 16 --lora_query true --lora_value true \
  --precision bfloat16 \
  --train.micro_batch_size 2 --train.global_batch_size 128 \
  --train.max_iters 1000 --train.learning_rate 3e-4 \
  --train.max_seq_length 512 \
  --io.out_dir "out/qlora_${ALG}"
