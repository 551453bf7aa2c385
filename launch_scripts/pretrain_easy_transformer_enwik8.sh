#!/usr/bin/env bash
# The fork's from-scratch fastmax pretraining run
# (training_scripts/pretrain_fastmax_transformer_enwik8.sh):
# easy-transformer-fastmax = 16-layer 512-wide byte-level model with
# degree-2 polynomial linear attention.
set -euo pipefail
DATA=${1:?path to enwik8 (raw or .gz)}
ALG=${2:-fastmax_cuda}
python -m fastmax_tpu.training.pretrain \
  --model_name easy-transformer-fastmax --attn_alg "$ALG" \
  --data_format enwik8 --io.train_data_dir "$DATA" \
  --train.micro_batch_size 8 --train.global_batch_size 32 \
  --train.max_iters 100000 --train.learning_rate 6e-4 \
  --logger_name csv --io.out_dir out/easy_fastmax_enwik8
