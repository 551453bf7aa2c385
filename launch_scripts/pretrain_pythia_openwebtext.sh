#!/usr/bin/env bash
# pythia-14m on an openwebtext-style memmap (reference pretrain_*openwebtext).
set -euo pipefail
DATA=${1:?dir with train.bin/val.bin}
ALG=${2:-quadratic}
python -m fastmax_tpu.training.pretrain \
  --model_name pythia-14m --attn_alg "$ALG" \
  --data_format openwebtext --io.train_data_dir "$DATA" \
  --train.micro_batch_size 16 --train.global_batch_size 64 \
  --train.max_iters 60000 --train.learning_rate 6e-4 \
  --io.out_dir "out/pythia14m_${ALG}"
