#!/usr/bin/env bash
# Multi-host QLoRA finetune on a TPU pod slice — the counterpart of the
# reference's finetune_QLoRA_linearmax-multinode.sh (srun over 2 nodes x 8
# GPUs). On TPU, SPMD means the SAME command runs on every host of the
# slice; jax initializes the DCN mesh from the TPU metadata — no rank
# plumbing. The (data, fsdp) mesh shards the batch across hosts and the
# params across the slice's chips.
# Usage (from a workstation):
#   gcloud compute tpus tpu-vm ssh $TPU_NAME --worker=all \
#     --command="cd fastmax_tpu && ./launch_scripts/finetune_qlora_multinode.sh CKPT DATA"
set -euo pipefail
CKPT=${1:?checkpoint_dir}
DATA=${2:?train data}
ALG=${3:-linearmax}
NCHIPS=$(python -c 'import jax; print(jax.device_count())')
python -m fastmax_tpu.training.finetune \
  --method lora --quantize bnb.nf4 --attn_alg "$ALG" \
  --checkpoint_dir "$CKPT" --data_path "$DATA" \
  --dp 1 --fsdp "$NCHIPS" \
  --lora_r 8 --lora_alpha 16 --lora_query true --lora_value true \
  --precision bfloat16 \
  --train.micro_batch_size 2 --train.global_batch_size 128 \
  --train.max_iters 1000 --train.learning_rate 3e-4 \
  --train.max_seq_length 512 \
  --io.out_dir "out/qlora_${ALG}_multinode"
