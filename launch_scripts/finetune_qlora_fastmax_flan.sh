#!/usr/bin/env bash
# QLoRA finetune: Llama-2-7B on flan with attn_alg=fastmax
# (reference training_scripts/finetune_QLoRA_*.sh matrix entry).
# Usage: ./finetune_qlora_fastmax_flan.sh <checkpoint_dir> <flan_data.npz>
set -euo pipefail
exec "$(dirname "$0")/finetune_qlora.sh" "${1:?checkpoint_dir}" "${2:?data}" fastmax bnb.nf4
