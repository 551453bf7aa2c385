#!/usr/bin/env bash
# Full finetune with attn_alg=linearmax (reference finetune_full*.sh entries).
set -euo pipefail
exec "$(dirname "$0")/finetune_full.sh" "${1:?checkpoint_dir}" "${2:?data}" linearmax
