#!/usr/bin/env bash
# easy-transformer pretrain on enwik8 with attn_alg=quadratic
# (reference pretrain_fastmax_transformer_enwik8.sh / quadratic twin).
set -euo pipefail
exec "$(dirname "$0")/pretrain_easy_transformer_enwik8.sh" "${1:?data_dir}" quadratic
