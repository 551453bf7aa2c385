#!/usr/bin/env bash
# Download + convert a checkpoint (reference download_*.sh).
set -euo pipefail
REPO=${1:?hf repo id, e.g. EleutherAI/pythia-160m}
python -m fastmax_tpu.scripts.download --repo_id "$REPO" --convert true
