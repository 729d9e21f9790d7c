#!/usr/bin/env bash
# Smoke test on the bundled 7-camera recording (the analog of the
# reference's tests/run_df3d_on_sample_data.sh): full pipeline + videos.
set -euo pipefail
cd "$(dirname "$0")/.."
python -m deepfly3d_tpu.cli tests/data/reference -v \
    --checkpoint weights/hourglass_fly.npz \
    --video-2d --video-3d --output-fps 5 "$@"
