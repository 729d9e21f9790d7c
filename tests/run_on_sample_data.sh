#!/usr/bin/env bash
# Smoke test on the bundled 7-camera recording (the analog of the
# reference's tests/run_df3d_on_sample_data.sh): full pipeline + videos.
# Output defaults to a fresh temp folder so the default <input>_df3d
# location (tests/data/reference_df3d — the golden-artifact directory!)
# is never written to; pass your own --output-folder to override.
set -euo pipefail
cd "$(dirname "$0")/.."
OUT="$(mktemp -d /tmp/df3d_smoke.XXXX)"
echo "writing results to $OUT"
python -m deepfly3d_tpu.cli tests/data/reference -v \
    --checkpoint weights/hourglass_fly.npz \
    --output-folder "$OUT" \
    --video-2d --video-3d --output-fps 5 "$@"
