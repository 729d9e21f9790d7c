#!/usr/bin/env bash
# Envelope-hardening campaign (VERDICT r3 item 4): widen the parity
# teacher's robustness envelope (+-4 px shift / +-5% gain points parity)
# while keep-best hard-gates on exact clean parity at the seed's level.
#
# Design rationale and the three measured failure modes that shaped the
# flags are in docs/ARCHITECTURE.md ("Envelope hardening").  Augmented
# samples supervise argmax POSITION only; the keep-best floor means a
# failed phase returns the seed, so the output file can never be worse
# than its starting point.  Afterwards, regenerate the deployable
# calibrated checkpoint and re-measure the envelope:
#
#   python scripts/calibrate_score_head.py weights/hourglass_fly_hardened.npz \
#       weights/hourglass_fly_tpu.npz --dtype bfloat16
#   python scripts/measure_robustness.py --write-envelope \
#       --checkpoint weights/hourglass_fly_hardened.npz
set -euo pipefail
cd "$(dirname "$0")/.."

OUT=weights/hourglass_fly_hardened.npz
cp -n weights/hourglass_fly.npz "$OUT" || true

python scripts/train_fly_weights.py --resume --freeze-bn --augment-envelope \
    --shift-aug 2 --lr 1e-4 --mse-weight 0.1 --steps 12000 --out "$OUT"
echo "=== PHASE H1 DONE ==="
python scripts/train_fly_weights.py --resume --freeze-bn --augment-envelope \
    --shift-aug 2 --lr 3e-5 --mse-weight 0.05 --peak-weight 200 --steps 8000 \
    --out "$OUT"
echo "=== PHASE H2 DONE ==="
