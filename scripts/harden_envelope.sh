#!/usr/bin/env bash
# Robust-trunk campaign (VERDICT r4 item 1): produce a fly checkpoint
# whose argmax positions survive the held-out robustness probes
# (bench.load_probe_frames: ±2 px shift, ±5% gain, jpeg-q90, video
# re-encode) with clean parity inside the score-head calibrator's
# repair region (pts<=0.03, conf<=0.05) — calibration then restores the
# exact golden contract (scripts/calibrate_score_head.py).
#
# Route: train FROM SCRATCH with per-step random shift/gain augmentation
# (TrainConfig.shift_aug / gain_aug) through the full recipe — phase 1
# BN training + the freeze-BN anneal ladder — so translation/gain
# equivariance is baked into the solution from step 1.  The previous
# route (fine-tune the memorized parity seed on fixed augmentation
# pools) was measured fatal twice: r5a (12k steps, clean pts pinned at
# 0.07-0.5 while the ±4 px envelope never dropped below ~19x bound) and
# r3 (conf gate no-op).  A memorized minimum has no nearby equivariant
# neighbour; a fresh random shift every step admits ONLY equivariant
# solutions, and the conv score head preserves that equivariance through
# calibration.
set -euo pipefail
cd "$(dirname "$0")/.."

OUT=weights/hourglass_fly_hardened.npz
AUG="--shift-aug 2 --gain-aug 0.05"

# phase 1: BN training from scratch, augmentation on from the first step
python scripts/train_fly_weights.py --steps 16000 $AUG --out "$OUT"
echo "=== PHASE R1 (scratch) DONE ==="
# freeze-BN anneal ladder (the round-2 parity recipe), augmentation kept
# on so keep-best can never drift back to a memorized solution
python scripts/train_fly_weights.py --resume --freeze-bn $AUG \
    --lr 1e-3 --mse-weight 0.2 --steps 6000 --out "$OUT"
echo "=== PHASE R2 DONE ==="
python scripts/train_fly_weights.py --resume --freeze-bn $AUG \
    --lr 3e-4 --mse-weight 0.1 --noise 0.004 --steps 6000 --out "$OUT"
echo "=== PHASE R3 DONE ==="
python scripts/train_fly_weights.py --resume --freeze-bn $AUG \
    --lr 1e-4 --mse-weight 0.05 --noise 0.002 --peak-weight 200 \
    --steps 8000 --out "$OUT"
echo "=== PHASE R4 DONE ==="
