#!/usr/bin/env bash
# Round-5 TPU queue — the campaign that converts the widened held-out
# probe family (bench.py: reencode, q90, shift±2px, gain±5%) from a bar
# nothing passes into a passed one, then lands the round's artifacts.
#
# STRICTLY serial: one TPU process at a time (a second axon client
# blocks silently), and the host has ONE CPU core — CPU-heavy work
# (pytest, measure_robustness) also starves a running TPU campaign.
#
# Usage:  bash scripts/round5_tpu_queue.sh [start_step]
# Steps:
#   1 harden_envelope.sh            — shift-equivariant parity trunk
#   2 calibrate hardened -> tpu     — deployable probe-clean fast path
#   3 harden + calibrate p16        — the ~2,100 fps candidate
#   4 envelopes (CPU)               — measure_robustness per checkpoint
#   5 bench_pallas_v4.py            — settle the v4 kernel with data
#   6 bench_host_pipeline.py        — HOSTBENCH_r05.json artifact
#   7 h36m --full                   — BASELINE config #4 at scale
#   8 bench.py                      — final state = what the driver measures
set -uo pipefail
cd "$(dirname "$0")/.."

LOGDIR=/tmp/r5
mkdir -p "$LOGDIR"
START="${1:-1}"

relay_ok() {
    timeout 5 bash -c 'echo > /dev/tcp/127.0.0.1/8082' 2>/dev/null
}

step() {  # step <num> <name> <timeout_s> <cmd...>
    local num="$1" name="$2" tmo="$3"; shift 3
    if [ "$num" -lt "$START" ]; then return 0; fi
    if ! relay_ok; then
        echo "RELAY DEAD before step $num ($name) — aborting queue" >&2
        exit 2
    fi
    local log="$LOGDIR/q$(printf '%02d' "$num")_${name}.log"
    echo "=== step $num: $name (timeout ${tmo}s) -> $log ==="
    timeout "$tmo" "$@" >"$log" 2>&1
    local rc=$?
    echo "--- step $num rc=$rc; tail: ---"
    tail -5 "$log"
    if [ "$rc" -ne 0 ]; then
        echo "step $num FAILED (rc=$rc) — queue continues to next step" >&2
    fi
    return 0
}

step 1 harden_parity    12000 bash scripts/harden_envelope.sh
step 2 calibrate_tpu    10800 python scripts/calibrate_score_head.py \
    weights/hourglass_fly_hardened.npz /tmp/hardened_tpu.npz \
    --dtype bfloat16 --augment-recompress 85 75
# manual judgment between steps 2 and 3: ship /tmp/hardened_tpu.npz over
# weights/hourglass_fly_tpu.npz ONLY if its probe line says PASS.
step 3 harden_p16       12000 bash -c '
    cp -n weights/hourglass_fly_p16.npz weights/hourglass_fly_p16_hardened.npz
    python scripts/train_fly_weights.py --resume --freeze-bn \
        --augment-envelope --shift-aug 2 --lr 1e-4 --mse-weight 0.1 \
        --steps 12000 --out weights/hourglass_fly_p16_hardened.npz'
step 3 calibrate_p16    10800 python scripts/calibrate_score_head.py \
    weights/hourglass_fly_p16_hardened.npz /tmp/p16_tpu.npz \
    --dtype bfloat16 --augment-recompress 85 75
step 4 envelopes         3600 bash -c '
    for w in weights/hourglass_fly_hardened.npz weights/hourglass_fly_tpu.npz \
             weights/hourglass_fly_p16_tpu.npz; do
        [ -f "$w" ] && DF3D_WEIGHTS="$w" \
            python scripts/measure_robustness.py --write-envelope
    done'
step 5 pallas_v4         3600 python scripts/bench_pallas_v4.py
step 6 hostbench         3600 python scripts/bench_host_pipeline.py \
    --out HOSTBENCH_r05.json
step 7 h36m_full         3600 python examples/h36m_synthetic.py --full
step 8 bench_final       1800 python bench.py

echo "=== queue done; logs in $LOGDIR ==="
