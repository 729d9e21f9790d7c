#!/usr/bin/env bash
# Round-5 TPU queue — the campaign that converts the widened held-out
# probe family (bench.py: reencode, q90, shift±2px, gain±5%) from a bar
# nothing passes into a passed one, then lands the round's artifacts.
#
# Division of labor (measured, round 5):
#   * shift±2px / gain±5% probes — handled by RIG REGISTRATION
#     (ops/canonicalize.py): frames are registered to the calibration
#     session inside the deployed pipeline; exact identity on clean
#     input.  Trunk hardening was tried first and REFUTED: from-scratch
#     robust training (/tmp/r5/03_robust_scratch.log) converged to
#     pts_maxerr 0.40 — it never re-enters the 0.02 golden contract.
#   * reencode / jpeg-q90 / residual-gain probes — handled by
#     probe-robust score-head calibration (--augment-recompress 85,75
#     --augment-gain 1.04): the r4 clean-only calibrations fail exactly
#     these (parity misses the reencode conf band by 2.7% and gain1.05
#     points by 13x — highlight clipping survives the 1/gain correction;
#     p16 blows out on points 5x, docs/BENCH_SESSION_r04a.json +
#     /tmp/r5/verify_bench_probe.log).
#
# STRICTLY serial: one TPU process at a time (a second axon client
# blocks silently), and the host has ONE CPU core — CPU-heavy work
# (pytest, measure_robustness) also starves a running TPU campaign.
#
# Usage:  bash scripts/round5_tpu_queue.sh [start_step]
# Steps (p16 first — it is the headline candidate; if wall clock runs
# out mid-queue the highest-value artifact has already landed):
#   1 calibrate p16    -> weights/hourglass_fly_p16_tpu.npz (the ~2,100
#     fps candidate; probe-gated)
#   2 calibrate parity -> weights/hourglass_fly_tpu.npz   (probe-gated)
#   3 envelopes (CPU) — measure_robustness per checkpoint, deployed+raw
#   4 bench_pallas_v4.py            — settle the v4 kernel with data
#   5 bench_host_pipeline.py        — HOSTBENCH_r05.json artifact
#   6 h36m --full                   — BASELINE config #4 at scale
#   7 bench.py                      — final state = what the driver measures
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

step 1 calibrate_p16    10800 python scripts/calibrate_score_head.py \
    weights/hourglass_fly_p16.npz weights/hourglass_fly_p16_tpu.npz \
    --dtype bfloat16 --augment-recompress 85,75 --augment-gain 1.04 \
    --targets-cache "$LOGDIR/tcache_p16.npz"
step 2 calibrate_parity 10800 python scripts/calibrate_score_head.py \
    weights/hourglass_fly.npz weights/hourglass_fly_tpu.npz \
    --dtype bfloat16 --augment-recompress 85,75 --augment-gain 1.04 \
    --targets-cache "$LOGDIR/tcache_parity.npz"
step 3 envelopes         5400 bash -c '
    for w in weights/hourglass_fly.npz weights/hourglass_fly_tpu.npz \
             weights/hourglass_fly_p16_tpu.npz; do
        [ -f "$w" ] || continue
        DF3D_WEIGHTS="$w" python scripts/measure_robustness.py --write-envelope
        DF3D_WEIGHTS="$w" python scripts/measure_robustness.py --write-envelope --raw
    done'
step 4 pallas_v4         3600 python scripts/bench_pallas_v4.py
step 5 hostbench         3600 python scripts/bench_host_pipeline.py \
    --out HOSTBENCH_r05.json
step 6 h36m_full         3600 python examples/h36m_synthetic.py --full
step 7 bench_final       2400 python bench.py

echo "=== queue done; logs in $LOGDIR ==="
