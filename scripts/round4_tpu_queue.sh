#!/usr/bin/env bash
# Round-4 TPU queue (verify skill "Pending TPU queue") — run the moment
# the axon relay returns.  STRICTLY serial: one TPU process at a time
# (a second client blocks silently; memory tpu-axon-quirks).  Each step
# logs to $LOGDIR and the relay is re-probed between steps so a mid-queue
# outage aborts loudly instead of wedging the next client.
#
# Usage:  bash scripts/round4_tpu_queue.sh [start_step]
# Steps:
#   1 bench.py                      — recapture the headline (BENCH r4 top item)
#   2 calibrate p16 bf16-preprocess — throughput experiment (~60-90 min)
#   3 harden_envelope.sh + recalibrate + measure_robustness (~1-2 h)
#   4 bench_pallas_v4.py            — settle the v4 kernel with data
#   5 bench_host_pipeline.py        — HOSTBENCH_r04.json artifact
#   6 bench.py                      — final state = what the driver measures
set -uo pipefail
cd "$(dirname "$0")/.."

LOGDIR=/tmp/r4_queue
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
    local log="$LOGDIR/$(printf '%02d' "$num")_${name}.log"
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

step 1 bench_recapture   1800 python bench.py
step 2 calibrate_p16_bf16 7200 python scripts/calibrate_score_head.py \
    weights/hourglass_fly_p16.npz /tmp/p16_fast.npz \
    --dtype bfloat16 --hp-scope none --preprocess-dtype bfloat16
step 3 harden_envelope   7200 bash scripts/harden_envelope.sh
step 3 recalibrate_tpu   7200 python scripts/calibrate_score_head.py \
    weights/hourglass_fly_hardened.npz /tmp/hardened_tpu.npz --dtype bfloat16
step 3 envelope_measure  3600 python scripts/measure_robustness.py \
    --write-envelope --checkpoint weights/hourglass_fly_hardened.npz
step 4 pallas_v4         3600 python scripts/bench_pallas_v4.py
step 5 hostbench         3600 python scripts/bench_host_pipeline.py \
    --out HOSTBENCH_r04.json
step 6 bench_final       1800 python bench.py

echo "=== queue done; logs in $LOGDIR ==="
echo "Manual follow-ups: ship /tmp/p16_fast.npz over"
echo "weights/hourglass_fly_p16_tpu.npz ONLY if its held-out probe line"
echo "says PASS and the bench line is faster; same judgment for"
echo "/tmp/hardened_tpu.npz vs weights/hourglass_fly_tpu.npz; then commit"
echo "HOSTBENCH_r04.json + envelope artifacts + doc updates."
