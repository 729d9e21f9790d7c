#!/usr/bin/env bash
# Round-5 stretch campaign (VERDICT r4 item 7: raise the ceiling itself).
# Runs strictly AFTER scripts/round5_tpu_queue.sh drains (one TPU process
# at a time): waits on the queue PID, then calibrates the p16 student
# under a FULLY bf16 deployment policy — bf16 two-matmul preprocess
# (~57% of pipeline FLOPs at p16 speed when f32) and default-precision
# score head — with the same probe-robust augmentation as the main
# campaign.  bench.py picks the checkpoint up automatically
# (weights/hourglass_fly_p16fast_tpu.npz, T=256 candidate).
#
# Usage: bash scripts/round5_extra.sh [queue_pid]
set -uo pipefail
cd "$(dirname "$0")/.."

LOGDIR=/tmp/r5
mkdir -p "$LOGDIR"

QPID="${1:-$(cat $LOGDIR/queue.pid 2>/dev/null || echo '')}"
if [ -n "$QPID" ]; then
    echo "waiting for queue pid $QPID to exit..."
    while kill -0 "$QPID" 2>/dev/null; do sleep 30; done
fi

if ! timeout 5 bash -c 'echo > /dev/tcp/127.0.0.1/8082' 2>/dev/null; then
    echo "RELAY DEAD — aborting extra campaign" >&2
    exit 2
fi

timeout 10800 python scripts/calibrate_score_head.py \
    weights/hourglass_fly_p16.npz weights/hourglass_fly_p16fast_tpu.npz \
    --dtype bfloat16 --hp-scope none --preprocess-dtype bfloat16 \
    --augment-recompress 85,75 --augment-gain 1.04 \
    --targets-cache "$LOGDIR/tcache_p16fast.npz" \
    > "$LOGDIR/q08_calibrate_p16fast.log" 2>&1
rc=$?
echo "p16fast calibration rc=$rc; tail:"
tail -5 "$LOGDIR/q08_calibrate_p16fast.log"

# re-measure the final ladder only if the new checkpoint landed
if [ -f weights/hourglass_fly_p16fast_tpu.npz ]; then
    timeout 2400 python bench.py > "$LOGDIR/q09_bench_extra.log" 2>&1
    echo "bench rc=$?; tail:"
    tail -3 "$LOGDIR/q09_bench_extra.log"
fi
