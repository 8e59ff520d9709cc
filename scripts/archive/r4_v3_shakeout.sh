#!/bin/bash
# Proxy-v3 shakeout (round-4 session 8): one 64-dim core triple on the
# NEW v3 world (uniform appearance, OU/formation motion, birth/death)
# BEFORE round 5 bets a full campaign on it.  Validates end-to-end that
# (a) v3 data generates/trains/evals through the real engines, (b) HOTA
# lands in a usable range (not saturated, not floored), (c) the
# transplant lever's sign is visible on v3.  Runs with the v2-compatible
# shape buckets, so a warm compile cache serves it — launch BEFORE
# landing the staged source edits (which cold-invalidate the cache).
set -u
cd /root/repo
W=/root/repo/_campaigns/r4v3shake
LOGS=$W/logs
mkdir -p "$LOGS"
export PROXY_VERSION=3
NOW=$(date +%s)
export FLAGSHIP_EVAL_DEADLINE=${FLAGSHIP_EVAL_DEADLINE:-$((NOW + 3000))}
export FLAGSHIP_EVAL_HARD_STOP=${FLAGSHIP_EVAL_HARD_STOP:-$((NOW + 5400))}
echo "=== v3 shakeout: deformable,windowed,windowed_transplant s42 ($(date -u +%H:%M:%S)) ==="
timeout 5400 python tools/flagship_eval.py "$W" 10 \
    deformable,windowed,windowed_transplant 42 >"$LOGS/shake42.log" 2>&1
echo "=== rc=$? ($(date -u +%H:%M:%S)) ==="
python tools/quality_report.py "$W" reports/quality_v3_shakeout.json \
    >"$LOGS/report.log" 2>&1
echo "=== DONE ($(date -u +%H:%M:%S)) ==="
