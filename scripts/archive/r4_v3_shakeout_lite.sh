#!/bin/bash
# Proxy-v3 shakeout LITE (session 9 tail): the full 3-variant 10-epoch
# shakeout (scripts/r4_v3_shakeout.sh) never got chip time this round, so
# this squeezes the plumbing half of its purpose into a short window:
# ONE windowed run at 4 epochs on the v3 world — validates end-to-end on
# the TPU that v3 data generates/trains/evals through the real engines
# and that HOTA lands non-degenerate.  The quality half (v3 noise bar,
# transplant sign) is round 5's first campaign stage (r5_chip_campaign.sh
# core42).
set -u
cd /root/repo
W=/root/repo/_campaigns/r4v3lite
LOGS=$W/logs
mkdir -p "$LOGS"
export PROXY_VERSION=3
NOW=$(date +%s)
export FLAGSHIP_EVAL_DEADLINE=${FLAGSHIP_EVAL_DEADLINE:-$((NOW + 300))}
export FLAGSHIP_EVAL_HARD_STOP=${FLAGSHIP_EVAL_HARD_STOP:-$((NOW + 1500))}
echo "=== v3 lite shakeout: windowed 4ep s42 ($(date -u +%H:%M:%S)) ==="
timeout 1500 python tools/flagship_eval.py "$W" 4 windowed 42 \
    >"$LOGS/lite42.log" 2>&1
echo "=== rc=$? ($(date -u +%H:%M:%S)) ==="
python tools/quality_report.py "$W" reports/quality_v3_lite.json \
    >"$LOGS/report.log" 2>&1
echo "=== DONE ($(date -u +%H:%M:%S)): $(cat reports/quality_v3_lite.json 2>/dev/null | head -c 400)"
