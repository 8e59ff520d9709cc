#!/bin/bash
# Round-4 chain part C — second reorder (session 3).
#
# Why: the w256trans42 stage landed the round's headline row
# (windowed_w256_transplant s42 = 66.8 HOTA, +18.8 paired over the
# from-scratch width base and +6.2 above its own deformable_w256 teacher
# — QUALITY.md round-4 section).  That makes the highest-value remaining
# rows (1) the seed replicate of that headline row, and (2) the NEW
# `windowed_w256_transplant_cpb` variant — the exact shipped-flagship
# candidate (width 256 + shared-CPB + transplant) tying bench.py's shape
# to a quality number 1:1.  Both were starved near the tail of the r4b
# order.  A running chain must be killed and replaced, never edited in
# place (CLAUDE.md); this chain first waits for the in-flight w256_43
# run (PID in /tmp/r4_inflight.pid) to exit — flagship_eval's
# completed-pair skip makes the retained w256_43 stage below a no-op
# safety net if that run completes, and a resume if it was cut.
set -u
cd /root/repo
W=/root/repo/_campaigns/r4
LOGS=$W/logs
mkdir -p "$LOGS"
REPORT=reports/quality_v2_r4.json

export FLAGSHIP_EVAL_DEADLINE=${FLAGSHIP_EVAL_DEADLINE:-1787142300}   # 12:25
export FLAGSHIP_EVAL_HARD_STOP=${FLAGSHIP_EVAL_HARD_STOP:-1787145300} # 13:15
echo "deadline: $FLAGSHIP_EVAL_DEADLINE ($(date -d @$FLAGSHIP_EVAL_DEADLINE))"
echo "hardstop: $FLAGSHIP_EVAL_HARD_STOP ($(date -d @$FLAGSHIP_EVAL_HARD_STOP))"

INFLIGHT=$(cat /tmp/r4_inflight.pid 2>/dev/null || true)
if [ -n "$INFLIGHT" ]; then
  echo "=== waiting for in-flight run (pid $INFLIGHT) ==="
  while kill -0 "$INFLIGHT" 2>/dev/null; do
    if [ "$(date +%s)" -ge "$FLAGSHIP_EVAL_HARD_STOP" ]; then
      echo "=== hard stop while waiting, giving up ==="
      exit 0
    fi
    sleep 20
  done
  sleep 10
fi
cp "$LOGS/msda_bench.log" reports/msda_microbench_r4.txt 2>/dev/null || true

run() {  # run <tag> <cmd...>
  local tag=$1; shift
  local left=$(( ${FLAGSHIP_EVAL_HARD_STOP%.*} - $(date +%s) ))
  if [ "$left" -le 120 ]; then
    echo "=== hard stop reached, skipping $tag ==="
    return
  fi
  echo "=== $tag : $* ($(date -u +%H:%M:%S)) ==="
  timeout "$left" "$@" >"$LOGS/$tag.log" 2>&1
  echo "=== $tag done rc=$? ($(date -u +%H:%M:%S)) ==="
  python tools/quality_report.py $W $REPORT >"$LOGS/report.log" 2>&1
}

FE="python tools/flagship_eval.py $W 10"
run w256trans43    $FE windowed_w256_transplant 43
run w256cpbtrans42 $FE windowed_w256_transplant_cpb 42
run w256_43        $FE deformable_w256,windowed_w256 43
run hybrid42       $FE hybrid,hybrid_transplant 42
run knobs43        $FE windowed_sharedcpb,windowed_warmup 43
run base44         $FE windowed 44
run levers44       $FE windowed_transplant,windowed_distill,windowed_transplant_distill 44
run w256cpbtrans43 $FE windowed_w256_transplant_cpb 43
run knobs44        $FE windowed_sharedcpb,windowed_warmup 44
run w256_44        $FE deformable_w256,windowed_w256 44
echo "=== ALL DONE ($(date -u +%H:%M:%S)) ==="
