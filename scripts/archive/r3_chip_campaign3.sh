#!/bin/bash
# Round-3 chip chain, part 3 (replaces the tail of r3_chip_campaign2.sh).
#
# Two changes vs part 2, both driven by remaining-time math:
#
# 1. **Interleave levers by seed instead of replicating each lever first.**
#    Part 2 ran transplant x3 seeds before any distill run; at ~35-40 min
#    per run the distill/combo rows would never launch before the deadline.
#    One complete seed-42 set of every north-star lever (transplant,
#    distill, transplant+distill, and the 256-dim head-to-head pair) beats
#    three seeds of one lever and zero of the others — paired same-seed
#    deltas (tools/quality_report.py) stay resolvable either way.
#
# 2. **Hard stop.**  FLAGSHIP_EVAL_HARD_STOP caps every run's subprocess
#    timeout so nothing can hold the chip into the round-end bench window;
#    a killed training run resumes from its epoch checkpoints next time.
#
# RULE while this runs: NOTHING else CPU-heavy on this box — no pytest,
# no dryruns, no benches (campaign steps are host-bound through the relay).
set -u
cd /root/repo
W=/root/repo/_campaigns/r3
LOGS=$W/logs
mkdir -p "$LOGS"

# stop LAUNCHING new runs at 04:50 UTC; kill anything still running at 05:20
export FLAGSHIP_EVAL_DEADLINE=${FLAGSHIP_EVAL_DEADLINE:-1787028600}
export FLAGSHIP_EVAL_HARD_STOP=${FLAGSHIP_EVAL_HARD_STOP:-1787030400}
echo "deadline: $FLAGSHIP_EVAL_DEADLINE ($(date -d @$FLAGSHIP_EVAL_DEADLINE))"
echo "hardstop: $FLAGSHIP_EVAL_HARD_STOP ($(date -d @$FLAGSHIP_EVAL_HARD_STOP))"

# wait for part 2's in-flight salvage invocation to release the chip
WAIT_PID=${1:-0}
while [ "$WAIT_PID" != "0" ] && [ -e "/proc/$WAIT_PID" ]; do
  sleep 30
done
echo "=== chip free, part 3 ($(date -u +%H:%M:%S)) ==="

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
  python tools/quality_report.py $W reports/quality_v2_c2.json \
    >"$LOGS/report.log" 2>&1
}

FE="python tools/flagship_eval.py $W 10"
run teacher2   $FE deformable 42
run levers42   $FE windowed_transplant,windowed_distill,windowed_transplant_distill 42
run levers43   $FE windowed_transplant,windowed_distill,windowed_transplant_distill 43
run levers44   $FE windowed_transplant,windowed_distill,windowed_transplant_distill 44
run w256_42    $FE deformable_w256,windowed_w256 42
run w256_rest  $FE deformable_w256,windowed_w256 43,44
run sharedcpb  $FE windowed_sharedcpb 42,43,44
run warmup     $FE windowed_warmup 42,43,44
run hybrid_tr  $FE hybrid_transplant 42,43,44
echo "=== ALL DONE ($(date -u +%H:%M:%S)) ==="
