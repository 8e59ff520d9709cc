#!/bin/bash
# Round-3 chip chain, part 2 (reordered continuation of r3_chip_campaign.sh).
#
# Part 1's runs were killed by the 3600 s per-run timeout: the single-core
# host was contended (pytest + dryruns), so training crawled and the
# submit/eval phase never finished — the teacher died at epoch 3 and the
# windowed 42/43 runs finished training but not eval.  flagship_eval.py now
# resumes from epoch checkpoints and the timeout is 5400 s; this chain
# salvages the cheap eval-only windowed rows first, then retrains the
# teacher (required by every transplant/distill row), then runs the
# north-star levers before the width/ablation rows.
#
# RULE while this runs (round-2 lesson, re-learned the hard way in round 3):
# NOTHING else CPU-heavy on this box — no pytest, no dryruns, no benches.
set -u
cd /root/repo
W=/root/repo/_campaigns/r3
LOGS=$W/logs
mkdir -p "$LOGS"

# same launch deadline as part 1: Aug 18 05:09:17 UTC
export FLAGSHIP_EVAL_DEADLINE=${FLAGSHIP_EVAL_DEADLINE:-1787029757}
echo "deadline: $FLAGSHIP_EVAL_DEADLINE ($(date -d @$FLAGSHIP_EVAL_DEADLINE))"

# wait for part 1's in-flight windowed run (orphaned child) to release the chip
while [ -e /proc/3565 ]; do
  sleep 30
done
echo "=== chip free, continuing ($(date -u +%H:%M:%S)) ==="

run() {  # run <tag> <cmd...>
  local tag=$1; shift
  echo "=== $tag : $* ($(date -u +%H:%M:%S)) ==="
  timeout 36000 "$@" >"$LOGS/$tag.log" 2>&1
  echo "=== $tag done rc=$? ($(date -u +%H:%M:%S)) ==="
  python tools/quality_report.py $W reports/quality_v2_c2.json \
    >"$LOGS/report.log" 2>&1
}

FE="python tools/flagship_eval.py $W 10"
run windowed_salvage $FE windowed 42,43,44
run teacher2         $FE deformable 42
run transplant       $FE windowed_transplant 42,43,44
run distill          $FE windowed_distill 42,43,44
run combo            $FE windowed_transplant_distill 42,43,44
run w256             $FE deformable_w256,windowed_w256 42,43,44
run sharedcpb        $FE windowed_sharedcpb 42,43,44
run warmup           $FE windowed_warmup 42,43,44
run hybrid_rows      $FE hybrid,hybrid_transplant 42,43,44
echo "=== ALL DONE ($(date -u +%H:%M:%S)) ==="
