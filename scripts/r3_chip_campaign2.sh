#!/bin/bash
# Round-3 chip chain, part 2 (reordered continuation of r3_chip_campaign.sh).
# Waits for the in-flight windowed_base run to release the chip, then runs
# the remaining quality campaigns with the north-star levers FIRST:
#   transplant (#2) -> distill (#4) -> transplant+distill combo ->
#   deployment-width w256 (#3) -> sharedcpb (#8) -> warmup -> hybrid rows.
# flagship_eval skips completed (variant, seed) pairs, so this resumes.
# A quality_report aggregate is refreshed after every stage so partial
# evidence is never lost to the deadline.
set -u
cd /root/repo
W=/root/repo/_campaigns/r3
LOGS=$W/logs
mkdir -p "$LOGS"

# same launch deadline as part 1: Aug 18 05:09:17 UTC
export FLAGSHIP_EVAL_DEADLINE=${FLAGSHIP_EVAL_DEADLINE:-1787029757}
echo "deadline: $FLAGSHIP_EVAL_DEADLINE ($(date -d @$FLAGSHIP_EVAL_DEADLINE))"

# wait for part 1's in-flight windowed_base (orphaned child) to finish
while pgrep -x timeout >/dev/null 2>&1 || [ -e /proc/3565 ]; do
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
run windowed_tail  $FE windowed 43,44
run transplant     $FE windowed_transplant 42,43,44
run distill        $FE windowed_distill 42,43,44
run combo          $FE windowed_transplant_distill 42,43,44
run w256           $FE deformable_w256,windowed_w256 42,43,44
run sharedcpb      $FE windowed_sharedcpb 42,43,44
run warmup         $FE windowed_warmup 42,43,44
run hybrid_rows    $FE hybrid,hybrid_transplant 42,43,44
echo "=== ALL DONE ($(date -u +%H:%M:%S)) ==="
