#!/bin/bash
# Round-3 chip job chain: benches first (cheap, round-3 evidence), then the
# quality campaigns in VERDICT-priority order.  One chip; everything
# sequential.  Each flagship_eval invocation skips already-completed
# (variant, seed) pairs, so re-running this script resumes where it left off.
#
# Priority order (VERDICT.md round-3 items):
#   e2e streaming bench (#7), hybrid FPS (#5),
#   teacher + windowed base (pairing) -> transplant (#2) -> distill (#4)
#   -> deployment-width head-to-head (#3) -> sharedcpb (#8) / warmup
#   -> hybrid + hybrid_transplant -> transplant+distill combo.
set -u
cd /root/repo
W=/root/repo/_campaigns/r3
LOGS=$W/logs
mkdir -p "$LOGS"

# stop LAUNCHING new runs 9.5h from now: leaves margin for the round-end bench
export FLAGSHIP_EVAL_DEADLINE=$(( $(date +%s) + 34200 ))
echo "deadline: $FLAGSHIP_EVAL_DEADLINE ($(date -d @$FLAGSHIP_EVAL_DEADLINE))"

run() {  # run <tag> <cmd...>
  local tag=$1; shift
  echo "=== $tag : $* ($(date -u +%H:%M:%S)) ==="
  timeout 36000 "$@" >"$LOGS/$tag.log" 2>&1
  echo "=== $tag done rc=$? ($(date -u +%H:%M:%S)) ==="
}

run e2e            python bench.py e2e
BENCH_ENCODER=hybrid BENCH_LAYERS=3 run bench_hybrid3 python bench.py flagship

FE="python tools/flagship_eval.py $W 10"
run teacher        $FE deformable 42
run windowed_base  $FE windowed 42,43,44
run transplant     $FE windowed_transplant 42,43,44
run distill        $FE windowed_distill 42,43,44
run w256           $FE deformable_w256,windowed_w256 42,43,44
run sharedcpb      $FE windowed_sharedcpb 42,43,44
run warmup         $FE windowed_warmup 42,43,44
run hybrid_rows    $FE hybrid,hybrid_transplant 42,43,44
run combo          $FE windowed_transplant_distill 42,43,44

python tools/quality_report.py $W reports/quality_v2_c2.json \
  > "$LOGS/report.log" 2>&1
echo "=== ALL DONE ($(date -u +%H:%M:%S)) ==="
