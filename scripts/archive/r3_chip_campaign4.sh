#!/bin/bash
# Round-3 chip chain, part 4 — continuation of part 3 after the round-3
# session ended mid-queue (see ROUND3.md "round-4 queue").
#
# State at launch (from _campaigns/r3):
#   done   : windowed base s42/43/44 (c2), deformable teacher s42 TRAINED
#            (checkpoint_9) but its val eval was killed mid-submit, so the
#            metrics row is missing; part-3's lever runs all failed on the
#            missing-teacher assert (raced the teacher's completion).
#   absent : every lever row, every w256 row.
#
# Ordering vs part 3: seed-major ACROSS GROUPS.  One seed of every
# north-star lever group (levers, w256 pair, hybrid_transplant,
# sharedcpb/warmup) lands before any group gets its second seed — at
# ~40-75 min/run a tail group would otherwise never launch (part 3's
# lever-major tail starved w256 entirely).  Paired same-seed deltas vs the
# c2 windowed base (s42/43/44 all present) stay resolvable at n=1-2.
#
# RULE while this runs: NOTHING else CPU-heavy on this box — no pytest,
# no dryruns, no benches (campaign steps are host-bound through the relay).
set -u
cd /root/repo
W=/root/repo/_campaigns/r3
LOGS=$W/logs
mkdir -p "$LOGS"

# stop LAUNCHING new runs at 11:20 UTC; kill anything still running 11:50
export FLAGSHIP_EVAL_DEADLINE=${FLAGSHIP_EVAL_DEADLINE:-1787052000}
export FLAGSHIP_EVAL_HARD_STOP=${FLAGSHIP_EVAL_HARD_STOP:-1787053800}
echo "deadline: $FLAGSHIP_EVAL_DEADLINE ($(date -d @$FLAGSHIP_EVAL_DEADLINE))"
echo "hardstop: $FLAGSHIP_EVAL_HARD_STOP ($(date -d @$FLAGSHIP_EVAL_HARD_STOP))"

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
# seed 42 of everything first
run teacher2b  $FE deformable 42
run levers42   $FE windowed_transplant,windowed_distill,windowed_transplant_distill 42
run w256_42    $FE deformable_w256,windowed_w256 42
run hybrid42   $FE hybrid_transplant 42
run knobs42    $FE windowed_sharedcpb,windowed_warmup 42
# second seed
run levers43   $FE windowed_transplant,windowed_distill,windowed_transplant_distill 43
run w256_43    $FE deformable_w256,windowed_w256 43
run knobs43    $FE windowed_sharedcpb,windowed_warmup 43
# depth-at-width question + third seeds, in case time remains
run w256pre6   $FE windowed_w256_pre6 42
run levers44   $FE windowed_transplant,windowed_distill,windowed_transplant_distill 44
run hybrid43   $FE hybrid_transplant 43,44
run knobs44    $FE windowed_sharedcpb,windowed_warmup 44
run w256_44    $FE deformable_w256,windowed_w256 44
echo "=== ALL DONE ($(date -u +%H:%M:%S)) ==="
