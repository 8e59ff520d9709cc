#!/bin/bash
# Round-3 chip chain, part 5 — FULL RESTART of the lever campaign.
#
# Why a restart: the VM refresh between sessions wiped the gitignored
# campaign workdir (_campaigns/r3 — teacher + base checkpoints, partial
# lever runs) AND the persistent compile cache, despite the persistence
# assumption in CLAUDE.md.  Everything gitignored must be treated as
# ephemeral across rounds; committed reports/ JSON is the only durable
# quality record.
#
# Two changes vs part 4:
#   1. Fresh workdir _campaigns/r3c.  Lever rows pair against windowed base
#      rows retrained IN THIS CAMPAIGN (same-campaign pairing rule,
#      QUALITY.md replication note) — the c2 bases are gone anyway.
#   2. Eval runs the 8 val sequences as 8 batched lanes (SUBMIT_BATCH: 8 in
#      tools/flagship_eval.py base_config) — sequential eval was ~17 min of
#      every ~40-min run, relay-latency-bound; lockstep lanes amortize it.
#
# Ordering: seed-major ACROSS groups (part-3 lesson: lever-major starves
# tail groups entirely at ~25-50 min/run).  Teacher first (levers need its
# checkpoint), then the pairing base, then levers, then width rows.
#
# RULE while this runs: NOTHING else CPU-heavy on this box — no pytest,
# no dryruns, no benches (campaign steps are host-bound through the relay).
set -u
cd /root/repo
W=/root/repo/_campaigns/r3c
LOGS=$W/logs
mkdir -p "$LOGS"

# stop LAUNCHING new runs at 12:10 UTC; kill anything still running 12:40
export FLAGSHIP_EVAL_DEADLINE=${FLAGSHIP_EVAL_DEADLINE:-1787055000}
export FLAGSHIP_EVAL_HARD_STOP=${FLAGSHIP_EVAL_HARD_STOP:-1787056800}
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
  python tools/quality_report.py $W reports/quality_v2_c3.json \
    >"$LOGS/report.log" 2>&1
}

FE="python tools/flagship_eval.py $W 10"
# seed 42 of everything first: teacher -> pairing base -> levers -> width
run teacher42  $FE deformable 42
run base42     $FE windowed 42
run levers42   $FE windowed_transplant,windowed_distill,windowed_transplant_distill 42
run knobs42    $FE windowed_sharedcpb,windowed_warmup 42
run w256_42    $FE deformable_w256,windowed_w256 42
# second seed (teacher stays the s42 checkpoint by design — the lever is
# "init/distill from A trained teacher", not "from a same-seed teacher")
run base43     $FE windowed 43
run levers43   $FE windowed_transplant,windowed_distill,windowed_transplant_distill 43
run knobs43    $FE windowed_sharedcpb,windowed_warmup 43
run w256_43    $FE deformable_w256,windowed_w256 43
# third seed + stretch rows, in case time remains
run base44     $FE windowed 44
run levers44   $FE windowed_transplant,windowed_distill,windowed_transplant_distill 44
run hybrid42   $FE hybrid,hybrid_transplant 42
run w256pre6   $FE windowed_w256_pre6 42
run knobs44    $FE windowed_sharedcpb,windowed_warmup 44
run w256_44    $FE deformable_w256,windowed_w256 44
echo "=== ALL DONE ($(date -u +%H:%M:%S)) ==="
