#!/bin/bash
# Round-4 chip campaign — the full lever queue at the standing 10-epoch
# protocol, ready to launch at round-4 session start (campaign first,
# frozen-window work while it runs; CLAUDE.md round-3 ops).
#
# Prereqs the launcher must set per session:
#   FLAGSHIP_EVAL_DEADLINE   epoch secs — stop LAUNCHING new runs
#   FLAGSHIP_EVAL_HARD_STOP  epoch secs — kill anything still running
# (Defaults below assume a ~3h window; shrink for ~1h sessions.)
#
# Notes:
# - Fresh workdir per round (gitignored state does not survive a round
#   boundary); rows pair ONLY against same-campaign bases.
# - All rows run under the post-fix training dynamics (session-3
#   zero_frozen_grads) — c4 (6ep, scripts/r3_chip_campaign6b.sh) was the
#   first post-fix evidence; this campaign is the full 10ep replication.
# - Seed-major ACROSS groups (lever-major starves tail groups).
# - RULE while this runs: NOTHING else CPU-heavy on this box.
set -u
cd /root/repo
W=/root/repo/_campaigns/r4
LOGS=$W/logs
mkdir -p "$LOGS"
REPORT=reports/quality_v2_r4.json

NOW=$(date +%s)
export FLAGSHIP_EVAL_DEADLINE=${FLAGSHIP_EVAL_DEADLINE:-$((NOW + 9000))}
export FLAGSHIP_EVAL_HARD_STOP=${FLAGSHIP_EVAL_HARD_STOP:-$((NOW + 10200))}
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
  python tools/quality_report.py $W $REPORT >"$LOGS/report.log" 2>&1
}

FE="python tools/flagship_eval.py $W 10"
# seed 42 of everything: teacher -> base -> headline levers -> knobs -> width
run teacher42    $FE deformable 42
run base42       $FE windowed 42
run levers42     $FE windowed_transplant,windowed_distill,windowed_transplant_distill 42
run knobs42      $FE windowed_sharedcpb,windowed_warmup 42
run w256_42      $FE deformable_w256,windowed_w256 42
run w256pre6_42  $FE windowed_w256_pre6 42
# seed replicates (teacher stays the s42 checkpoint by design)
run base43       $FE windowed 43
run levers43     $FE windowed_transplant,windowed_distill,windowed_transplant_distill 43
run base44       $FE windowed 44
run levers44     $FE windowed_transplant,windowed_distill,windowed_transplant_distill 44
run knobs43      $FE windowed_sharedcpb,windowed_warmup 43
run w256_43      $FE deformable_w256,windowed_w256 43
run hybrid42     $FE hybrid,hybrid_transplant 42
run knobs44      $FE windowed_sharedcpb,windowed_warmup 44
run w256_44      $FE deformable_w256,windowed_w256 44
echo "=== ALL DONE ($(date -u +%H:%M:%S)) ==="
