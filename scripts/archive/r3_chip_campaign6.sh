#!/bin/bash
# Round-3 chip chain, part 6 — post-fix-dynamics replication, short session.
#
# Context: session 3 landed the post-campaign fix queue (notably
# zero_frozen_grads, engine/trainer.py), which changes training dynamics vs
# every committed r3c row; the same-campaign pairing rule therefore demands
# fresh teacher + base rows before any lever row is comparable.  This
# session has ~55 min of chip time from a COLD cache (VM refresh wiped
# .jax_cache again), so the queue is sized to the highest-value pair that
# fits: replicate the flagship transplant claim (QUALITY.md c3: +5.3 HOTA
# paired at s42) under the post-fix dynamics.
#
# EPOCHS=6 (not the usual 10): three 10-epoch runs cannot fit a cold ~55-min
# window (train ~2 min/epoch + ~10 min first-run compiles).  6-epoch rows
# are a same-protocol-shorter-schedule replication — QUALITY.md labels them
# as such (precedent: reports/flagship_eval_synth_6ep.json).
#
# RULE while this runs: NOTHING else CPU-heavy on this box — no pytest,
# no dryruns, no benches (campaign steps are host-bound through the relay).
set -u
cd /root/repo
W=/root/repo/_campaigns/r3d
LOGS=$W/logs
mkdir -p "$LOGS"

# stop LAUNCHING new runs at 02:49 UTC; kill anything still running 03:02
export FLAGSHIP_EVAL_DEADLINE=${FLAGSHIP_EVAL_DEADLINE:-1787107749}
export FLAGSHIP_EVAL_HARD_STOP=${FLAGSHIP_EVAL_HARD_STOP:-1787108529}
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
  python tools/quality_report.py $W reports/quality_v2_c4.json \
    >"$LOGS/report.log" 2>&1
}

FE="python tools/flagship_eval.py $W 6"
# seed-major: the paired (teacher, base, transplant) triple first
run teacher42    $FE deformable 42
run base42       $FE windowed 42
run transplant42 $FE windowed_transplant 42
# stretch rows, in case time remains (distill shares the s42 teacher)
run distill42    $FE windowed_distill 42
run sharedcpb42  $FE windowed_sharedcpb 42
run base43       $FE windowed 43
echo "=== ALL DONE ($(date -u +%H:%M:%S)) ==="
