#!/bin/bash
# Round-3 chip chain, part 6b — reordered continuation of part 6.
#
# Part 6 queued teacher -> base -> transplant, but at cold-cache run costs
# (~20-25 min each) the third run cannot finish before the hard stop; the
# headline replication for this session is "transplant student >= deformable
# teacher, paired same-campaign" (QUALITY.md c3), which needs only
# teacher + transplant.  So: wait for the already-running teacher42 to
# write its metrics, then run transplant BEFORE base.  Base/distill/
# sharedcpb follow only if time remains.
set -u
cd /root/repo
W=/root/repo/_campaigns/r3d
LOGS=$W/logs
mkdir -p "$LOGS"

export FLAGSHIP_EVAL_DEADLINE=${FLAGSHIP_EVAL_DEADLINE:-1787107749}
export FLAGSHIP_EVAL_HARD_STOP=${FLAGSHIP_EVAL_HARD_STOP:-1787108529}
echo "deadline: $FLAGSHIP_EVAL_DEADLINE ($(date -d @$FLAGSHIP_EVAL_DEADLINE))"
echo "hardstop: $FLAGSHIP_EVAL_HARD_STOP ($(date -d @$FLAGSHIP_EVAL_HARD_STOP))"

# wait for the part-6 teacher42 run (still owned by its orphaned timeout
# process) to finish: metrics file, then a grace period for process exit
TEACHER_METRICS=$W/deformable_s42/val/checkpoint_5_metrics.json
while [ ! -f "$TEACHER_METRICS" ]; do
  if [ "$(date +%s)" -ge "${FLAGSHIP_EVAL_HARD_STOP%.*}" ]; then
    echo "=== hard stop while waiting for teacher, giving up ==="
    exit 1
  fi
  sleep 20
done
echo "=== teacher metrics present ($(date -u +%H:%M:%S)), grace 45s ==="
sleep 45
python tools/quality_report.py $W reports/quality_v2_c4.json \
  >"$LOGS/report.log" 2>&1

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
run transplant42 $FE windowed_transplant 42
run base42       $FE windowed 42
run distill42    $FE windowed_distill 42
run sharedcpb42  $FE windowed_sharedcpb 42
echo "=== ALL DONE ($(date -u +%H:%M:%S)) ==="
