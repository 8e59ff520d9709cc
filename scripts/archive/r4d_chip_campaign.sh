#!/bin/bash
# Round-4 chain part D — r4c plus a stop-marker: `touch /tmp/r4_stop`
# ends the chain after the current stage, freeing the chip for the
# landing window (staged source edits + bench pre-warm) without another
# kill/replace cycle.  Queue order rationale in r4c_chip_campaign.sh.
set -u
cd /root/repo
W=/root/repo/_campaigns/r4
LOGS=$W/logs
mkdir -p "$LOGS"
REPORT=reports/quality_v2_r4.json
STOP=/tmp/r4_stop
rm -f "$STOP"

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
  python tools/quality_report.py $W $REPORT >"$LOGS/report.log" 2>&1
fi

run() {  # run <tag> <cmd...>
  local tag=$1; shift
  if [ -e "$STOP" ]; then
    echo "=== stop marker present, skipping $tag ==="
    return
  fi
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
