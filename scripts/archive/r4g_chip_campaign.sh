#!/bin/bash
# Round-4 session-6 chain, part 2 (replaces r4e mid-queue — kill-the-bash,
# keep the in-flight run, session-4 ops recipe).  Reorder rationale: the
# NEW hybrid_w256_transplant rows (the 3x-clearing hybrid's deployment-
# width quality decision, after the session-6 hybridfps A/B) outrank the
# n=3 replicates the r4e tail queued ahead of them.  touch /tmp/r4_stop
# ends the chain after the current stage.
set -u
cd /root/repo
W=/root/repo/_campaigns/r4
W20=/root/repo/_campaigns/r4_20ep
LOGS=$W/logs
mkdir -p "$LOGS"
REPORT=reports/quality_v2_r4.json
STOP=/tmp/r4_stop
rm -f "$STOP"

export FLAGSHIP_EVAL_DEADLINE=${FLAGSHIP_EVAL_DEADLINE:-1787189400}   # 01:30 UTC Aug 20
export FLAGSHIP_EVAL_HARD_STOP=${FLAGSHIP_EVAL_HARD_STOP:-1787191800} # 02:10 UTC Aug 20
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
FE20="python tools/flagship_eval.py $W20 20"

# 1. hybrid at deployment width — the 3x-clearing flagship candidate
run hybridw256t42  $FE hybrid_w256_transplant 42
run hybridw256t43  $FE hybrid_w256_transplant 43
# 2. 64-dim family + knobs to n>=2/3
run base44         $FE windowed 44
run levers44       $FE windowed_transplant,windowed_distill,windowed_transplant_distill 44
run knobs43        $FE windowed_sharedcpb,windowed_warmup 43
# 3. VERDICT #9: train-step s/iter + XLA memory at the reference shape
run trainmem bash -c '
  for clip in 2 5; do for enc in windowed deformable; do
    echo "--- BENCH_CLIP=$clip $enc ---"
    BENCH_CLIP=$clip python bench_train.py $enc
  done; done'
# 4. hybrid / teacher replicates
run hybrid43       $FE hybrid,hybrid_transplant 43
run deformable43   $FE deformable 43
run w256cpbtrans43 $FE windowed_w256_transplant_cpb 43
run knobs44        $FE windowed_sharedcpb,windowed_warmup 44
# 5. VERDICT #7 measurement: frame-scan vs unrolled cold-compile time
run scancompile    python tools/profile_compile.py
# 6. 20-epoch deployment-width tail (fresh workdir = its own teacher)
run w256t20        $FE20 deformable_w256,windowed_w256 42
run w256trans20    $FE20 windowed_w256_transplant 42
python tools/quality_report.py $W20 reports/quality_v2_r4_20ep.json >"$LOGS/report20.log" 2>&1 || true
# 7. headline n=4 + hybrid n=3 if time remains
run w256trans45    $FE windowed_w256_transplant 45
run hybrid44       $FE hybrid,hybrid_transplant 44
echo "=== ALL DONE ($(date -u +%H:%M:%S)) ==="
