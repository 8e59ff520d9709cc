#!/bin/bash
# Round-5 chip campaign, part B (repair + continuation).
#
# Why this exists: the original r5_chip_campaign.sh chain hit two faults
# mid-flight (session 3, 2026-08-20):
#   - teacherw256 (deformable_w256 s42) died at its first device fetch with
#     a transient `FAILED_PRECONDITION: TPU backend error` through the axon
#     relay, so both seed-42 w256 transplant rows asserted on the missing
#     teacher checkpoint;
#   - scancompile crashed on import (tools/profile_compile.py lacked the
#     repo-root sys.path bootstrap — fixed).
# Per the CLAUDE.md ops rule the running chain parent was killed (its
# in-flight `timeout python flagship_eval ... deformable_w256 43` child
# survives); this chain waits for that child to exit, then repairs the
# seed-42 rows (flagship_eval skips completed (variant, seed) pairs by
# metrics file, so re-running a stage is idempotent) and continues the
# original queue.  fe() retries a stage once if its log shows a "!!!"
# failure line — the teacherw256 failure was transient, and a retry that
# skips completed pairs costs seconds when nothing failed.
#
# touch /tmp/r5_stop ends the chain after the current stage.
set -u
cd /root/repo
W=/root/repo/_campaigns/r5v3
W20=/root/repo/_campaigns/r5v3_20ep
LOGS=$W/logs
mkdir -p "$LOGS"
REPORT=reports/quality_v3_r5.json
STOP=/tmp/r5_stop
rm -f "$STOP"

export PROXY_VERSION=3

NOW=$(date +%s)
export FLAGSHIP_EVAL_DEADLINE=${FLAGSHIP_EVAL_DEADLINE:-$((NOW + 24000))}
export FLAGSHIP_EVAL_HARD_STOP=${FLAGSHIP_EVAL_HARD_STOP:-$((NOW + 25800))}
echo "deadline: $FLAGSHIP_EVAL_DEADLINE ($(date -d @$FLAGSHIP_EVAL_DEADLINE))"
echo "hardstop: $FLAGSHIP_EVAL_HARD_STOP ($(date -d @$FLAGSHIP_EVAL_HARD_STOP))"

# wait for the surviving in-flight run from the killed part-A chain
INFLIGHT=${R5B_WAIT_PID:-}
if [ -n "$INFLIGHT" ]; then
  echo "=== waiting on in-flight pid $INFLIGHT ($(date -u +%H:%M:%S)) ==="
  while kill -0 "$INFLIGHT" 2>/dev/null; do sleep 20; done
  echo "=== in-flight pid $INFLIGHT gone ($(date -u +%H:%M:%S)) ==="
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

fe() {  # fe <tag> <variants> <seed> [workdir epochs] — with one transient-failure retry
  local tag=$1 variants=$2 seed=$3 wd=${4:-$W} ep=${5:-10}
  run "$tag" python tools/flagship_eval.py "$wd" "$ep" "$variants" "$seed"
  if [ ! -e "$STOP" ] && grep -q '^!!!' "$LOGS/$tag.log" 2>/dev/null; then
    run "${tag}_r" python tools/flagship_eval.py "$wd" "$ep" "$variants" "$seed"
  fi
}

# 1. repair seed-42 width rows (teacher died on a transient backend error)
fe teacherw256r  deformable_w256 42
fe w256fam42r    windowed_w256,windowed_w256_transplant,hybrid_w256_transplant 42
# 2. seed-43 width family (teacher43 completed in part A / the in-flight wait)
fe w256fam43     windowed_w256,windowed_w256_transplant,hybrid_w256_transplant 43
# 2b. shared-CPB at width, paired with w256fam43's transplant s43
fe cpbtrans43    windowed_w256_transplant_cpb 43
# 3. frame-scan vs unrolled cold-compile measurement (VERDICT r4 #4; import fixed)
run scancompile  python tools/profile_compile.py
[ -f "$LOGS/scancompile.log" ] && cp "$LOGS/scancompile.log" reports/scancompile_r5.jsonl
# 4. 64-dim replicates
fe core43        windowed,windowed_transplant 43
fe hybrid42      hybrid 42
fe hybrid43      hybrid 43
# 5. n=3 on the headline + its paired bases
fe w256fam44     deformable_w256,windowed_w256,windowed_w256_transplant 44
fe core44        windowed,windowed_transplant 44
# 6. 20-epoch v3 tail (fresh workdir = its own teacher)
fe w256t20       deformable_w256,windowed_w256 42 $W20 20
fe w256trans20   windowed_w256_transplant 42 $W20 20
python tools/quality_report.py $W20 reports/quality_v3_r5_20ep.json >"$LOGS/report20.log" 2>&1 || true
# 7. if time remains: hybrid n=3 + headline n=4
fe hybridw256t44 hybrid_w256_transplant 44
fe w256trans45   windowed_w256_transplant 45
echo "=== ALL DONE ($(date -u +%H:%M:%S)) ==="
