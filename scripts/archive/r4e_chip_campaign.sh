#!/bin/bash
# Round-4 session-6 chain: finish the r4 quality matrix (same workdir =
# same-campaign pairing bases, CLAUDE.md rule) + the two perf decisions
# VERDICT round-3 still has open (#4 hybrid in-pipeline Pallas FPS, #9
# train-memory rows), then a 20-epoch deployment-width tail in a fresh
# workdir (its own teachers).  Stage order is value-major: headline n=3
# first, decisions next, replicates after, optional tail last.
#
# touch /tmp/r4_stop to end the chain after the current stage (controlled
# landing-window handoff — CLAUDE.md round-4 ops).
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

# 1. headline to n=3
run w256trans44    $FE windowed_w256_transplant 44
# 2. VERDICT #4 decision: does the 2.04x coarse-scale Pallas microbench win
#    transfer in-pipeline (hybrid >=30 FPS), unlike the decoder-scale one?
run hybridfps bash -c '
  for enc in hybrid deformable; do for impl in xla pallas; do
    echo "--- BENCH_ENCODER=$enc BENCH_MSDA_IMPL=$impl ---"
    BENCH_ENCODER=$enc BENCH_MSDA_IMPL=$impl python bench.py
  done; done'
# 3. width pair to n=3
run w256_44        $FE deformable_w256,windowed_w256 44
# 4-5. 64-dim family to n=3
run base44         $FE windowed 44
run levers44       $FE windowed_transplant,windowed_distill,windowed_transplant_distill 44
# 6. knob replicates
run knobs43        $FE windowed_sharedcpb,windowed_warmup 43
# 7. VERDICT #9: train-step s/iter + XLA memory at the reference shape
run trainmem bash -c '
  for clip in 2 5; do for enc in windowed deformable; do
    echo "--- BENCH_CLIP=$clip $enc ---"
    BENCH_CLIP=$clip python bench_train.py $enc
  done; done'
# 8. hybrid quality to n=2
run hybrid43       $FE hybrid,hybrid_transplant 43
# 9. 64-dim teacher row to n=2
run deformable43   $FE deformable 43
# 10. remaining replicates
run w256cpbtrans43 $FE windowed_w256_transplant_cpb 43
run knobs44        $FE windowed_sharedcpb,windowed_warmup 44
# 11. VERDICT #7 measurement: frame-scan vs unrolled cold-compile time
run scancompile    python tools/profile_compile.py
# 12. 20-epoch deployment-width tail (fresh workdir = its own teacher,
#     same-campaign pairing rule; answers "does the transplant advantage
#     persist at 2x schedule at width 256?")
FE20="python tools/flagship_eval.py $W20 20"
run w256t20        $FE20 deformable_w256,windowed_w256 42
run w256trans20    $FE20 windowed_w256_transplant 42
python tools/quality_report.py $W20 reports/quality_v2_r4_20ep.json >"$LOGS/report20.log" 2>&1
# 13. headline to n=4 if time remains
run w256trans45    $FE windowed_w256_transplant 45
run hybrid44       $FE hybrid,hybrid_transplant 44
echo "=== ALL DONE ($(date -u +%H:%M:%S)) ==="
