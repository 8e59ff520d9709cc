#!/bin/bash
# Round-4 chain part B — reordered tail of the r4 queue (session 2).
#
# Why a new chain: the original r4 order (levers43 -> base44 -> levers44 ->
# knobs43 -> w256_43 -> hybrid42 -> ...) spends ~1.4h on n=3 replicates
# before the rows that decide open VERDICT items — the w256 width replicate
# (item 2), the hybrid quality row (item 4), and the NEW lever-at-width run
# windowed_w256_transplant (the r4 seed-42 width rows show the
# windowed-vs-deformable gap growing from ~4 HOTA at 64-dim to ~13 at
# 256-dim, so transplant-at-width is the single most informative missing
# row).  With the round ending ~13:18 UTC those would all be starved.
# A running chain must be killed and replaced, never edited in place
# (CLAUDE.md session-4 ops); this chain first waits for the in-flight
# base43 run to finish (its metrics file is the marker).
set -u
cd /root/repo
W=/root/repo/_campaigns/r4
LOGS=$W/logs
mkdir -p "$LOGS"
REPORT=reports/quality_v2_r4.json

# Deadline pulled EARLIER than the original 13:06: a run launched just
# before the deadline must also FINISH before the round-end bench window
# (~13:18 UTC).  Nothing of ours may be alive when the driver benches.
export FLAGSHIP_EVAL_DEADLINE=${FLAGSHIP_EVAL_DEADLINE:-1787142300}   # 12:25
export FLAGSHIP_EVAL_HARD_STOP=${FLAGSHIP_EVAL_HARD_STOP:-1787145300} # 13:15
echo "deadline: $FLAGSHIP_EVAL_DEADLINE ($(date -d @$FLAGSHIP_EVAL_DEADLINE))"
echo "hardstop: $FLAGSHIP_EVAL_HARD_STOP ($(date -d @$FLAGSHIP_EVAL_HARD_STOP))"

# wait for the in-flight base43 run (survives its parent chain's death)
MARKER=$W/windowed_s43/val/checkpoint_9_metrics.json
echo "=== waiting for in-flight base43 ($MARKER) ==="
while [ ! -f "$MARKER" ]; do
  if [ "$(date +%s)" -ge "$FLAGSHIP_EVAL_HARD_STOP" ]; then
    echo "=== hard stop while waiting, giving up ==="
    exit 0
  fi
  sleep 30
done
sleep 15   # let the old flagship_eval process write its summary and exit

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
run levers43       $FE windowed_transplant,windowed_distill,windowed_transplant_distill 43
run w256trans42    $FE windowed_w256_transplant 42
# MSDA impl microbench (VERDICT round-3 #4): XLA-gather vs query-tiled
# Pallas at decoder/coarse/encoder scales — the measurement that decides
# whether the Pallas kernel can lift hybrid above 30 FPS.  ~15 min of
# chip, results into reports/ so the evidence is committable.
run msda_bench     python tools/profile_msda.py 20
cp "$LOGS/msda_bench.log" reports/msda_microbench_r4.txt 2>/dev/null || true
run w256_43        $FE deformable_w256,windowed_w256 43
run hybrid42       $FE hybrid,hybrid_transplant 42
run knobs43        $FE windowed_sharedcpb,windowed_warmup 43
run base44         $FE windowed 44
run levers44       $FE windowed_transplant,windowed_distill,windowed_transplant_distill 44
run w256trans43    $FE windowed_w256_transplant 43
run knobs44        $FE windowed_sharedcpb,windowed_warmup 44
run w256_44        $FE deformable_w256,windowed_w256 44
echo "=== ALL DONE ($(date -u +%H:%M:%S)) ==="
