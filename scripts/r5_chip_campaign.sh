#!/bin/bash
# Round-5 chip campaign — LAUNCH FIRST THING at round-5 session start
# (CLAUDE.md standing rule), paired with the reports watcher:
#   nohup bash scripts/commit_reports_watcher.sh reports/quality_v3_r5.json 120 39600 \
#     > /tmp/reports_watcher.log 2>&1 & echo $! > /tmp/reports_watcher.pid
#   nohup bash scripts/r5_chip_campaign.sh > _campaigns/r5_chain.log 2>&1 & \
#     echo $! > /tmp/r5_chain.pid
#
# Round-5 agenda: re-validate the flagship recipe on the harder, more
# DanceTrack-like proxy v3 (uniform appearance -> association must ride
# motion/position; OU/formation motion; mid-sequence birth/death).  The
# v2 story this must replicate (QUALITY.md round 4): transplant init
# erases the windowed encoder's from-scratch deficit at deployment width
# (windowed_w256_transplant 65.4±1.3 n=3 vs windowed_w256 50.2±2.1 and
# its own deformable_w256 teacher 59.8±1.1), and hybrid_w256_transplant
# ties it (65.7±0.6 n=2) at 32.7 FPS.
#
# Ordering is seed-major (CLAUDE.md: lever-major starves later levers),
# teachers first (transplant rows resolve @teacher_w256 = the same-
# campaign deformable_w256 seed-42 checkpoint).  Stage 0 is a bench.py
# run: final round — the round-end BENCH must not depend on the landing
# window surviving, and this warms the flagship programs while the cache
# is cold anyway.  touch /tmp/r5_stop ends the chain after the current
# stage (controlled landing-window handoff).
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
# default: 10.5 h of launches, 11 h hard stop — override for shorter sessions
export FLAGSHIP_EVAL_DEADLINE=${FLAGSHIP_EVAL_DEADLINE:-$((NOW + 37800))}
export FLAGSHIP_EVAL_HARD_STOP=${FLAGSHIP_EVAL_HARD_STOP:-$((NOW + 39600))}
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
FE20="python tools/flagship_eval.py $W20 20"

# 0. round-end BENCH insurance + cold-cache warmup (flagship programs)
run bench0        python bench.py
# 1. 64-dim v3 core, seed 42 — FIRST quality stage on purpose: the round-4
#    shakeout (scripts/r4_v3_shakeout.sh) never got chip time, so this
#    cheap triple is the v3 validation gate (generates/trains/evals end to
#    end, HOTA in a usable range, transplant sign visible) before ~2 h of
#    w256 rows bet on the v3 world.  If v3 looks broken here, stop the
#    chain (/tmp/r5_stop), fix the generator, restart with a fresh workdir.
run core42        $FE deformable,windowed,windowed_transplant 42
# 2. width teacher (seed 42 checkpoint feeds every @teacher_w256 row)
run teacherw256   $FE deformable_w256 42
# 3. the decisive v3 rows at deployment width, seed 42
run w256fam42     $FE windowed_w256,windowed_w256_transplant,hybrid_w256_transplant 42
# 3b. frame-scan vs unrolled cold-compile measurement (VERDICT r4 next #4)
#     — standalone tool, fresh cache dir, does not touch the campaign cache
run scancompile   python tools/profile_compile.py
[ -f "$LOGS/scancompile.log" ] && cp "$LOGS/scancompile.log" reports/scancompile_r5.jsonl
# 4. seed 43 replicates (teacher replicate first for the paired base)
run teacher43     $FE deformable_w256 43
run w256fam43     $FE windowed_w256,windowed_w256_transplant,hybrid_w256_transplant 43
# 4b. shared-CPB at width, re-earned paired on v3 (VERDICT r4 next #5: the
#     -3.1 HOTA cpb tax was n=1 on v2; pairs with w256fam43's
#     windowed_w256_transplant s43 in this same workdir)
run cpbtrans43    $FE windowed_w256_transplant_cpb 43
run core43        $FE windowed,windowed_transplant 43
# 4c. hybrid 64-dim, n=2 on v3 (VERDICT r4 next #5's other n=1 row)
run hybrid42      $FE hybrid 42
run hybrid43      $FE hybrid 43
# 5. n=3 on the headline + its paired bases
run w256fam44     $FE deformable_w256,windowed_w256,windowed_w256_transplant 44
run core44        $FE windowed,windowed_transplant 44
# 6. 20-epoch v3 tail (fresh workdir = its own teacher) — does the
#    from-scratch width gap close with schedule on the harder proxy?
run w256t20       $FE20 deformable_w256,windowed_w256 42
run w256trans20   $FE20 windowed_w256_transplant 42
python tools/quality_report.py $W20 reports/quality_v3_r5_20ep.json >"$LOGS/report20.log" 2>&1 || true
# 7. if time remains: hybrid n=3 + headline n=4
run hybridw256t44 $FE hybrid_w256_transplant 44
run w256trans45   $FE windowed_w256_transplant 45
echo "=== ALL DONE ($(date -u +%H:%M:%S)) ==="
