#!/bin/bash
# Round-4 landing A/Bs (session 9, fresh VM/cold cache): decide the
# dispatch defaults that the landed WINDOWED_ATTN_IMPL / MSDA auto knobs
# ship with, with allow_input_fusion now on both Pallas custom calls.
# Each stage is one bench.py invocation (cold compile ~10 min on a fresh
# cache, then 20 timed iters).  Stage 1 doubles as the driver's
# round-end bench pre-warm for the current defaults.
set -u
cd /root/repo
L=_campaigns/r4_landing_ab
mkdir -p "$L"

stage() {  # name, env... -- runs bench.py flagship with env overrides
    local name=$1; shift
    if [ -e /tmp/r4_stop ]; then echo "=== STOP marker, skip $name"; return; fi
    echo "=== $name start $(date -u +%H:%M:%S) ==="
    env "$@" timeout 1500 python bench.py >"$L/$name.json" 2>"$L/$name.log"
    echo "=== $name rc=$? $(date -u +%H:%M:%S): $(cat "$L/$name.json" 2>/dev/null)"
}

stage default_xla
stage attn_pallas   BENCH_WINDOWED_ATTN=pallas
stage msda_pallas   BENCH_MSDA_IMPL=pallas
stage hybrid_auto   BENCH_ENCODER=hybrid
echo "=== ALL DONE $(date -u +%H:%M:%S) ==="
