#!/bin/bash
# Round-5 landing window: apply the staged encoder-headroom batch
# (_landing/, VERDICT r4 #6) AFTER the chip campaign has ended, validate
# parity on CPU, then run the attributable chip A/B ladder against the
# 68.71 FPS bench0 baseline (logged in _campaigns/r5v3/logs/bench0.log).
#
# Run stages individually if driving by hand:
#   bash scripts/r5_landing.sh apply    # copy staged files into place
#   bash scripts/r5_landing.sh cputest  # targeted parity tests (scrubbed env)
#   bash scripts/r5_landing.sh chipab   # bench ladder on the chip
# or all three in order with no argument.
set -eu
cd /root/repo
OUT=_campaigns/r5_landing
mkdir -p "$OUT"

apply() {
  echo "== applying staged copies =="
  cp _landing/windowed_encoder.py memotr_tpu/models/windowed_encoder.py
  cp _landing/memotr.py           memotr_tpu/models/memotr.py
  cp _landing/submit.py           memotr_tpu/engine/submit.py
  cp _landing/bench.py            bench.py
  echo "applied; _landing/ removal + docs happen at the landing commit"
}

cputest() {
  echo "== targeted CPU parity tests =="
  PYTHONPATH= JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python -m pytest -x -q \
      tests/test_windowed_encoder_opt.py tests/test_eval_cache.py \
      tests/test_window_attn.py tests/test_windowed_attn_dispatch.py \
      tests/test_submit_batched.py tests/test_token_sharding.py \
      2>&1 | tee "$OUT/cputest.log"
}

chipab() {
  echo "== chip A/B ladder (each cold ~10 min; warm repeats follow) =="
  for tag in nocache_cold nocache_warm; do
    echo "-- restructure only (BENCH_EVAL_CACHE=0) : $tag"
    BENCH_EVAL_CACHE=0 timeout 2400 python bench.py \
      > "$OUT/bench_$tag.log" 2>&1 || echo "bench $tag rc=$?"
    tail -1 "$OUT/bench_$tag.log"
  done
  for tag in cache_cold cache_warm; do
    echo "-- restructure + eval cache (default) : $tag"
    timeout 2400 python bench.py > "$OUT/bench_$tag.log" 2>&1 \
      || echo "bench $tag rc=$?"
    tail -1 "$OUT/bench_$tag.log"
  done
  echo "-- e2e"
  timeout 2400 python bench.py e2e > "$OUT/bench_e2e.log" 2>&1 \
    || echo "bench e2e rc=$?"
  tail -1 "$OUT/bench_e2e.log"
  echo "-- serve8"
  timeout 2400 python bench.py serve8 > "$OUT/bench_serve8.log" 2>&1 \
    || echo "bench serve8 rc=$?"
  tail -1 "$OUT/bench_serve8.log"
}

case "${1:-all}" in
  apply)   apply ;;
  cputest) cputest ;;
  chipab)  chipab ;;
  all)     apply; cputest; chipab ;;
  *)       echo "unknown stage: $1"; exit 2 ;;
esac
