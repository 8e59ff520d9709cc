#!/bin/bash
# Round-4 session-8 landing: apply the staged source edits AFTER the last
# campaign launch (any edit to a traced file cold-recompiles every later
# run — CLAUDE.md round-2 lesson).  Run only once the r4g chain has
# printed ALL DONE (or the stop marker ended it) and nothing holds the
# chip.
set -eu
cd /root/repo

# 1. WINDOWED_ATTN_IMPL dispatch (fused window-attention kernel wiring)
cp _staging/windowed_encoder_attn.py memotr_tpu/models/windowed_encoder.py
cp _staging/transformer_attn.py      memotr_tpu/models/transformer.py
cp _staging/memotr_attn.py           memotr_tpu/models/memotr.py
cp _staging/hybrid_encoder_attn.py   memotr_tpu/models/hybrid_encoder.py
cp _staging/bench_attn.py            bench.py
cp _staging/test_windowed_attn_dispatch.py tests/

# 2. MSDA auto dispatch by query count (>=2048 -> pallas on TPU)
cp _staging/msda_dispatch.py memotr_tpu/ops/msda.py
cp _staging/test_msda_auto.py tests/

python -m py_compile memotr_tpu/models/windowed_encoder.py \
    memotr_tpu/models/transformer.py memotr_tpu/models/memotr.py \
    memotr_tpu/models/hybrid_encoder.py bench.py memotr_tpu/ops/msda.py \
    tests/test_windowed_attn_dispatch.py tests/test_msda_auto.py

# 3. retire applied/superseded staging copies (msda_auto.py was the
#    session-3 auto->pallas draft, superseded by msda_dispatch.py;
#    trainer_scan/submit_dedup/bench_train_mem already landed in 4cf6f3c)
git rm -q --cached _staging/msda_auto.py 2>/dev/null || true
rm -rf _staging

echo "landed; next: targeted CPU tests (scrubbed env), then chip A/Bs"
