#!/bin/bash
# Round-5 uformer train-step re-baseline (VERDICT r4 item 3).
# Phase 1: ablation grid of the two round-4 workarounds that landed
# BEFORE the layout root cause was found:
#   - _dconv33 custom dW VJP   (SE_TPU_DISABLE_DCONV33_VJP=1 turns OFF)
#   - block-granular checkpoint (SE_TPU_DISABLE_BLOCK_CKPT=1 turns OFF)
# Phase 2 (run after picking the winner): batch x dtype x remat sweep.
set -u
cd /root/repo

run() { echo "=== $* ==="; "$@" 2>&1 | grep -v "WARNING.*axon"; echo; }

echo "--- phase 1: workaround ablation grid (uformer train B=8 x 4 s fp32) ---"
run env SE_TPU_BENCH_MODE=train SE_TPU_BENCH_MODEL=uformer SE_TPU_BENCH_BATCH=8 python bench.py
run env SE_TPU_BENCH_MODE=train SE_TPU_BENCH_MODEL=uformer SE_TPU_BENCH_BATCH=8 SE_TPU_DISABLE_DCONV33_VJP=1 python bench.py
run env SE_TPU_BENCH_MODE=train SE_TPU_BENCH_MODEL=uformer SE_TPU_BENCH_BATCH=8 SE_TPU_DISABLE_BLOCK_CKPT=1 python bench.py
run env SE_TPU_BENCH_MODE=train SE_TPU_BENCH_MODEL=uformer SE_TPU_BENCH_BATCH=8 SE_TPU_DISABLE_DCONV33_VJP=1 SE_TPU_DISABLE_BLOCK_CKPT=1 python bench.py
echo "ablation phase 1 done"
