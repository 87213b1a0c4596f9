#!/bin/bash
# Remaining phase-1 ablation cells at reduced timing cost (the regression
# signature is ~30x; REPEATS=2 x ITERS=8 resolves it without spending
# chip-hours on a known-pathological config).
set -u
cd /root/repo
run() { echo "=== $* ==="; "$@" 2>&1 | grep -v "WARNING.*axon"; echo; }
export SE_TPU_BENCH_MODE=train SE_TPU_BENCH_MODEL=uformer SE_TPU_BENCH_BATCH=8
export SE_TPU_BENCH_REPEATS=2 SE_TPU_BENCH_ITERS=8
run env SE_TPU_DISABLE_DCONV33_VJP=1 python bench.py
run env SE_TPU_DISABLE_BLOCK_CKPT=1 python bench.py
run env SE_TPU_DISABLE_DCONV33_VJP=1 SE_TPU_DISABLE_BLOCK_CKPT=1 python bench.py
echo "ablation rest done"
