#!/bin/bash
# Round-5 uformer train sweep (VERDICT r4 item 3, phase 2): the winning
# workaround config (defaults after the phase-1 keep/drop decision) over
# batch x dtype x remat. Run AFTER bench_train_ablation.sh.
set -u
cd /root/repo

run() { echo "=== $* ==="; "$@" 2>&1 | grep -v "WARNING.*axon"; echo; }

echo "--- phase 2: uformer train sweep at final defaults ---"
for B in 8 16 32; do
  run env SE_TPU_BENCH_MODE=train SE_TPU_BENCH_MODEL=uformer SE_TPU_BENCH_BATCH=$B python bench.py
  run env SE_TPU_BENCH_MODE=train SE_TPU_BENCH_MODEL=uformer SE_TPU_BENCH_BATCH=$B SE_TPU_BENCH_DTYPE=bf16 python bench.py
done
echo "--- remat ablation at B=8 and B=32 ---"
run env SE_TPU_BENCH_MODE=train SE_TPU_BENCH_MODEL=uformer SE_TPU_BENCH_BATCH=8 SE_TPU_BENCH_REMAT=dots python bench.py
run env SE_TPU_BENCH_MODE=train SE_TPU_BENCH_MODEL=uformer SE_TPU_BENCH_BATCH=32 SE_TPU_BENCH_REMAT=dots python bench.py
echo "train sweep done"
