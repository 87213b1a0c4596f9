#!/bin/bash
# Round-3 measurement battery (VERDICT r2 item 1): every number PERF.md
# needs, run sequentially on the real chip. Results stream to stdout;
# redirect to a file and transcribe into PERF.md.
set -u
cd /root/repo

run() { echo "=== $* ==="; "$@" 2>&1 | grep -v "WARNING.*axon"; echo; }

echo "--- headline (uformer enhance B=32 x 4 s) ---"
run python bench.py
run env SE_TPU_BENCH_DTYPE=bf16 python bench.py

echo "--- kernel A/B: headline with each Pallas kernel disabled ---"
run env SE_TPU_DISABLE_PALLAS_DSCONV=1 python bench.py
run env SE_TPU_DISABLE_PALLAS_ATTENTION=1 python bench.py
run env SE_TPU_DISABLE_PALLAS_DSCONV=1 SE_TPU_DISABLE_PALLAS_ATTENTION=1 python bench.py

echo "--- fullsubnet enhance B=32 (pallas lstm on/off) ---"
run env SE_TPU_BENCH_MODEL=fullsubnet python bench.py
run env SE_TPU_BENCH_MODEL=fullsubnet SE_TPU_DISABLE_PALLAS_LSTM=1 python bench.py

echo "--- fullsubnet train step B=32 (pallas lstm on/off; OOM check) ---"
run env SE_TPU_BENCH_MODE=train SE_TPU_BENCH_MODEL=fullsubnet python bench.py
run env SE_TPU_BENCH_MODE=train SE_TPU_BENCH_MODEL=fullsubnet SE_TPU_DISABLE_PALLAS_LSTM=1 python bench.py

echo "--- train headline refresh ---"
run env SE_TPU_BENCH_MODE=train SE_TPU_BENCH_MODEL=dpcrn python bench.py
run env SE_TPU_BENCH_MODE=train SE_TPU_BENCH_MODEL=dpcrn SE_TPU_BENCH_DTYPE=bf16 python bench.py
run env SE_TPU_BENCH_MODE=train SE_TPU_BENCH_MODEL=uformer SE_TPU_BENCH_BATCH=8 python bench.py
run env SE_TPU_BENCH_MODE=train SE_TPU_BENCH_MODEL=uformer SE_TPU_BENCH_BATCH=8 SE_TPU_BENCH_DTYPE=bf16 python bench.py

echo "--- zoo sweep (B=8 x 4 s, cache-safe) ---"
run env SE_TPU_BENCH_ALL=1 SE_TPU_BENCH_BATCH=8 python bench.py
run env SE_TPU_BENCH_ALL=1 SE_TPU_BENCH_BATCH=8 SE_TPU_BENCH_DTYPE=bf16 python bench.py

echo "--- kernel microbenches ---"
run python examples/diag_kernels.py dsconv
run python examples/diag_kernels.py attention
echo "battery done"
