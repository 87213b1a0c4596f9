#!/bin/bash
# Measurement battery (VERDICT r2 item 1; extended round 5 with train
# benches, the fullsubnet chunk sweep, and streaming latency — items
# 3/7/8/9): every number PERF.md needs, run sequentially on the real
# chip, ordered most-important-first so a truncated run still yields a
# useful log. Results stream to stdout; redirect to
# examples/battery_r5.log, COMMIT THE LOG, and transcribe into PERF.md
# (provenance rule: no PERF.md number without a committed raw log).
# The uformer train sweep and batch-ladder probes live in their own
# committed logs (train_sweep_r5.log, b*_probe_r5.log, ablation_r5_*).
set -u
cd /root/repo

run() { echo "=== $* ==="; "$@" 2>&1 | grep -v "WARNING.*axon"; echo; }

echo "--- headline (uformer enhance, default B=256 x 4 s since round 5) ---"
run python bench.py
run python bench.py
run env SE_TPU_BENCH_DTYPE=bf16 python bench.py
run env SE_TPU_BENCH_NO_CANON=1 python bench.py

echo "--- fullsubnet train B=32: default / bf16 / chunk sweep / OOM check ---"
run env SE_TPU_BENCH_MODE=train SE_TPU_BENCH_MODEL=fullsubnet python bench.py
run env SE_TPU_BENCH_MODE=train SE_TPU_BENCH_MODEL=fullsubnet SE_TPU_BENCH_DTYPE=bf16 python bench.py
run env SE_TPU_BENCH_MODE=train SE_TPU_BENCH_MODEL=fullsubnet SE_TPU_LSTM_BWD_CHUNK=16 python bench.py
run env SE_TPU_BENCH_MODE=train SE_TPU_BENCH_MODEL=fullsubnet SE_TPU_LSTM_BWD_CHUNK=64 python bench.py
run env SE_TPU_BENCH_MODE=train SE_TPU_BENCH_MODEL=fullsubnet SE_TPU_LSTM_BWD_CHUNK=128 python bench.py
run env SE_TPU_BENCH_MODE=train SE_TPU_BENCH_MODEL=fullsubnet SE_TPU_DISABLE_PALLAS_LSTM=1 python bench.py

echo "--- fullsubnet enhance B=32 (pallas lstm on/off) ---"
run env SE_TPU_BENCH_MODEL=fullsubnet SE_TPU_BENCH_BATCH=32 python bench.py
run env SE_TPU_BENCH_MODEL=fullsubnet SE_TPU_BENCH_BATCH=32 SE_TPU_DISABLE_PALLAS_LSTM=1 python bench.py

echo "--- dpcrn train B=32 (provenance backfill for the r4 numbers) ---"
run env SE_TPU_BENCH_MODE=train SE_TPU_BENCH_MODEL=dpcrn python bench.py
run env SE_TPU_BENCH_MODE=train SE_TPU_BENCH_MODEL=dpcrn SE_TPU_BENCH_DTYPE=bf16 python bench.py

echo "--- streaming latency (round 5 item 9; exact streamers on-chip) ---"
run python examples/bench_streaming_latency.py

echo "--- kernel A/B at the new default batch ---"
run env SE_TPU_DISABLE_PALLAS_ATTENTION=1 python bench.py

echo "--- continuity rows: the r1-r4 B=32 configuration ---"
run env SE_TPU_BENCH_BATCH=32 python bench.py
run env SE_TPU_BENCH_BATCH=32 SE_TPU_BENCH_DTYPE=bf16 python bench.py

echo "--- zoo sweep (B=8 x 4 s, cache-safe) ---"
run env SE_TPU_BENCH_ALL=1 SE_TPU_BENCH_BATCH=8 python bench.py
run env SE_TPU_BENCH_ALL=1 SE_TPU_BENCH_BATCH=8 SE_TPU_BENCH_DTYPE=bf16 python bench.py
echo "battery done"
