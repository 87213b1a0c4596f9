"""Zoo-wide serving-batch ladder (round 5).

The Uformer batch ladder (PERF.md "Headline batch sensitivity") found that
power-of-two serving batch is a first-order throughput lever on v5e —
B=256 is +47% fp32 / +49% bf16 over the historical B=32. This script
measures the same ladder for the rest of the zoo so each family gets a
recorded best serving configuration rather than the "presumably applies
zoo-wide" guess.

Reuses bench.py's cache-safe measurement (`_bench_model`: fori_loop-chained
iters, repeats on the previous dispatch's output). One process, one log
line per (model, batch, dtype) cell; OOM/compile failures are caught and
logged as cells, since FullSubNet's folded sub-band batch (257*B) is
expected to hit HBM limits somewhere up the ladder.

Usage:  python examples/bench_zoo_ladder.py | tee examples/zoo_ladder_r5.log
Env:    SE_TPU_LADDER_MODELS=dpcrn,dccrn  SE_TPU_LADDER_BATCHES=64,256
        SE_TPU_BENCH_DTYPE=bf16 (per-run dtype; the default sweep is fp32)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SE_TPU_BENCH_REPEATS", "3")

import bench  # noqa: E402  (repo-root bench.py)

MODELS = os.environ.get(
    "SE_TPU_LADDER_MODELS",
    "dpcrn,lstm,crn,gcrn,dccrn,g2net,taylorsenet,ctsnet,fullsubnet",
).split(",")
BATCHES = [int(b) for b in os.environ.get(
    "SE_TPU_LADDER_BATCHES", "64,256").split(",")]
SECONDS = float(os.environ.get("SE_TPU_BENCH_SECONDS", "4"))
DTYPE = os.environ.get("SE_TPU_BENCH_DTYPE", "fp32")


def main():
    print(f"# zoo ladder: dtype={DTYPE} seconds={SECONDS} "
          f"repeats={os.environ['SE_TPU_BENCH_REPEATS']}", flush=True)
    for m in MODELS:
        for b in BATCHES:
            # iters scaled down so slow (model, 256) cells stay ~tens of
            # seconds per dispatch; tunnel bias (~27 ms fixed) stays <1%.
            iters = 8
            try:
                st = bench._bench_model(m, b, SECONDS, iters=iters)
                print(f"LADDER {m} B={b} {DTYPE}: "
                      f"{st['throughput']:.1f} au-s/s "
                      f"[{st['min']:.1f}, {st['max']:.1f}] "
                      f"spread={st['spread_pct']:.2f}% x{st['repeats']}",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                msg = str(e).replace("\n", " ")[:300]
                print(f"LADDER {m} B={b} {DTYPE}: FAILED {msg}", flush=True)


if __name__ == "__main__":
    main()
