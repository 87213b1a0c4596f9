"""On-chip streaming latency for the exact streamers (VERDICT r4 item 9).

The reference decodes whole utterances only; the exact streamers
(LstmStreamer, CausalStreamer for crn/gcrn/dpcrn) are this framework's
low-latency serving story, and until round 5 they had no on-chip latency
numbers. This measures the per-push wall latency: audio arrives in
chunk-sized pieces (chunk_frames * 10 ms), each push returns the finalized
samples, and the wall time of each steady-state push is recorded.

Through the axon tunnel every push pays the ~27 ms fixed dispatch RTT, so
the medians here are upper bounds — a locally-attached TPU serves the
same compiled step without the tunnel hop. Reported per model x chunk:
median / p95 push wall ms vs the chunk's audio ms (real-time when
median < audio ms).

Run: python examples/bench_streaming_latency.py [model ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

FS = 16000


def _make_vars(name: str):
    from se_tpu.models import get_model
    from se_tpu.ops.stft import stft
    from se_tpu.utils.layouts import canonicalize_layouts

    entry = get_model(name)
    model = entry.make()
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((1, FS)), jnp.float32) * 0.1
    re, im = stft(wav, entry.stft)
    mag = jnp.sqrt(re**2 + im**2)
    feats = mag if entry.io_kind in ("mag_mask", "cirm") else (
        jnp.stack([re, im], axis=-1))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), feats)
    return model, canonicalize_layouts(variables)


def bench_one(name: str, chunk_frames: int, seconds: float = 30.0,
              warm_pushes: int = 6):
    from se_tpu.eval.streaming import CausalStreamer, LstmStreamer

    model, variables = _make_vars(name)
    if name == "lstm":
        streamer = LstmStreamer(variables, model=model,
                                chunk_frames=chunk_frames)
    else:
        streamer = CausalStreamer(name, variables, model=model,
                                  chunk_frames=chunk_frames)
    hop = streamer.cfg.hop
    push_len = chunk_frames * hop
    rng = np.random.default_rng(1)
    audio = (rng.standard_normal(int(seconds * FS)) * 0.1).astype(np.float32)

    lat = []
    n_push = len(audio) // push_len
    for i in range(n_push):
        piece = audio[i * push_len:(i + 1) * push_len]
        t0 = time.perf_counter()
        streamer.push(piece)
        dt = (time.perf_counter() - t0) * 1000.0
        if i >= warm_pushes:
            lat.append(dt)
    lat = np.sort(np.asarray(lat))
    audio_ms = push_len / FS * 1000.0
    med = float(np.median(lat))
    p95 = float(lat[int(0.95 * (len(lat) - 1))])
    print(f"{name:10s} chunk={chunk_frames:3d} ({audio_ms:5.0f} ms audio)  "
          f"median {med:7.2f} ms  p95 {p95:7.2f} ms  "
          f"RTF {med / audio_ms:5.3f}  pushes {len(lat)}", flush=True)
    return med, p95


def main():
    models = sys.argv[1:] or ["lstm", "crn", "gcrn", "dpcrn"]
    for name in models:
        for chunk in (8, 16):
            try:
                bench_one(name, chunk)
            except Exception as e:  # noqa: BLE001
                print(f"{name} chunk={chunk}: FAILED {e}", flush=True)


if __name__ == "__main__":
    main()
