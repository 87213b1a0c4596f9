"""Streaming enhancement demo: exact low-latency LSTM streaming plus the
zoo-wide windowed chunked decode (se_tpu.eval.streaming).

The reference decodes whole utterances only (LSTM/lstm_decode_vb.py:17-64);
this shows the two serving-oriented paths the TPU framework adds:

1. `LstmStreamer` consumes audio in arbitrary-sized pushes and emits
   enhanced samples with frame+chunk latency, reproducing the offline
   decode exactly (sample-parity is asserted below).
2. `enhance_windowed` decodes any-length audio with ONE compiled shape and
   bounded memory, batching independent windows into a single dispatch.

Run: PYTHONPATH=. python examples/streaming_demo.py
"""

from __future__ import annotations

import numpy as np
import jax

from se_tpu.eval.enhance import enhance_waveform
from se_tpu.eval.streaming import LstmStreamer, enhance_windowed
from se_tpu.models import get_model
from se_tpu.ops.stft import stft

FS = 16000


def main():
    rng = np.random.default_rng(0)
    n = 4 * FS
    wav = (rng.standard_normal(n) * 0.1).astype(np.float32)

    # random-init LSTM model (swap in restored variables for real use)
    entry = get_model("lstm")
    model = entry.make()
    import jax.numpy as jnp

    re, im = stft(jnp.asarray(wav[None]), entry.stft)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.sqrt(re**2 + im**2))

    offline = enhance_waveform("lstm", variables, wav, model=model)

    # --- exact streaming: push 100 ms at a time -------------------------
    c = float(np.sqrt(n / max(np.sum(wav**2), 1e-12)))
    st = LstmStreamer(variables, model=model, chunk_frames=8, gain=c)
    out, latencies = [], []
    step = FS // 10
    for i in range(0, n, step):
        got = st.push(wav[i:i + step])
        out.append(got)
        latencies.append((i + step) - (sum(map(len, out))))
    out.append(st.flush())
    stream = np.concatenate(out)
    err = np.abs(stream - offline).max()
    print(f"exact streaming: {len(stream)} samples, "
          f"max |stream - offline| = {err:.2e}")
    print(f"steady-state buffering latency: {latencies[-1]} samples "
          f"({1000 * latencies[-1] / FS:.0f} ms)")
    assert err < 1e-3

    # --- windowed chunked decode (any model) ----------------------------
    win = enhance_windowed("lstm", variables, wav, chunk_seconds=1.0,
                           context_seconds=0.5, model=model)
    d = win - offline
    snr = 10 * np.log10((np.sum(offline**2) + 1e-12) / (np.sum(d**2) + 1e-12))
    print(f"windowed decode agreement vs offline: {snr:.1f} dB SNR")


if __name__ == "__main__":
    main()
