"""se_tpu — a TPU-native frequency-domain monaural speech-enhancement framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability surface of the reference
model zoo "Sixty Years of Frequency-Domain Monaural Speech Enhancement"
(12 model families, STFT front-ends in three framing conventions, masked loss
library, manifest data pipeline, decode/eval drivers), re-designed TPU-first:

- `se_tpu.ops`      — signal core: STFT/iSTFT (matmul-DFT on the MXU + Pallas
                      kernels), windows, mel, STDCT, magnitude compression.
- `se_tpu.nn`       — NN primitives: complex conv/LSTM, gated conv, cumulative
                      layer norms, DPRNN, sub-band unfold, axial attention, TCMs.
- `se_tpu.models`   — the 12-family model zoo behind a registry.
- `se_tpu.data`     — JSON-manifest pipeline, wav I/O, bucketed batching.
- `se_tpu.train`    — masked losses, train step, Orbax checkpointing.
- `se_tpu.eval`     — SI-SDR/SNR/STOI/PESQ-family metrics, gain functions.
- `se_tpu.parallel` — mesh construction, data/model sharding, collectives.
"""

__version__ = "0.1.0"
