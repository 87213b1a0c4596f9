"""Mixing and masking playground (the Uformer/script.py:7-67 role).

Synthesizes a toy scene: a "clean" harmonic signal convolved with a
synthetic exponentially-decaying RIR, mixed with noise at a target SNR,
then enhanced with an oracle magnitude mask — a minimal end-to-end tour of
se_tpu.ops without needing any dataset.

Run: PYTHONPATH=. python examples/mixing_demo.py [out_dir]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import jax.numpy as jnp

from se_tpu.data import write_wav
from se_tpu.eval import metrics
from se_tpu.ops.stft import PRESET_320, istft, stft

FS = 16000


def synth_speechlike(n: int, rng) -> np.ndarray:
    """Harmonic tone stack with a wandering f0 and amplitude envelope."""
    t = np.arange(n) / FS
    f0 = 120 + 40 * np.sin(2 * np.pi * 0.7 * t)
    phase = 2 * np.pi * np.cumsum(f0) / FS
    sig = sum(np.sin(k * phase) / k for k in range(1, 6))
    env = 0.5 * (1 + np.sin(2 * np.pi * 2.3 * t - np.pi / 2))
    return (sig * env).astype(np.float32)


def synth_rir(rng, t60: float = 0.3, n: int = 2048) -> np.ndarray:
    decay = np.exp(-3.0 * np.log(10) * np.arange(n) / (t60 * FS))
    rir = rng.standard_normal(n) * decay
    rir[0] = 1.0
    return (rir / np.abs(rir).max()).astype(np.float32)


def mix_at_snr(clean, noise, snr_db):
    p_c = np.mean(clean**2)
    p_n = np.mean(noise**2)
    scale = np.sqrt(p_c / (p_n * 10 ** (snr_db / 10)))
    return clean + noise * scale


def main(out_dir="examples_out"):
    rng = np.random.default_rng(0)
    n = 3 * FS
    clean = synth_speechlike(n, rng) * 0.3
    reverberant = np.convolve(clean, synth_rir(rng))[:n].astype(np.float32)
    noise = rng.standard_normal(n).astype(np.float32) * 0.3
    noisy = mix_at_snr(reverberant, noise, snr_db=5.0).astype(np.float32)

    # oracle Wiener-style magnitude mask in the 320/160 front-end
    cfg = PRESET_320
    nre, nim = stft(jnp.asarray(noisy[None]), cfg)
    cre, cim = stft(jnp.asarray(reverberant[None]), cfg)
    n_mag = jnp.sqrt(nre**2 + nim**2)
    c_mag = jnp.sqrt(cre**2 + cim**2)
    mask = jnp.clip(c_mag / jnp.maximum(n_mag, 1e-8), 0.0, 1.0)
    est_re = mask * nre
    est_im = mask * nim
    est = np.asarray(istft(est_re, est_im, cfg, length=n))[0]

    os.makedirs(out_dir, exist_ok=True)
    for name, sig in [("clean", reverberant), ("noisy", noisy),
                      ("masked", est)]:
        write_wav(os.path.join(out_dir, f"{name}.wav"), sig, FS)

    print(f"noisy  SI-SDR: {metrics.si_sdr(noisy.astype(np.float64), reverberant.astype(np.float64)):6.2f} dB")
    print(f"masked SI-SDR: {metrics.si_sdr(est.astype(np.float64), reverberant.astype(np.float64)):6.2f} dB")
    print(f"wavs written to {out_dir}/")


if __name__ == "__main__":
    main(*sys.argv[1:])
