"""Short-time discrete cosine transform (ref: DeepXi/deepxi/dct.py:18-117).

DCT-II/III as matmuls with tf.signal/scipy scaling conventions
(norm=None: forward has the factor 2, idct(dct(x)) == 2*N*x), hann window,
optional pad_end framing, overlap-add inverse — the front-end for DeepXi's
STDCTXiCD input/target.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from se_tpu.ops.stft import StftConfig, frame_signal, overlap_add
from se_tpu.ops.windows import get_window


@functools.lru_cache(maxsize=None)
def _dct2_matrix(n: int) -> np.ndarray:
    """(N, N) with y = x @ C: y[k] = 2 sum_n x[n] cos(pi k (2n+1) / 2N)."""
    k = np.arange(n)
    nn = np.arange(n)
    c = 2.0 * np.cos(np.pi * np.outer(2 * nn + 1, k) / (2.0 * n))
    return c.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _dct3_matrix(n: int) -> np.ndarray:
    """(N, N) with x = y @ C: x[n] = y[0] + 2 sum_{k>=1} y[k] cos(...)."""
    k = np.arange(n)
    nn = np.arange(n)
    c = 2.0 * np.cos(np.pi * np.outer(k, 2 * nn + 1) / (2.0 * n))
    c[0] *= 0.5
    return c.astype(np.float32)


def stdct(x: jnp.ndarray, frame_length: int, frame_step: int,
          fft_length: int | None = None, window: str | None = "hann",
          pad_end: bool = False) -> jnp.ndarray:
    """(..., n) -> (..., T, fft_length) short-time DCT-II coefficients."""
    n_fft = fft_length or frame_length
    cfg = StftConfig(frame_length, frame_step, n_fft,
                     convention="pad_end" if pad_end else "valid")
    frames = frame_signal(x, cfg)[..., :frame_length]
    if window is not None:
        frames = frames * jnp.asarray(get_window(window, frame_length))
    if n_fft > frame_length:
        pad = [(0, 0)] * (frames.ndim - 1) + [(0, n_fft - frame_length)]
        frames = jnp.pad(frames, pad)
    return frames @ jnp.asarray(_dct2_matrix(n_fft))


def inverse_stdct(coeffs: jnp.ndarray, frame_length: int, frame_step: int,
                  fft_length: int | None = None,
                  window: str | None = "hann",
                  length: int | None = None) -> jnp.ndarray:
    """(..., T, fft_length) -> (..., n) via DCT-III + window + overlap-add."""
    n_fft = fft_length or coeffs.shape[-1]
    frames = coeffs @ jnp.asarray(_dct3_matrix(n_fft))
    frames = frames[..., :frame_length]
    if frames.shape[-1] < frame_length:
        pad = [(0, 0)] * (frames.ndim - 1) + [(0, frame_length - frames.shape[-1])]
        frames = jnp.pad(frames, pad)
    if window is not None:
        frames = frames * jnp.asarray(get_window(window, frame_length))
    out = overlap_add(frames, frame_step)
    if length is not None:
        out = out[..., :length]
    return out
