"""Test-only oracle: literal numpy transliteration of the reference STOI.

Source: /root/reference/DeepXi/deepxi/stoi.m:1-188 (Taal et al., Delft).
This file intentionally mirrors the MATLAB line by line (test oracle —
NOT production code; the production implementation is
se_tpu/eval/metrics.py, validated against this in tests/test_metric_oracles.py).

MATLAB semantics preserved exactly:
- hanning(N) is the symmetric Hann WITHOUT zero endpoints
  (0.5*(1-cos(2*pi*(1:N)/(N+1)))),
- frame starts are 1:K:(length(x)-N)  (1-based; the frame that would end
  exactly at length(x) is NOT taken),
- thirdoct's trailing-band trim via the rnk rule,
- removeSilentFrames overlap-adds the windowed kept frames without
  window-envelope renormalization.
"""

from __future__ import annotations

import numpy as np

from se_tpu.data.wav import resample as _resample


def _hanning(n: int) -> np.ndarray:
    # MATLAB hanning(N): no zero endpoints (stoi.m:133)
    k = np.arange(1, n + 1, dtype=np.float64)
    return 0.5 * (1.0 - np.cos(2.0 * np.pi * k / (n + 1)))


def _frame_starts(n_samples: int, n: int, k: int) -> np.ndarray:
    # MATLAB frames = 1:K:(length(x)-N)  -> 0-based starts (stoi.m:130,152)
    last = n_samples - n  # exclusive in 0-based start terms
    if last < 1:
        return np.zeros((0,), np.int64)
    return np.arange(0, last, k, dtype=np.int64)


def thirdoct(fs: float, n_fft: int, num_bands: int, mn: float):
    """stoi.m:88-121."""
    f = np.linspace(0, fs, n_fft + 1)[: n_fft // 2 + 1]
    k = np.arange(num_bands, dtype=np.float64)
    cf = 2.0 ** (k / 3.0) * mn
    fl = np.sqrt((2.0 ** (k / 3.0) * mn) * 2.0 ** ((k - 1) / 3.0) * mn)
    fr = np.sqrt((2.0 ** (k / 3.0) * mn) * 2.0 ** ((k + 1) / 3.0) * mn)
    a = np.zeros((num_bands, len(f)))
    for i in range(num_bands):
        b = int(np.argmin((f - fl[i]) ** 2))
        fl_ii = b
        b = int(np.argmin((f - fr[i]) ** 2))
        fr_ii = b
        a[i, fl_ii:fr_ii] = 1.0
    rnk = a.sum(axis=1)
    # numBands = find((rnk(2:end)>=rnk(1:end-1)) & (rnk(2:end)~=0), 1, 'last')+1
    cond = (rnk[1:] >= rnk[:-1]) & (rnk[1:] != 0)
    idx = np.nonzero(cond)[0]
    nb = (idx[-1] + 1) + 1 if len(idx) else 1
    return a[:nb], cf[:nb]


def stdft(x: np.ndarray, n: int, k: int, n_fft: int) -> np.ndarray:
    """stoi.m:124-139: hanning-windowed short-time DFT, (frames, n_fft)."""
    starts = _frame_starts(len(x), n, k)
    w = _hanning(n)
    out = np.zeros((len(starts), n_fft), np.complex128)
    for i, s in enumerate(starts):
        out[i] = np.fft.fft(x[s : s + n] * w, n_fft)
    return out


def remove_silent_frames(x: np.ndarray, y: np.ndarray, rng_db: float,
                         n: int, k: int):
    """stoi.m:142-178."""
    starts = _frame_starts(len(x), n, k)
    w = _hanning(n)
    msk = np.empty(len(starts))
    for j, s in enumerate(starts):
        msk[j] = 20.0 * np.log10(
            np.linalg.norm(x[s : s + n] * w) / np.sqrt(n))
    keep = (msk - msk.max() + rng_db) > 0
    x_sil = np.zeros_like(x, dtype=np.float64)
    y_sil = np.zeros_like(y, dtype=np.float64)
    count = 0
    end = 0
    for j, s in enumerate(starts):
        if keep[j]:
            o = count * k
            x_sil[o : o + n] += x[s : s + n] * w
            y_sil[o : o + n] += y[s : s + n] * w
            end = o + n
            count += 1
    return x_sil[:end], y_sil[:end]


def taa_corr(x: np.ndarray, y: np.ndarray) -> float:
    """stoi.m:181-188."""
    xn = x - x.mean()
    xn = xn / np.sqrt(np.sum(xn**2))
    yn = y - y.mean()
    yn = yn / np.sqrt(np.sum(yn**2))
    return float(np.sum(xn * yn))


def stoi_matlab(x: np.ndarray, y: np.ndarray, fs_signal: int) -> float:
    """stoi.m:1-85. x = clean, y = processed."""
    if len(x) != len(y):
        raise ValueError("x and y should have the same length")
    x = np.asarray(x, np.float64).ravel()
    y = np.asarray(y, np.float64).ravel()

    fs = 10000
    n_frame = 256
    big_k = 512
    j_bands = 15
    mn = 150.0
    h, _ = thirdoct(fs, big_k, j_bands, mn)
    n = 30
    beta = -15.0
    dyn_range = 40.0

    if fs_signal != fs:
        x = _resample(x, fs_signal, fs).astype(np.float64)
        y = _resample(y, fs_signal, fs).astype(np.float64)

    x, y = remove_silent_frames(x, y, dyn_range, n_frame, n_frame // 2)

    x_hat = stdft(x, n_frame, n_frame // 2, big_k)[:, : big_k // 2 + 1].T
    y_hat = stdft(y, n_frame, n_frame // 2, big_k)[:, : big_k // 2 + 1].T

    big_x = np.sqrt(h @ np.abs(x_hat) ** 2)  # (J, T)
    big_y = np.sqrt(h @ np.abs(y_hat) ** 2)

    t = big_x.shape[1]
    c = 10.0 ** (-beta / 20.0)
    d_interm = []
    for m in range(n, t + 1):
        x_seg = big_x[:, m - n : m]
        y_seg = big_y[:, m - n : m]
        alpha = np.sqrt(np.sum(x_seg**2, axis=1) / np.sum(y_seg**2, axis=1))
        ay_seg = y_seg * alpha[:, None]
        col = np.empty(h.shape[0])
        for j in range(h.shape[0]):
            y_prime = np.minimum(ay_seg[j], x_seg[j] + x_seg[j] * c)
            col[j] = taa_corr(x_seg[j], y_prime)
        d_interm.append(col)
    return float(np.mean(np.stack(d_interm, axis=1)))
