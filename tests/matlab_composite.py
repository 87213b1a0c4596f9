"""Test-only oracle: literal numpy transliteration of the reference
composite measures (LLR / WSS / SNRseg and the CSIG/CBAK/COVL regressions).

Source: /root/reference/DeepXi/deepxi/composite.m:1-485 (Hu & Loizou).
Mirrors the MATLAB line by line, quirks included:
- frame window 0.5*(1-cos(2*pi*(1:N)/(N+1)))  (MATLAB hanning, no zeros),
- num_frames = floor(len/skip - win/skip),
- WSS right-search local peak records energy(n-1) (composite.m:244,260) —
  NOT the actual local maximum energy(n); the left search records
  energy(n+1) (composite.m:250,266),
- eps added to both inputs up front (composite.m:44-45),
- segmental SNR: 10*log10(sig/(noise+eps)+eps), clamped [-10, 35].

Production implementation: se_tpu/eval/composite.py, validated against this
in tests/test_metric_oracles.py.
"""

from __future__ import annotations

import numpy as np

_EPS = np.finfo(np.float64).eps

_CENT_FREQ = [
    50.0, 120.0, 190.0, 260.0, 330.0, 400.0, 470.0, 540.0, 617.372,
    703.378, 798.717, 904.128, 1020.38, 1148.30, 1288.72, 1442.54,
    1610.70, 1794.16, 1993.93, 2211.08, 2446.71, 2701.97, 2978.04,
    3276.17, 3597.63,
]
_BANDWIDTH = [
    70.0, 70.0, 70.0, 70.0, 70.0, 70.0, 70.0, 77.3724, 86.0056, 95.3398,
    105.411, 116.256, 127.914, 140.423, 153.823, 168.154, 183.457,
    199.776, 217.153, 235.631, 255.255, 276.072, 298.126, 321.465,
    346.136,
]


def _window(n: int) -> np.ndarray:
    k = np.arange(1, n + 1, dtype=np.float64)
    return 0.5 * (1.0 - np.cos(2.0 * np.pi * k / (n + 1)))


def _num_frames(length: int, winlength: int, skiprate: int) -> int:
    return int(np.floor(length / skiprate - winlength / skiprate))


def wss_matlab(clean: np.ndarray, processed: np.ndarray,
               fs: int) -> np.ndarray:
    """composite.m:85-312."""
    winlength = round(30 * fs / 1000)
    skiprate = int(np.floor(winlength / 4))
    max_freq = fs / 2
    num_crit = 25
    n_fft = 2 ** int(np.ceil(np.log2(2 * winlength)))
    n_fftby2 = n_fft // 2
    kmax, klocmax = 20.0, 1.0
    bw_min = _BANDWIDTH[0]
    min_factor = np.exp(-30.0 / (2.0 * 2.303))

    crit_filter = np.zeros((num_crit, n_fftby2))
    j = np.arange(n_fftby2, dtype=np.float64)
    for i in range(num_crit):
        f0 = (_CENT_FREQ[i] / max_freq) * n_fftby2
        bw = (_BANDWIDTH[i] / max_freq) * n_fftby2
        norm_factor = np.log(bw_min) - np.log(_BANDWIDTH[i])
        filt = np.exp(-11.0 * (((j - np.floor(f0)) / bw) ** 2) + norm_factor)
        crit_filter[i] = filt * (filt > min_factor)

    num_frames = _num_frames(len(clean), winlength, skiprate)
    window = _window(winlength)
    distortion = np.empty(num_frames)
    start = 0
    for fc in range(num_frames):
        cf = clean[start : start + winlength] * window
        pf = processed[start : start + winlength] * window
        c_spec = np.abs(np.fft.fft(cf, n_fft)) ** 2
        p_spec = np.abs(np.fft.fft(pf, n_fft)) ** 2
        c_e = np.array([np.sum(c_spec[:n_fftby2] * crit_filter[i])
                        for i in range(num_crit)])
        p_e = np.array([np.sum(p_spec[:n_fftby2] * crit_filter[i])
                        for i in range(num_crit)])
        c_e = 10.0 * np.log10(np.maximum(c_e, 1e-10))
        p_e = 10.0 * np.log10(np.maximum(p_e, 1e-10))
        c_slope = c_e[1:] - c_e[:-1]
        p_slope = p_e[1:] - p_e[:-1]

        def loc_peak(energy, slope):
            # composite.m:235-268 — 0-based port; right search records
            # energy[n-1] (the MATLAB quirk), left search energy[n+1].
            peaks = np.empty(num_crit - 1)
            for i in range(num_crit - 1):
                n = i
                if slope[i] > 0:
                    while n < num_crit - 1 and slope[n] > 0:
                        n += 1
                    peaks[i] = energy[n - 1]
                else:
                    while n > -1 and slope[n] <= 0:
                        n -= 1
                    peaks[i] = energy[n + 1]
            return peaks

        c_peak = loc_peak(c_e, c_slope)
        p_peak = loc_peak(p_e, p_slope)
        w_c = (kmax / (kmax + c_e.max() - c_e[:-1])) * (
            klocmax / (klocmax + c_peak - c_e[:-1]))
        w_p = (kmax / (kmax + p_e.max() - p_e[:-1])) * (
            klocmax / (klocmax + p_peak - p_e[:-1]))
        w = (w_c + w_p) / 2.0
        distortion[fc] = np.sum(w * (c_slope - p_slope) ** 2) / np.sum(w)
        start += skiprate
    return distortion


def _lpcoeff(frame: np.ndarray, order: int):
    """composite.m:384-413."""
    n = len(frame)
    r = np.array([np.sum(frame[: n - k] * frame[k : n])
                  for k in range(order + 1)])
    a = np.ones(order)
    e = r[0]
    rcoeff = np.empty(order)
    for i in range(1, order + 1):
        a_past = a[: i - 1].copy()
        sum_term = np.sum(a_past * r[i - 1 : 0 : -1]) if i > 1 else 0.0
        rcoeff[i - 1] = (r[i] - sum_term) / e
        a[i - 1] = rcoeff[i - 1]
        if i > 1:
            a[: i - 1] = a_past - rcoeff[i - 1] * a_past[::-1]
        # MATLAB composite.m:408 is (1-rcoeff(i)*rcoeff(i))*E(i); x*x and
        # x**2 (libm pow) can differ by 1 ulp, which this near-singular
        # recursion amplifies to ~1e-2 in the LPC coefficients.
        e = (1.0 - rcoeff[i - 1] * rcoeff[i - 1]) * e
    return r, rcoeff, np.concatenate(([1.0], -a))


def llr_matlab(clean: np.ndarray, processed: np.ndarray,
               fs: int) -> np.ndarray:
    """composite.m:315-381."""
    from scipy.linalg import toeplitz

    winlength = round(30 * fs / 1000)
    skiprate = int(np.floor(winlength / 4))
    order = 10 if fs < 10000 else 16
    num_frames = _num_frames(len(clean), winlength, skiprate)
    window = _window(winlength)
    distortion = np.empty(num_frames)
    start = 0
    for fc in range(num_frames):
        cf = clean[start : start + winlength] * window
        pf = processed[start : start + winlength] * window
        r_c, _, a_c = _lpcoeff(cf, order)
        _, _, a_p = _lpcoeff(pf, order)
        rmat = toeplitz(r_c)
        distortion[fc] = np.log((a_p @ rmat @ a_p) / (a_c @ rmat @ a_c))
        start += skiprate
    return distortion


def snr_matlab(clean: np.ndarray, processed: np.ndarray, fs: int):
    """composite.m:418-485: (overall_snr, per-frame segmental_snr)."""
    overall = 10.0 * np.log10(np.sum(clean**2)
                              / np.sum((clean - processed) ** 2))
    winlength = round(30 * fs / 1000)
    skiprate = int(np.floor(winlength / 4))
    num_frames = _num_frames(len(clean), winlength, skiprate)
    window = _window(winlength)
    seg = np.empty(num_frames)
    start = 0
    for fc in range(num_frames):
        cf = clean[start : start + winlength] * window
        pf = processed[start : start + winlength] * window
        sig = np.sum(cf**2)
        noise = np.sum((cf - pf) ** 2)
        val = 10.0 * np.log10(sig / (noise + _EPS) + _EPS)
        seg[fc] = min(max(val, -10.0), 35.0)
        start += skiprate
    return overall, seg


def composite_matlab(clean: np.ndarray, processed: np.ndarray, fs: int,
                     pesq_mos: float):
    """composite.m:1-78 with PESQ supplied externally. Returns
    (csig, cbak, covl, llr_mean, wss_dist, segSNR)."""
    alpha = 0.95
    n = min(len(clean), len(processed))
    data1 = np.asarray(clean[:n], np.float64) + _EPS
    data2 = np.asarray(processed[:n], np.float64) + _EPS

    wss_dist_vec = np.sort(wss_matlab(data1, data2, fs))
    wss_dist = float(np.mean(
        wss_dist_vec[: round(len(wss_dist_vec) * alpha)]))
    llrs = np.sort(llr_matlab(data1, data2, fs))
    llr_mean = float(np.mean(llrs[: round(len(llrs) * alpha)]))
    _, segsnr_dist = snr_matlab(data1, data2, fs)
    seg_snr = float(np.mean(segsnr_dist))

    csig = 3.093 - 1.029 * llr_mean + 0.603 * pesq_mos - 0.009 * wss_dist
    csig = min(5.0, max(1.0, csig))
    cbak = 1.634 + 0.478 * pesq_mos - 0.007 * wss_dist + 0.063 * seg_snr
    cbak = min(5.0, max(1.0, cbak))
    covl = 1.594 + 0.805 * pesq_mos - 0.512 * llr_mean - 0.007 * wss_dist
    covl = min(5.0, max(1.0, covl))
    return csig, cbak, covl, llr_mean, wss_dist, seg_snr
