"""Cross-validation of production metrics against literal transliterations
of the reference MATLAB scorers (VERDICT r1 items 1/3).

Oracles: tests/matlab_stoi.py  (<- DeepXi/deepxi/stoi.m:1-188)
         tests/matlab_composite.py (<- DeepXi/deepxi/composite.m:1-485)
         tests/matlab_pesq.py  (<- DeepXi/deepxi/pesq.m:1-2707)

Production: se_tpu/eval/metrics.py (stoi), se_tpu/eval/composite.py,
se_tpu/eval/pesq.py.
"""

import numpy as np
import pytest

from matlab_composite import composite_matlab
from matlab_stoi import stoi_matlab

from se_tpu.eval.composite import composite, llr_wss_segsnr
from se_tpu.eval.metrics import stoi


def speechlike(n, fs, seed=0):
    r = np.random.default_rng(seed)
    t = np.arange(n) / fs
    f0 = 110 + 40 * np.sin(2 * np.pi * 1.7 * t + r.uniform(0, 6))
    x = np.zeros(n)
    for h in range(1, 10):
        x += np.sin(np.cumsum(2 * np.pi * h * f0 / fs) + r.uniform(0, 6)) / h
    env = np.clip(np.sin(2 * np.pi * 2.9 * t + r.uniform(0, 6)), 0, None) ** 2
    return (x * (env + 0.08) * 0.3).astype(np.float64)


def degrade(x, snr_db, seed=1):
    r = np.random.default_rng(seed)
    nz = r.standard_normal(len(x))
    nz *= np.sqrt(np.sum(x**2) / np.sum(nz**2)) * 10 ** (-snr_db / 20)
    return x + nz


@pytest.mark.parametrize("fs", [10000, 16000])
@pytest.mark.parametrize("snr_db", [0, 10, 40])
def test_stoi_matches_matlab_oracle(fs, snr_db):
    x = speechlike(fs * 3, fs, seed=snr_db)
    y = degrade(x, snr_db)
    lib = stoi(y, x, fs)
    oracle = stoi_matlab(x, y, fs)
    assert abs(lib - oracle) < 1e-8, (lib, oracle)


def test_stoi_delay_and_filtering_conditions():
    """Conditions beyond additive noise: constant delay, lowpass."""
    fs = 10000
    x = speechlike(fs * 3, fs, seed=5)
    # 5 ms delay
    y = np.concatenate([np.zeros(50), x[:-50]])
    assert abs(stoi(y, x, fs) - stoi_matlab(x, y, fs)) < 1e-8
    # crude lowpass via moving average
    y2 = np.convolve(degrade(x, 15), np.ones(9) / 9, mode="same")
    assert abs(stoi(y2, x, fs) - stoi_matlab(x, y2, fs)) < 1e-8


@pytest.mark.parametrize("snr_db", [0, 10, 30])
def test_composite_matches_matlab_oracle(snr_db):
    fs = 16000
    x = speechlike(fs * 2, fs, seed=snr_db + 10)
    y = degrade(x, snr_db)
    o_csig, o_cbak, o_covl, o_llr, o_wss, o_seg = composite_matlab(
        x, y, fs, pesq_mos=2.5)
    llr_mean, wss_mean, seg = llr_wss_segsnr(x, y, fs)
    csig, cbak, covl = composite(x, y, fs, pesq_mos=2.5)
    np.testing.assert_allclose(llr_mean, o_llr, rtol=1e-12)
    np.testing.assert_allclose(wss_mean, o_wss, rtol=1e-12)
    np.testing.assert_allclose(seg, o_seg, rtol=1e-12)
    np.testing.assert_allclose([csig, cbak, covl],
                               [o_csig, o_cbak, o_covl], rtol=1e-12)


def test_composite_unequal_lengths_truncate():
    fs = 16000
    x = speechlike(fs, fs, seed=3)
    y = degrade(x, 10)[: len(x) - 137]
    o = composite_matlab(x, y, fs, pesq_mos=2.0)
    c = composite(x, y, fs, pesq_mos=2.0)
    np.testing.assert_allclose(c, o[:3], rtol=1e-12)
