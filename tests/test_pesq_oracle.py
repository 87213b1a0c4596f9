"""Cross-validation of se_tpu/eval/pesq.py against a literal numpy
transliteration of the reference pesq.m (VERDICT r1 item 1 — the highest
leverage validation gap: every headline parity claim is measured in PESQ).

Oracle: tests/matlab_pesq.py (<- DeepXi/deepxi/pesq.m:1-2707).
Agreement target from the verdict was 0.05 MOS; measured agreement is
~1e-9 MOS across the whole condition matrix (same algorithm, vectorized
differently), asserted here at 1e-6.
"""

import numpy as np
import pytest

from matlab_pesq import pesq_matlab
from test_metric_oracles import degrade, speechlike

from se_tpu.eval.pesq import pesq as prod_pesq


def _conditions(fs, seed=2):
    x = speechlike(fs * 4, fs, seed=seed) * 0.3
    rng = np.random.default_rng(3)
    d = int(0.032 * fs)
    return {
        "snr10": (x, degrade(x, 10, seed=10)),
        "snr40": (x, degrade(x, 40, seed=40)),
        "delay32ms": (x, np.concatenate([np.zeros(d), x[:-d]])
                      + 1e-4 * rng.standard_normal(len(x))),
        "clipped": (x, np.clip(degrade(x, 25, seed=9), -0.15, 0.15)),
        "lowpass": (x, np.convolve(degrade(x, 20, seed=4),
                                   np.ones(7) / 7, mode="same")),
    }


def test_pesq_wb_matches_matlab_oracle_one_condition():
    """Quick-tier representative: one wideband condition."""
    fs = 16000
    x, y = _conditions(fs)["snr40"]
    oracle = pesq_matlab(x, y, fs)[0]
    prod = prod_pesq(x, y, fs)
    assert abs(prod - oracle) < 1e-6, (prod, oracle)


@pytest.mark.slow
@pytest.mark.parametrize("fs", [16000, 8000])
def test_pesq_matches_matlab_oracle_matrix(fs):
    for name, (x, y) in _conditions(fs).items():
        oracle = pesq_matlab(x, y, fs)
        prod = prod_pesq(x, y, fs)
        if fs == 16000:
            o, p = oracle[0], prod
        else:
            o, p = oracle[1], prod[1]
        assert abs(p - o) < 1e-6, (fs, name, p, o)


def test_pesq_identity_is_max():
    fs = 16000
    x = speechlike(fs * 3, fs, seed=7) * 0.3
    oracle = pesq_matlab(x, x, fs)[0]
    prod = prod_pesq(x, x, fs)
    assert abs(prod - oracle) < 1e-6
    assert 4.5 < prod < 4.7  # known P.862.2 identity maximum ~4.64


def test_pesq_nb_returns_raw_and_mos_lqo():
    fs = 8000
    x = speechlike(fs * 3, fs, seed=8) * 0.3
    y = degrade(x, 30, seed=1)
    o_raw, o_lqo = pesq_matlab(x, y, fs)
    p = prod_pesq(x, y, fs)
    assert abs(p[0] - o_raw) < 1e-6
    assert abs(p[1] - o_lqo) < 1e-6
    # P.862.1 mapping is monotone: identity > degraded
    assert pesq_matlab(x, x, fs)[1] > o_lqo
