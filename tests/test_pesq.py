"""PESQ behavioral validation (no reference PESQ binary in this image; see
se_tpu/eval/pesq.py docstring for the validation scope)."""

import numpy as np
import pytest

from se_tpu.eval.pesq import pesq

FS = 16000


@pytest.fixture(scope="module")
def clean():
    t = np.arange(4 * FS) / FS
    f0 = 130 + 40 * np.sin(2 * np.pi * 0.8 * t)
    phase = 2 * np.pi * np.cumsum(f0) / FS
    sig = sum(np.sin(k * phase) / k for k in range(1, 20))
    env = np.clip(np.sin(2 * np.pi * 1.7 * t), 0, None)
    return (sig * env * 0.2).astype(np.float64)


def _shaped_noise(clean, rng):
    white = rng.standard_normal(len(clean))
    spec = np.abs(np.fft.rfft(clean))
    shaped = np.fft.irfft(np.fft.rfft(white) * spec / spec.max(), len(clean))
    return shaped / np.sqrt(np.mean(shaped**2) + 1e-12)


def test_identity_is_algorithm_maximum(clean):
    # P.862.2 mapping of pesq_mos=4.5 gives 4.6438...
    assert abs(pesq(clean, clean, FS) - 4.644) < 2e-3


def test_level_invariance(clean):
    assert abs(pesq(clean, clean * 0.5, FS) - 4.644) < 2e-3


def test_monotone_in_snr(clean, rng):
    shaped = _shaped_noise(clean, rng)
    scores = []
    for snr in (40, 30, 20, 10):
        scale = np.sqrt(np.mean(clean**2)) / (10 ** (snr / 20))
        scores.append(pesq(clean, clean + shaped * scale, FS))
    assert all(a > b for a, b in zip(scores, scores[1:])), scores
    assert scores[0] > 3.0 and scores[-1] < 2.0


def test_constant_delay_realigned(clean, rng):
    # add a touch of noise so the signal is aperiodic: the utterance aligner
    # is pitch-period-ambiguous on perfectly periodic tones (as is the
    # reference algorithm)
    ref = clean + 0.01 * _shaped_noise(clean, rng)
    # delay WITHOUT truncation (truncating deletes real tail content, which
    # is genuine disturbance); degraded may be longer than the reference
    delayed = np.concatenate([np.zeros(800), ref])
    # without realignment an 800-sample shift scores ~1.0
    assert pesq(ref, delayed, FS) > 4.3


def test_narrowband_mode(clean):
    nb = clean[::2]  # crude 8k decimation is fine for a smoke check
    pesq_mos, mos_lqo = pesq(nb, nb, 8000)
    assert 4.4 < pesq_mos <= 4.65
    assert 4.4 < mos_lqo < 4.6
