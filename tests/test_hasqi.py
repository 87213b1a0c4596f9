"""HASQI v2 / HASPI v1 behavioral validation (no oracle in this image —
the reference ships only published score tables, Figure/t13)."""

import numpy as np
import pytest

from se_tpu.eval.hasqi import ear_model, hasqi_v2, haspi_v1

FS = 16000


def _speech_like(rng, seconds=1.5):
    """Harmonic source with slow AM + formant-ish band emphasis."""
    n = int(seconds * FS)
    t = np.arange(n) / FS
    f0 = 120.0 + 20.0 * np.sin(2 * np.pi * 2.3 * t)
    phase = 2 * np.pi * np.cumsum(f0) / FS
    x = sum(np.sin(k * phase) / k for k in range(1, 9))
    am = 0.55 + 0.45 * np.sin(2 * np.pi * 3.7 * t + 1.0)
    x = (x * am).astype(np.float64)
    return 0.1 * x / np.sqrt(np.mean(x**2))


@pytest.fixture(scope="module")
def speech():
    return _speech_like(np.random.default_rng(0))


def test_identity_scores_high(speech):
    q = hasqi_v2(speech, speech.copy(), FS)
    p = haspi_v1(speech, speech.copy(), FS)
    assert q > 0.95, q
    assert p > 0.99, p


@pytest.mark.slow
def test_monotone_with_snr(speech):
    rng = np.random.default_rng(1)
    noise = rng.standard_normal(len(speech))
    noise *= np.sqrt(np.mean(speech**2)) / np.sqrt(np.mean(noise**2))
    scores_q, scores_p = [], []
    for snr_db in (30.0, 10.0, 0.0):
        proc = speech + noise * 10 ** (-snr_db / 20.0)
        scores_q.append(hasqi_v2(speech, proc, FS))
        scores_p.append(haspi_v1(speech, proc, FS))
    assert scores_q[0] > scores_q[1] > scores_q[2], scores_q
    assert scores_p[0] >= scores_p[1] >= scores_p[2], scores_p
    # heavy noise is far from transparent
    assert scores_q[2] < 0.6 * scores_q[0]


def test_silence_and_mismatch_robust(speech):
    z = np.zeros_like(speech)
    q = hasqi_v2(speech, z, FS)
    p = haspi_v1(speech, z, FS)
    assert np.isfinite(q) and 0.0 <= q <= 0.2
    assert np.isfinite(p) and 0.0 <= p <= 0.5
    # silent reference: defined and bounded
    assert 0.0 <= hasqi_v2(z, z.copy(), FS) <= 1.0


def test_delay_compensated(speech):
    delayed = np.concatenate([np.zeros(160), speech])[: len(speech)]
    q = hasqi_v2(speech, delayed, FS)
    assert q > 0.8, q


def test_hearing_loss_param(speech):
    rng = np.random.default_rng(2)
    proc = speech + 0.1 * rng.standard_normal(len(speech)) * np.sqrt(
        np.mean(speech**2))
    hl = np.array([20.0, 25.0, 30.0, 40.0, 50.0, 50.0])
    q_nh = hasqi_v2(speech, proc, FS)
    q_hi = hasqi_v2(speech, proc, FS, hl=hl)
    assert np.isfinite(q_hi) and 0.0 <= q_hi <= 1.0
    assert q_hi != q_nh  # audiogram changes the model


def test_ear_model_shapes(speech):
    ref_db, proc_db, ref_bm, proc_bm, cfs = ear_model(speech, speech, FS)
    assert ref_db.shape == proc_db.shape
    assert ref_db.shape[0] == 32 == len(cfs)
    assert ref_bm.shape[0] == 32
    assert np.all(np.diff(cfs) > 0)
    assert cfs[0] >= 75.0 and cfs[-1] <= 8001.0


# Table C (BASELINE.md) reports rows for hearing-loss profiles; these mirror
# the standard audiogram shapes used there (250..6000 Hz, dB HL).
_MILD = np.array([10.0, 15.0, 20.0, 25.0, 30.0, 35.0])
_MODERATE = np.array([30.0, 35.0, 40.0, 45.0, 50.0, 55.0])


@pytest.mark.parametrize("hl,level1", [(_MILD, 65.0), (_MODERATE, 85.0)],
                         ids=["mild", "moderate"])
@pytest.mark.slow
def test_monotone_with_snr_under_hearing_loss(speech, hl, level1):
    """The quality ordering must survive an impaired ear model. Moderate
    loss is presented at 85 dB (a 65 dB signal is genuinely inaudible
    through a 55 dB loss — the model correctly scores it 0)."""
    rng = np.random.default_rng(3)
    noise = rng.standard_normal(len(speech))
    noise *= np.sqrt(np.mean(speech**2)) / np.sqrt(np.mean(noise**2))
    scores = [hasqi_v2(speech, speech + noise * 10 ** (-snr / 20.0), FS,
                       hl=hl, level1=level1)
              for snr in (30.0, 10.0, 0.0)]
    assert scores[0] > scores[1] > scores[2], scores
    q_id = hasqi_v2(speech, speech.copy(), FS, hl=hl, level1=level1)
    assert q_id > 0.9, q_id


def test_mild_vs_moderate_profiles_differ(speech):
    rng = np.random.default_rng(4)
    noise = rng.standard_normal(len(speech))
    noise *= np.sqrt(np.mean(speech**2)) / np.sqrt(np.mean(noise**2))
    proc = speech + noise * 10 ** (-15.0 / 20.0)
    q_mild = hasqi_v2(speech, proc, FS, hl=_MILD)
    q_mod = hasqi_v2(speech, proc, FS, hl=_MODERATE)
    p_mild = haspi_v1(speech, proc, FS, hl=_MILD)
    p_mod = haspi_v1(speech, proc, FS, hl=_MODERATE)
    for v in (q_mild, q_mod, p_mild, p_mod):
        assert np.isfinite(v) and 0.0 <= v <= 1.0
    assert q_mild != q_mod


def test_ihc_adaptation_onset_overshoot():
    """eb_IHCadapt behavioral pin (VERDICT r2 item 7): a step envelope
    (rapid onset) overshoots to ~delta x the steady-state response, decays
    monotonically back, and the steady state equals the input level; a
    slowly-ramped envelope produces no such overshoot."""
    from se_tpu.eval.hasqi import _FS, _ihc_adapt

    n = int(_FS)  # 1 s
    step = np.full(n, 40.0)
    y, _ = _ihc_adapt(step, np.zeros(n), delta=2.0)
    assert 1.8 < y.max() / y[-1] < 2.05  # onset ~ delta x steady state
    assert abs(y[-1] - 40.0) < 1e-6  # adaptation asymptote = input
    assert np.all(np.diff(y[10:]) <= 1e-9)  # monotone decay after onset

    ramp = np.linspace(0.0, 40.0, n)  # slow onset: no overshoot
    yr, _ = _ihc_adapt(ramp, np.zeros(n), delta=2.0)
    assert yr.max() < 1.15 * 40.0

    # the BM path gets the same instantaneous gain
    bm = np.ones(n)
    y2, bm2 = _ihc_adapt(step, bm, delta=2.0)
    np.testing.assert_allclose(bm2, (y2 + 1e-30) / (step + 1e-30))
