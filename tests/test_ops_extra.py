"""Mel, STDCT, and feature utility tests."""

import numpy as np
import pytest
import scipy.fft

import jax.numpy as jnp

from se_tpu.ops.mel import apply_inv_mel, apply_mel, inv_mel_filter, mel_filter
from se_tpu.ops.stdct import _dct2_matrix, inverse_stdct, stdct
from se_tpu.ops import features as F


def test_mel_filter_shape_and_coverage():
    m = mel_filter(960, num_mels=128, sr=48000)
    assert m.shape == (128, 513)
    # each filter is nonnegative and unimodal-ish; bank covers mid spectrum
    assert np.all(m >= 0)
    covered = m.sum(axis=0)
    assert np.all(covered[5:-5] > 0)


def test_mel_inverse_approx(rng):
    filt = mel_filter(512, num_mels=80, num_bins=257)
    inv = inv_mel_filter(512, num_mels=80, num_bins=257)
    spec = np.abs(rng.standard_normal((4, 10, 257))).astype(np.float32)
    mel = apply_mel(jnp.asarray(spec), jnp.asarray(filt))
    rec = apply_inv_mel(mel, jnp.asarray(inv))
    # pinv round trip reproduces the smoothed spectrum scale
    assert np.asarray(rec).shape == spec.shape


def test_dct2_matches_scipy(rng):
    n = 64
    x = rng.standard_normal((3, n)).astype(np.float32)
    want = scipy.fft.dct(x, type=2, axis=-1)
    got = x @ _dct2_matrix(n)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_stdct_roundtrip(rng):
    n = 8192
    x = rng.standard_normal((2, n)).astype(np.float32) * 0.1
    coeffs = stdct(jnp.asarray(x), 512, 256, window="hann")
    y = np.asarray(inverse_stdct(coeffs, 512, 256, window=None))
    # dct2 . dct3 = 2N; single hann OLA at 50% sums to 1 -> scale 2N
    scale = 2.0 * 512
    np.testing.assert_allclose(y[:, 512:-512] / scale, x[:, 512 : y.shape[1] - 512],
                               atol=1e-3)


def test_feature_utils(rng):
    y = rng.standard_normal(16000).astype(np.float32) * 0.1
    scaled, rms, scalar = F.tailor_db_fs(y, -25)
    assert abs(20 * np.log10(np.sqrt(np.mean(scaled**2))) + 25) < 0.1
    yn, s = F.norm_amplitude(y)
    assert np.max(np.abs(yn)) <= 1.0
    assert not F.is_clipped(yn * 0.9)
    assert F.is_clipped(np.ones(10))
    assert 0.0 <= F.activity_detector(y) <= 1.0
    crop = F.subsample(y, 4000, rng=np.random.default_rng(0))
    assert len(crop) == 4000
    a, b = F.aligned_subsample(y, y * 2, 4000, rng=np.random.default_rng(0))
    np.testing.assert_allclose(b, a * 2)


def test_splice_and_overlap_cat(rng):
    x = jnp.asarray(rng.standard_normal((2, 10, 4)).astype(np.float32))
    sp = F.splice_feature(x, lctx=1, rctx=1, op="cat")
    assert sp.shape == (2, 10, 12)
    np.testing.assert_allclose(np.asarray(sp[:, 0, :4]), np.asarray(x[:, 0]))

    chunks = [jnp.ones((2, 8)), jnp.ones((2, 8)) * 3]
    out = F.overlap_cat(chunks)
    assert out.shape == (2, 12)
    np.testing.assert_allclose(np.asarray(out[:, 4:8]), 2.0)


def test_speed_perturb_filter():
    w = F.speed_perturb_filter(16000, 17600)
    assert w.ndim == 3 and np.all(np.isfinite(w))


def test_pre_emphasis(rng):
    x = jnp.asarray(rng.standard_normal((2, 100)).astype(np.float32))
    y = F.pre_emphasis(x, 0.97)
    np.testing.assert_allclose(
        np.asarray(y[:, 1:]), np.asarray(x[:, 1:] - 0.97 * x[:, :-1]),
        rtol=1e-6)



class TestPhaseSplitTconv:
    """phase_split_tconv_f must match the lhs_dilation formulation exactly
    for every stride-(1,2) decoder geometry in the zoo."""

    @pytest.mark.parametrize("kh,kw,pw,opw,ph,oph", [
        (2, 5, 2, 1, 0, 0),   # uformer CConvDec/RConvDec
        (2, 3, 0, 1, 0, 0),
        (1, 3, 1, 1, 0, 0),
        (3, 5, 2, 1, 1, 0),
        (2, 4, 1, 0, 0, 0),
    ])
    def test_matches_dilated(self, rng, kh, kw, pw, opw, ph, oph):
        import jax.numpy as jnp
        from jax import lax

        from se_tpu.nn.conv import phase_split_tconv_f

        b, t, f, cin, cout = 2, 7, 6, 5, 4
        x = jnp.asarray(rng.standard_normal((b, t, f, cin)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((kh, kw, cin, cout)),
                        jnp.float32)
        got = phase_split_tconv_f(x, k, ph, pw, oph, opw)
        want = lax.conv_general_dilated(
            x, jnp.flip(k, axis=(0, 1)),
            window_strides=(1, 1),
            padding=[(kh - 1 - ph, kh - 1 - ph + oph),
                     (kw - 1 - pw, kw - 1 - pw + opw)],
            lhs_dilation=(1, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        assert got is not None
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)

    def test_odd_output_width_falls_back(self, rng):
        import jax.numpy as jnp

        from se_tpu.nn.conv import phase_split_tconv_f

        x = jnp.zeros((1, 3, 6, 2), jnp.float32)
        k = jnp.zeros((1, 3, 2, 2), jnp.float32)
        # kw=3, pw=0, opw=0 -> W_out = 2*6-2+3 = 13 (odd) -> None
        assert phase_split_tconv_f(x, k, 0, 0, 0, 0) is None
