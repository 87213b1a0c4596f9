"""DeepXi components: gains vs scipy oracles, xi-map round trips, ResNetV2
shape/param-count (published 1.95 M, BASELINE.md Table D)."""

import numpy as np
import os
import jax
import jax.numpy as jnp
import pytest
import scipy.special as spsp

from se_tpu.eval import gains
from se_tpu.models.deepxi import (
    DeepXi,
    XiMap,
    compute_xi_stats,
    enhance,
    instantaneous_xi,
    polar_analysis,
)


def _xi_gamma(rng, n=1000):
    xi = np.abs(rng.standard_normal(n)).astype(np.float32) * 5 + 1e-3
    gamma = xi + 1.0
    return xi, gamma


def test_mmse_lsa_matches_scipy(rng):
    xi, gamma = _xi_gamma(rng)
    v1 = xi / (1 + xi)
    want = v1 * np.exp(0.5 * spsp.exp1(v1 * gamma))
    got = np.asarray(gains.mmse_lsa(jnp.asarray(xi), jnp.asarray(gamma)))
    np.testing.assert_allclose(got, want, rtol=2e-4)


def test_mmse_stsa_matches_scipy(rng):
    xi, gamma = _xi_gamma(rng)
    nu = xi * gamma / (1 + xi)
    want = (
        (np.sqrt(np.pi) / 2)
        * (np.sqrt(nu) / gamma)
        * np.exp(-nu / 2)
        * ((1 + nu) * spsp.i0(nu / 2) + nu * spsp.i1(nu / 2))
    )
    bad = np.isnan(want) | np.isinf(want)
    want[bad] = (xi / (1 + xi))[bad]
    got = np.asarray(gains.mmse_stsa(jnp.asarray(xi), jnp.asarray(gamma)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-5)


@pytest.mark.parametrize("gtype", ["wf", "srwf", "cwf", "irm", "ibm", "deepmmse"])
def test_simple_gains_finite(rng, gtype):
    xi, gamma = _xi_gamma(rng)
    g = np.asarray(gains.gfunc(jnp.asarray(xi), jnp.asarray(gamma), gtype))
    assert np.all(np.isfinite(g))


@pytest.mark.parametrize("map_type", ["DBNormalCDF", "NormalCDF", "DB",
                                      "Standardise", "MinMaxScaling"])
def test_xi_map_roundtrip(rng, map_type):
    xi_sample = np.abs(rng.standard_normal((500, 257))).astype(np.float32) * 3 + 1e-3
    m = XiMap(map_type)
    m.fit(xi_sample)
    x = jnp.asarray(xi_sample[:32])
    x_bar = np.asarray(m.map(x))
    x_rec = np.asarray(m.inverse(jnp.asarray(x_bar)))
    # CDF maps saturate in float32 beyond ~2.5 sigma; compare the interior.
    interior = (x_bar > 0.02) & (x_bar < 0.98) if "CDF" in map_type else \
        np.ones_like(x_bar, bool)
    np.testing.assert_allclose(x_rec[interior], xi_sample[:32][interior],
                               rtol=5e-2, atol=1e-4)


def test_xi_map_truncated_laplace_roundtrip(rng):
    xi_db = rng.standard_normal((500, 257)).astype(np.float32) * 10
    m = XiMap("DBTruncatedLaplaceCDF", params=(0.0, -40.0, 40.0))
    m.fit(np.power(10.0, xi_db / 10.0))
    x = jnp.asarray(np.power(10.0, xi_db[:8] / 10.0))
    x_rec = np.asarray(m.inverse(m.map(x)))
    interior = (xi_db[:8] > -39) & (xi_db[:8] < 39)
    np.testing.assert_allclose(x_rec[interior], np.asarray(x)[interior],
                               rtol=2e-2)


def test_resnetv2_param_count_and_shapes(rng):
    model = DeepXi()
    x = jnp.asarray(rng.standard_normal((2, 30, 257)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    n_params = sum(p.size for p in jax.tree.leaves(variables["params"]))
    # BASELINE.md Table D: DeepXi 1.95 M parameters
    assert abs(n_params - 1.95e6) / 1.95e6 < 0.02, n_params
    out = model.apply(variables, x)
    assert out.shape == (2, 30, 257)
    assert np.all((np.asarray(out) >= 0) & (np.asarray(out) <= 1))


@pytest.mark.parametrize("unit_type",
                         ["ReLU->LN->W+b", "scale*LN+center->ReLU->W+b"])
def test_rdlnet_shapes_and_causality(rng, unit_type):
    """RDLNet lattice (ref deepxi/network/rdlnet.py): shape, range, and —
    with padding='causal' — strict causality of the full lattice."""
    from se_tpu.models.deepxi import RDLNet

    model = RDLNet(n_outp=33, n_blocks=2, length=5, m_1=32,
                   unit_type=unit_type)
    x = jnp.asarray(rng.standard_normal((2, 24, 33)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = jax.jit(model.apply)(variables, x)
    assert out.shape == (2, 24, 33)
    o = np.asarray(out)
    assert np.all(np.isfinite(o)) and np.all((o >= 0) & (o <= 1))

    # Causality: changing frames >= t must not affect outputs < t.
    t = 13
    x2 = x.at[:, t:].add(
        jnp.asarray(rng.standard_normal((2, 24 - t, 33)).astype(np.float32)))
    out2 = jax.jit(model.apply)(variables, x2)
    np.testing.assert_allclose(np.asarray(out2)[:, :t], o[:, :t],
                               rtol=1e-5, atol=1e-6)


def test_rdlnet_selectable_via_deepxi(rng):
    model = DeepXi(network="RDLNet", n_feat=33)
    x = jnp.asarray(rng.standard_normal((1, 12, 33)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (1, 12, 33)


def test_deepxi_end_to_end_enhance(rng):
    n = 8192
    s = rng.standard_normal(n).astype(np.float32) * 0.1
    d = rng.standard_normal(n).astype(np.float32) * 0.05
    xi_map = XiMap("DBNormalCDF")
    compute_xi_stats([s], [d], xi_map)
    model = DeepXi()
    x = (s + d)[None]
    stms, _ = polar_analysis(jnp.asarray(x))
    variables = model.init(jax.random.PRNGKey(0), stms)
    y = enhance(variables, model, jnp.asarray(x), xi_map, length=n)
    assert y.shape == (1, n)
    assert np.all(np.isfinite(np.asarray(y)))


def test_inp_tgt_family(rng):
    from se_tpu.models.deepxi_inp_tgt import inp_tgt_selector

    n = 8192
    s = rng.standard_normal(n).astype(np.float32) * 0.1
    d = rng.standard_normal(n).astype(np.float32) * 0.05
    x = s + d
    sj, xj = jnp.asarray(s[None]), jnp.asarray(x[None])

    fitted = XiMap("DBNormalCDF")
    compute_xi_stats([s], [d], fitted)
    linear = XiMap("Linear")

    cases = {
        "MagXi": dict(xi_map=fitted),
        "MagGamma": dict(gamma_map=linear),
        "MagXiGamma": dict(xi_map=fitted, gamma_map=linear),
        "MagGain": dict(gain="mmse-lsa"),
        "MagMag": dict(mag_map=linear),
        "MagSMM": dict(),
        "MagPhaXiPha": dict(xi_map=fitted, s_stps_map=linear),
        "STDCTXiCD": dict(xi_map=linear, cd_map=linear),
    }
    for kind, maps in cases.items():
        it = inp_tgt_selector(kind, **maps)
        obs, target = it.example(sj, xj)
        assert np.all(np.isfinite(np.asarray(obs))), kind
        assert np.all(np.isfinite(np.asarray(target))), kind
        feats = it.observation(xj)
        feat0 = feats[0]
        pred = jnp.clip(target, 0.01, 0.99) if kind not in (
            "MagMag", "MagSMM", "MagPhaXiPha", "STDCTXiCD") else target
        aux = feats[1] if len(feats) == 2 else None
        y = it.enhanced_speech(feat0, aux, pred, "mmse-lsa", length=n)
        assert y.shape == (1, n), kind
        assert np.all(np.isfinite(np.asarray(y))), kind


def test_deepxi_normalisation_family(rng):
    """SeqCausal/Seq/Frame layer norms vs a direct numpy transcription of
    DeepXi/deepxi/normalisation.py (including the per-frame-running-mean
    deviation quirk at :57-59 and output seq masking)."""
    from se_tpu.nn import (FrameLayerNorm, SeqCausalLayerNorm, SeqLayerNorm,
                           deepxi_normalisation)

    b, t, f = 3, 11, 7
    x = rng.standard_normal((b, t, f)).astype(np.float32)
    seq_len = np.array([11, 7, 4], np.int32)
    mask = (np.arange(t)[None] < seq_len[:, None]).astype(np.float32)

    m = SeqCausalLayerNorm()
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(seq_len))
    out = np.asarray(m.apply(v, jnp.asarray(x), jnp.asarray(seq_len)))
    den = (np.arange(1, t + 1) * f).astype(np.float32)
    mu = np.cumsum(x.sum(-1), -1) / den  # (B, T)
    sigma = np.cumsum(((x - mu[..., None]) ** 2).sum(-1), -1) / den
    ref = (x - mu[..., None]) / np.sqrt(sigma[..., None] + 1e-12)
    ref *= mask[..., None]
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
    # Causality: frames >= t0 cannot affect outputs < t0.
    x2 = x.copy()
    x2[:, 6:] += rng.standard_normal((b, t - 6, f)).astype(np.float32)
    out2 = np.asarray(m.apply(v, jnp.asarray(x2), jnp.asarray(seq_len)))
    np.testing.assert_allclose(out2[:, :6], out[:, :6], rtol=1e-5, atol=1e-6)

    m = SeqLayerNorm()
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(seq_len))
    out = np.asarray(m.apply(v, jnp.asarray(x), jnp.asarray(seq_len)))
    den2 = mask.sum(1)[:, None, None] * f
    mean = (x * mask[..., None]).sum((1, 2))[:, None, None] / den2
    var = (((x - mean) ** 2) * mask[..., None]).sum((1, 2))[:, None, None] / den2
    ref = (x - mean) / np.sqrt(var + 1e-12) * mask[..., None]
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    m = FrameLayerNorm()
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = np.asarray(m.apply(v, jnp.asarray(x)))
    mu = x.mean(-1, keepdims=True)
    ref = (x - mu) / np.sqrt(x.var(-1, keepdims=True) + 1e-12)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    assert isinstance(deepxi_normalisation("FrameLayerNorm"), FrameLayerNorm)
    with pytest.raises(ValueError):
        deepxi_normalisation("NoSuchNorm")


@pytest.mark.parametrize("causal", [True, False])
def test_mhanet_masks_padded_frames(rng, causal):
    """MHANet excludes zero-padded frames from attention
    (ref attention.py:189-246): a zero tail must not change valid-frame
    outputs relative to the unpadded sequence."""
    from se_tpu.models.deepxi import MHANet

    model = MHANet(n_outp=17, d_model=32, n_blocks=2, n_heads=4,
                   causal=causal)
    t = 15
    x = jnp.asarray(rng.standard_normal((2, t, 17)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    x_pad = jnp.concatenate([x, jnp.zeros((2, 6, 17), jnp.float32)], axis=1)
    out_pad = model.apply(variables, x_pad)
    np.testing.assert_allclose(np.asarray(out_pad)[:, :t], np.asarray(out),
                               rtol=2e-5, atol=1e-6)


def test_prelim_toy_trainer_converges():
    """Prelim sanity-check (ref deepxi/prelim.py:18-98): a small ResNet fits
    the constant 5-value frame target from random inputs under BCE with
    temporal masks."""
    from se_tpu.models.deepxi_driver import Prelim

    prelim = Prelim(n_feat=8, network="ResNet", n_blocks=4, d_model=32,
                    d_f=16)
    target, pred = prelim.train(mbatch_size=8, max_epochs=10, batch_size=16,
                                max_seq_len=24, min_seq_len=16)
    assert pred.shape == (8,)
    np.testing.assert_allclose(pred[:5], target[:5], atol=0.15)

    with pytest.raises(ValueError):
        Prelim(n_feat=3)


def test_eval_example_snr_check(tmp_path, rng):
    """eval_example (ref model.py:182-201): dumps the minibatch .mat files
    and reports the actual mixing SNR of each pair."""
    from se_tpu.models.deepxi_driver import DeepXiDriver, snr_db
    from se_tpu.models.deepxi_inp_tgt import n_frames

    n = 8192
    clean = (rng.standard_normal((2, n)) * 0.1).astype(np.float32)
    noise = rng.standard_normal((2, n)).astype(np.float32)
    # Scale noise for exact target SNRs of 0 and 5 dB.
    for i, snr in enumerate([0.0, 5.0]):
        alpha = np.sqrt(np.mean(clean[i] ** 2) /
                        (np.mean(noise[i] ** 2) * 10 ** (snr / 10)))
        noise[i] *= alpha
    noisy = clean + noise

    drv = DeepXiDriver(data_path=str(tmp_path / "data"), ver="test")
    drv.xi_map.mu = np.zeros(257, np.float32)
    drv.xi_map.sigma = np.ones(257, np.float32)
    frames = [n_frames(n), n_frames(n)]
    snrs = drv.eval_example(clean, noisy, frames, out_dir=str(tmp_path))
    np.testing.assert_allclose(snrs, [0.0, 5.0], atol=1e-3)
    for f in ("inp_batch.mat", "tgt_batch.mat", "seq_mask_batch.mat"):
        assert (tmp_path / f).is_file()
    assert abs(snr_db(clean[0], noise[0])) < 1e-3


def test_deepxi_driver_end_to_end(tmp_path, rng):
    from se_tpu.data.wav import write_wav
    from se_tpu.models.deepxi_driver import DeepXiDriver

    n = 8192
    clean = (rng.standard_normal((2, n)) * 0.1).astype(np.float32)
    noise = (rng.standard_normal((2, n)) * 0.05).astype(np.float32)
    noisy = clean + noise

    drv = DeepXiDriver(data_path=str(tmp_path / "data"), ver="test")
    drv.sample_stats(list(clean), list(noise))
    assert drv.load_stats()
    hist = drv.train([(clean, noisy)], epochs=2, log_every=1)
    assert len(hist) >= 2 and np.isfinite(hist[-1][1])

    mix_dir = tmp_path / "mix"
    out_dir = tmp_path / "out"
    ref_dir = tmp_path / "ref"
    for d in (mix_dir, ref_dir):
        d.mkdir()
    for i in range(2):
        write_wav(str(mix_dir / f"u{i}.wav"), noisy[i], 16000)
        write_wav(str(ref_dir / f"u{i}.wav"), clean[i], 16000)
    drv.infer_dir(str(mix_dir), str(out_dir))
    assert sorted(os.listdir(out_dir)) == ["u0.wav", "u1.wav"]
    avg = drv.test_dir(str(out_dir), str(ref_dir), str(tmp_path / "csv"))
    assert np.isfinite(avg["si_sdr"])


def test_deepxi_args_surface():
    """Typed flag surface (ref args_resnet.py:31-135) constructs drivers
    with network kwargs threaded through (VERDICT r1 missing item 6)."""
    import jax
    import jax.numpy as jnp
    from se_tpu.models.deepxi_driver import DeepXiArgs, DeepXiDriver

    args = DeepXiArgs(network_type="ResNetV2", d_model=32, n_blocks=2,
                      d_f=8, k=3, max_d_rate=2, map_type="DBNormalCDF")
    drv = DeepXiDriver.from_args(args)
    x = jnp.zeros((1, 10, 257), jnp.float32)
    variables = drv.model.init(jax.random.PRNGKey(0), x)
    out = drv.model.apply(variables, x)
    assert out.shape == (1, 10, 257)
    # a small d_model must actually shrink the network
    from se_tpu.utils.profiling import num_params
    assert num_params(variables["params"]) < 200_000

    args2 = DeepXiArgs(network_type="MHANet", d_model=32, n_blocks=1,
                      causal=True)
    drv2 = DeepXiDriver.from_args(args2)
    variables2 = drv2.model.init(jax.random.PRNGKey(0), x)
    assert drv2.model.apply(variables2, x).shape == (1, 10, 257)
