"""Data pipeline, wav I/O, metrics, and the unified enhance driver."""

import json
import os

import numpy as np
import pytest
import torch

import jax

from se_tpu.data import ManifestDataset, read_wav, resample, rms_gain, write_wav
from se_tpu.eval import metrics
from se_tpu.eval.enhance import enhance_waveform
from se_tpu.models import get_model
from tests.reference_oracle import load_reference_module, state_dict_numpy


def test_wav_roundtrip(tmp_path, rng):
    x = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    p = str(tmp_path / "a.wav")
    write_wav(p, x, 16000)
    y, sr = read_wav(p)
    assert sr == 16000
    np.testing.assert_allclose(y, x, atol=1.0 / 32768)
    p32 = str(tmp_path / "b.wav")
    write_wav(p32, x, 16000, bits=32)
    y32, _ = read_wav(p32)
    np.testing.assert_allclose(y32, x, atol=0)


def test_resample_tone():
    t = np.arange(48000) / 48000.0
    x = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    y = resample(x, 48000, 16000)
    assert len(y) == 16000
    # 440 Hz tone survives resampling
    spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    assert abs(np.argmax(spec) - 440) <= 2


def test_manifest_dataset(tmp_path, rng):
    mix_dir = tmp_path / "mix"
    clean_dir = tmp_path / "clean"
    os.makedirs(mix_dir)
    os.makedirs(clean_dir)
    ids = []
    for spk in range(3):
        for utt in range(2):
            uid = f"spk{spk}_{utt}"
            n = 16000 + 997 * spk
            clean = (rng.standard_normal(n) * 0.1).astype(np.float32)
            noise = (rng.standard_normal(n) * 0.05).astype(np.float32)
            write_wav(str(clean_dir / f"spk{spk}.wav"), clean, 16000)
            write_wav(str(mix_dir / f"{uid}.wav"), clean + noise, 16000)
            ids.append(uid)
    manifest = tmp_path / "files.json"
    manifest.write_text(json.dumps(ids))

    ds = ManifestDataset(str(mix_dir), str(clean_dir), str(manifest),
                         batch_size=4, convention="wsj", bucket_samples=4000)
    batches = list(ds)
    assert sum(b.mix.shape[0] for b in batches) == 6
    for b in batches:
        assert b.mix.shape == b.clean.shape
        assert b.mix.shape[1] % 4000 == 0
        # RMS normalization: unit RMS over the valid samples
        for i in range(b.mix.shape[0]):
            seg = b.mix[i, : b.lengths[i]]
            assert abs(np.mean(seg**2) - 1.0) < 0.05

    # per-host sharding covers everything exactly once
    a = list(ManifestDataset(str(mix_dir), str(clean_dir), str(manifest),
                             batch_size=2, shuffle=False).shard(0, 2))
    b = list(ManifestDataset(str(mix_dir), str(clean_dir), str(manifest),
                             batch_size=2, shuffle=False).shard(1, 2))
    got = sorted(sum((x.ids for x in a + b), []))
    assert got == sorted(ids)


def test_metrics_sanity(rng):
    ref = (rng.standard_normal(32000) * 0.1).astype(np.float64)
    assert metrics.si_sdr(ref * 0.5, ref) > 50
    assert metrics.snr(ref, ref) > 100
    noisy = ref + rng.standard_normal(32000) * 0.05
    s_clean = metrics.stoi(ref, ref)
    s_noisy = metrics.stoi(noisy, ref)
    assert s_clean > 0.99
    assert s_noisy < s_clean
    e_clean = metrics.estoi(ref, ref)
    assert e_clean > 0.99
    assert metrics.estoi(noisy, ref) < e_clean
    assert metrics.seg_snr(noisy, ref) > 0
    assert metrics.lsd(ref, ref) < 1e-3


SPECTRAL_MODELS = ["lstm", "crn", "gcrn", "dpcrn", "fullsubnet", "dccrn",
                   "ctsnet", "g2net", "taylorsenet"]


@pytest.mark.parametrize("name", SPECTRAL_MODELS)
def test_enhance_smoke(rng, name):
    entry = get_model(name)
    model = entry.make()
    n = 4000
    wav = (rng.standard_normal(n) * 0.1).astype(np.float32)
    # init with the right feature shape
    from se_tpu.ops.stft import stft as _stft
    import jax.numpy as jnp

    re, im = _stft(jnp.asarray(wav[None]), entry.stft)
    mag = jnp.sqrt(re**2 + im**2)
    if entry.io_kind in ("mag_mask", "cirm"):
        feats = mag
    else:
        feats = jnp.stack([re, im], axis=-1)
    variables = model.init(jax.random.PRNGKey(0), feats)
    out = enhance_waveform(name, variables, wav, compressed=True, model=model)
    assert out.shape == wav.shape
    assert np.all(np.isfinite(out))


def test_lstm_decode_path_parity(rng):
    """Full decode-path parity vs the reference math run in torch
    (librosa.stft center == torch.stft center for win==n_fft)."""
    from se_tpu.models.lstm import from_reference_state_dict

    ref = load_reference_module("LSTM/LSTM.py")
    net = ref.lstm_net().eval()
    n = 6000
    wav = (rng.standard_normal(n) * 0.1).astype(np.float32)
    c = np.sqrt(n / np.sum(wav**2))
    x = torch.from_numpy(wav * c)
    with torch.no_grad():
        spec = torch.stft(x.unsqueeze(0), n_fft=320, hop_length=160,
                          win_length=320, window=torch.hann_window(320),
                          center=True, return_complex=True)
        mag, phase = spec.abs().squeeze(0).T, spec.angle().squeeze(0).T
        feat = mag.sqrt()  # compressed
        est = net(feat.unsqueeze(0)).squeeze(0) ** 2
        out = est * torch.exp(1j * phase)
        want = torch.istft(out.T.unsqueeze(0), n_fft=320, hop_length=160,
                           win_length=320, window=torch.hann_window(320),
                           center=True, length=n).squeeze(0).numpy() / c

    variables = from_reference_state_dict(state_dict_numpy(net))
    got = enhance_waveform("lstm", variables, wav, compressed=True)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_enhance_bf16_smoke(rng):
    import jax.numpy as jnp

    entry = get_model("gcrn")
    model = entry.make()
    n = 4000
    wav = (rng.standard_normal(n) * 0.1).astype(np.float32)
    from se_tpu.ops.stft import stft as _stft

    re, im = _stft(jnp.asarray(wav[None]), entry.stft)
    feats = jnp.stack([re, im], axis=-1)
    variables = model.init(jax.random.PRNGKey(0), feats)
    out32 = enhance_waveform("gcrn", variables, wav, model=model)
    out16 = enhance_waveform("gcrn", variables, wav, model=model,
                             dtype=jnp.bfloat16)
    assert np.all(np.isfinite(out16))
    # bf16 tracks fp32 within bf16 resolution on the waveform
    err = np.abs(out16 - out32).mean() / (np.abs(out32).mean() + 1e-9)
    assert err < 0.1, err


def test_native_wav_decoder_matches_python(tmp_path, rng):
    from se_tpu.runtime.native import available, rms_gain_native, wav_decode_native

    if not available():
        pytest.skip("native runtime not built (no g++?)")
    x = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    p = str(tmp_path / "n.wav")
    write_wav(p, x, 16000)
    got, sr = wav_decode_native(p)
    want, sr2 = read_wav(p, prefer_native=False)
    assert sr == sr2 == 16000
    np.testing.assert_allclose(got, want, atol=0)
    g = rms_gain_native(want)
    np.testing.assert_allclose(g, rms_gain(want), rtol=1e-5)


def test_composite_measures(rng):
    from se_tpu.eval.composite import composite, llr_wss_segsnr

    fs = 16000
    clean = (rng.standard_normal(16000) * 0.1).astype(np.float64)
    noisy = clean + (rng.standard_normal(16000) * 0.02)
    llr_c, wss_c, seg_c = llr_wss_segsnr(clean, clean, fs)
    llr_n, wss_n, seg_n = llr_wss_segsnr(noisy, clean, fs)
    assert llr_c < 0.05 and wss_c < 1.0 and seg_c == 35.0
    assert wss_n > wss_c and seg_n < seg_c
    csig, cbak, covl = composite(clean, noisy, fs, pesq_mos=3.0)
    assert all(1.0 <= v <= 5.0 for v in (csig, cbak, covl))


def test_spectral_distortion(rng):
    from se_tpu.eval.metrics import spectral_distortion

    xi = rng.uniform(0.01, 10.0, size=(12, 257))
    d0 = spectral_distortion(xi, xi)
    np.testing.assert_allclose(d0, 0.0, atol=1e-12)
    # known value: uniform 10x over-estimate -> 10 dB per frame
    d10 = spectral_distortion(xi, xi * 10.0)
    np.testing.assert_allclose(d10, 10.0, rtol=1e-9)
    # flooring at 1e-12 (matches the MATLAB max())
    dz = spectral_distortion(np.zeros((3, 4)), np.zeros((3, 4)))
    np.testing.assert_allclose(dz, 0.0, atol=1e-12)
    assert d10.shape == (12,)


def test_native_resampler_matches_scipy(rng):
    from scipy.signal import resample_poly

    from se_tpu.data.wav import resample
    from se_tpu.runtime.native import available, resample_poly_native

    if not available():
        pytest.skip("native runtime not built")
    x = (rng.standard_normal(48000) * 0.3).astype(np.float32)
    for orig, tgt in [(48000, 16000), (16000, 8000), (44100, 16000)]:
        up, down = tgt // np.gcd(orig, tgt), orig // np.gcd(orig, tgt)
        want = resample_poly(x, up, down).astype(np.float32)
        got = resample_poly_native(x, int(up), int(down))
        assert len(got) == len(want)
        np.testing.assert_allclose(got, want, atol=5e-7)
        # the public resample() rides the native path transparently
        np.testing.assert_allclose(resample(x, orig, tgt), want, atol=5e-7)


def test_enhance_waveform_mesh_matches_single(rng):
    """Data-parallel enhance (round 5, VERDICT r4 item 4): batch sharded
    over the 'data' mesh axis — incl. a non-divisible batch that gets
    padded and trimmed — must reproduce the single-device output."""
    import jax.numpy as jnp

    from se_tpu.parallel import make_mesh

    entry = get_model("dpcrn")
    model = entry.make()
    n = 4000
    wav = (rng.standard_normal((3, n)) * 0.1).astype(np.float32)  # 3 % 8 != 0
    from se_tpu.ops.stft import stft as _stft

    re, im = _stft(jnp.asarray(wav[:1]), entry.stft)
    feats = jnp.stack([re, im], axis=-1)
    variables = model.init(jax.random.PRNGKey(0), feats)

    single = enhance_waveform("dpcrn", variables, wav, model=model)
    mesh = make_mesh({"data": 8})
    sharded = enhance_waveform("dpcrn", variables, wav, model=model,
                               mesh=mesh)
    np.testing.assert_allclose(sharded, single, atol=1e-5)
