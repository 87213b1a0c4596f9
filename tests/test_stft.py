"""STFT convention parity: vs torch.stft (center) and numpy oracles."""

import numpy as np
import pytest
import torch

from se_tpu.ops import StftConfig, stft, istft, num_frames
from se_tpu.ops.windows import get_window


def _torch_stft(x, cfg, win_name="hann"):
    w = torch.from_numpy(get_window(win_name, cfg.win_length))
    spec = torch.stft(
        torch.from_numpy(x),
        n_fft=cfg.fft,
        hop_length=cfg.hop,
        win_length=cfg.win_length,
        window=w,
        center=True,
        return_complex=True,
    )
    return spec.numpy()  # (B, F, T)


CENTER_CFGS = [
    StftConfig(320, 160, 320),                      # LSTM/CRN/GCRN family
    StftConfig(512, 256, 512),                      # FullSubNet
    StftConfig(512, 128, 512),                      # DCCRN
    StftConfig(400, 160, 512, window="sqrthann"),   # Uformer
]


@pytest.mark.parametrize("cfg", CENTER_CFGS)
def test_center_matches_torch(cfg, rng):
    n = 16000
    x = rng.standard_normal((2, n)).astype(np.float32)
    re, im = stft(x, cfg)
    ref = _torch_stft(x, cfg, cfg.window)
    assert re.shape == (2, num_frames(n, cfg), cfg.bins)
    np.testing.assert_allclose(np.asarray(re), ref.real.transpose(0, 2, 1),
                               atol=2e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(im), ref.imag.transpose(0, 2, 1),
                               atol=2e-3, rtol=1e-4)


@pytest.mark.parametrize("cfg", CENTER_CFGS)
def test_center_roundtrip(cfg, rng):
    n = 16000
    x = rng.standard_normal((2, n)).astype(np.float32)
    re, im = stft(x, cfg)
    y = istft(re, im, cfg, length=n)
    np.testing.assert_allclose(np.asarray(y), x, atol=1e-4)


def test_center_istft_matches_torch(rng):
    cfg = StftConfig(320, 160, 320)
    n = 8000
    x = rng.standard_normal((1, n)).astype(np.float32)
    spec = _torch_stft(x, cfg)
    w = torch.from_numpy(get_window("hann", cfg.win_length))
    y_ref = torch.istft(
        torch.from_numpy(spec), n_fft=cfg.fft, hop_length=cfg.hop,
        win_length=cfg.win_length, window=w, center=True, length=n,
    ).numpy()
    y = istft(
        np.ascontiguousarray(spec.real.transpose(0, 2, 1)),
        np.ascontiguousarray(spec.imag.transpose(0, 2, 1)),
        cfg, length=n,
    )
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=1e-4)


def _np_stft_pad_end(x, cfg):
    """Oracle for tf.signal.stft(pad_end=True) with a periodic window."""
    n = x.shape[-1]
    t = -(-n // cfg.hop)
    total = (t - 1) * cfg.hop + cfg.win_length
    xp = np.pad(x, [(0, 0), (0, total - n)])
    w = get_window(cfg.window, cfg.win_length).astype(np.float64)
    frames = np.stack(
        [xp[:, i * cfg.hop : i * cfg.hop + cfg.win_length] for i in range(t)],
        axis=1,
    )
    return np.fft.rfft(frames * w, n=cfg.fft, axis=-1)


def test_pad_end_matches_numpy_oracle(rng):
    cfg = StftConfig(512, 256, 512, window="hamming", convention="pad_end")
    n = 16000 + 37  # not a multiple of hop
    x = rng.standard_normal((2, n)).astype(np.float32)
    re, im = stft(x, cfg)
    ref = _np_stft_pad_end(x, cfg)
    assert re.shape == (2, num_frames(n, cfg), cfg.bins)
    np.testing.assert_allclose(np.asarray(re), ref.real, atol=2e-3)
    np.testing.assert_allclose(np.asarray(im), ref.imag, atol=2e-3)


def test_pad_end_roundtrip_interior(rng):
    """tf-style synthesis reconstructs exactly away from the edges."""
    cfg = StftConfig(512, 256, 512, window="hamming", convention="pad_end")
    n = 16384
    x = rng.standard_normal((1, n)).astype(np.float32)
    re, im = stft(x, cfg)
    y = np.asarray(istft(re, im, cfg, length=n))
    np.testing.assert_allclose(y[:, 512:-512], x[:, 512:-512], atol=1e-4)


def test_valid_convention_shapes_and_roundtrip(rng):
    cfg = StftConfig(320, 160, 320, convention="valid")
    n = 320 + 160 * 30
    x = rng.standard_normal((1, n)).astype(np.float32)
    re, im = stft(x, cfg)
    assert re.shape == (1, 31, 161)
    y = np.asarray(istft(re, im, cfg, length=n))
    np.testing.assert_allclose(y[:, 160:-160], x[:, 160:-160], atol=1e-4)


def test_nonmultiple_hop_framing(rng):
    """Uformer 400-win/160-hop path (frame_len 512 not a hop multiple)."""
    cfg = StftConfig(400, 160, 512, window="sqrthann")
    n = 16000
    x = rng.standard_normal((1, n)).astype(np.float32)
    re, im = stft(x, cfg)
    y = istft(re, im, cfg, length=n)
    np.testing.assert_allclose(np.asarray(y), x, atol=1e-4)


def test_periodized_synthesis_matches_dccrn_pinv_istft(rng):
    """Our `synthesis_norm='periodized'` == the reference's pinv-based ISTFT
    (DCCRN/istft.py:8-59, Griffin-Lim eq. 8 window normalization)."""
    import sys
    sys.path.insert(0, "tests")
    from tests.reference_oracle import load_reference_module

    ref = load_reference_module("DCCRN/istft.py")
    mod = ref.ISTFT(filter_length=512, hop_length=128, window="hann",
                    center=True)
    n = 8000
    x = rng.standard_normal((1, n)).astype(np.float32)
    cfg = StftConfig(512, 128, 512, synthesis_norm="periodized")
    re, im = stft(x, cfg)
    y = istft(re, im, cfg, length=n)
    spec = torch.stack(
        [torch.from_numpy(np.asarray(re)), torch.from_numpy(np.asarray(im))],
        dim=1)  # (B, 2, T, F)
    want = mod(spec, length=n).squeeze(1).numpy()
    np.testing.assert_allclose(np.asarray(y), want, atol=1e-4)
