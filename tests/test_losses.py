"""Loss-library parity vs the reference Backup.py / Uformer loss.py."""

import sys
import types

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from se_tpu.train import losses as L
from tests.reference_oracle import load_reference_module

B, T, F = 3, 40, 161


@pytest.fixture(scope="module")
def ref_backup():
    return load_reference_module("LSTM/Backup.py")


@pytest.fixture(scope="module")
def ref_dccrn_backup():
    # DCCRN/Backup.py imports `config` whose import makedirs() absolute
    # dataset paths; inject a stub with just the constants it reads.
    cfg = types.ModuleType("config")
    cfg.win_size, cfg.win_shift, cfg.fft_num = 512, 128, 512
    sys.modules["config"] = cfg
    try:
        return load_reference_module("DCCRN/Backup.py")
    finally:
        del sys.modules["config"]


def _spec_pair(rng):
    e = rng.standard_normal((B, 2, T, F)).astype(np.float32)
    l = rng.standard_normal((B, 2, T, F)).astype(np.float32)
    frames = np.array([40, 25, 33])
    return e, l, frames


def test_mag_mse_parity(rng, ref_backup):
    e = rng.standard_normal((B, T, F)).astype(np.float32)
    l = rng.standard_normal((B, T, F)).astype(np.float32)
    frames = np.array([40, 25, 33])
    want = ref_backup.mag_mse_loss(
        torch.from_numpy(e), torch.from_numpy(l), list(frames)).item()
    got = float(L.mag_mse_loss(jnp.asarray(e), jnp.asarray(l), jnp.asarray(frames)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_com_mse_parity(rng, ref_backup):
    e, l, frames = _spec_pair(rng)
    want = ref_backup.com_mse_loss(
        torch.from_numpy(e), torch.from_numpy(l), list(frames)).item()
    got = float(L.com_mse_loss(
        jnp.asarray(e.transpose(0, 2, 3, 1)),
        jnp.asarray(l.transpose(0, 2, 3, 1)), jnp.asarray(frames)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_com_mag_mse_parity(rng, ref_backup):
    e, l, frames = _spec_pair(rng)
    want = ref_backup.com_mag_mse_loss(
        torch.from_numpy(e), torch.from_numpy(l), list(frames)).item()
    got = float(L.com_mag_mse_loss(
        jnp.asarray(e.transpose(0, 2, 3, 1)),
        jnp.asarray(l.transpose(0, 2, 3, 1)), jnp.asarray(frames)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_fusion_snr_parity(rng, ref_backup):
    n = 4000
    e = rng.standard_normal((B, n)).astype(np.float32)
    l = rng.standard_normal((B, n)).astype(np.float32)
    lengths = np.array([4000, 3000, 3500])
    want = ref_backup.fusion_snr_loss(
        torch.from_numpy(e), torch.from_numpy(l), list(lengths)).item()
    got = float(L.fusion_snr_loss(jnp.asarray(e), jnp.asarray(l),
                                  jnp.asarray(lengths)))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_sisdr_snr_parity(rng, ref_dccrn_backup):
    n = (40 - 1) * 128  # reference masks assume len == (max_frames-1)*hop
    hop, win = 128, 512
    e = rng.standard_normal((B, n)).astype(np.float32)
    l = rng.standard_normal((B, n)).astype(np.float32)
    frames = np.array([40, 30, 35])
    want = ref_dccrn_backup.sisdr_loss(
        torch.from_numpy(e), torch.from_numpy(l), list(frames)).item()
    got = float(L.sisdr_loss(jnp.asarray(e), jnp.asarray(l),
                             jnp.asarray(frames), hop=hop))
    np.testing.assert_allclose(got, want, rtol=1e-4)
    want = ref_dccrn_backup.snr_loss(
        torch.from_numpy(e), torch.from_numpy(l), list(frames)).item()
    got = float(L.snr_loss(jnp.asarray(e), jnp.asarray(l),
                           jnp.asarray(frames), hop=hop))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_stftm_parity(rng, ref_dccrn_backup, monkeypatch):
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    n = 4096
    e = rng.standard_normal((B, n)).astype(np.float32)
    l = rng.standard_normal((B, n)).astype(np.float32)
    ref_fn = ref_dccrn_backup.stftm_loss(frame_size=512, frame_shift=256)
    want = ref_fn(torch.from_numpy(e), torch.from_numpy(l)).item()
    got = float(L.StftmLoss(512, 256)(jnp.asarray(e), jnp.asarray(l)))
    np.testing.assert_allclose(got, want, rtol=1e-3)


def test_uformer_losses_parity(rng):
    ref = load_reference_module("Uformer/loss.py")
    n = 4000
    e = rng.standard_normal((B, n)).astype(np.float32)
    l = rng.standard_normal((B, n)).astype(np.float32)
    want = ref.calloss(torch.from_numpy(e), torch.from_numpy(l))[0].item()
    got = float(L.uformer_sisnr_loss(jnp.asarray(e), jnp.asarray(l)))
    np.testing.assert_allclose(got, want, rtol=1e-3)

    es = rng.standard_normal((B, 2, 257, T)).astype(np.float32)
    ls = rng.standard_normal((B, 2, 257, T)).astype(np.float32)
    # ours: (B, T, F, 2)
    ej = jnp.asarray(es.transpose(0, 3, 2, 1))
    lj = jnp.asarray(ls.transpose(0, 3, 2, 1))
    want = ref.calloss_cplxmse(torch.from_numpy(es), torch.from_numpy(ls))[0].item()
    got = float(L.uformer_cplx_mse_loss(ej, lj))
    np.testing.assert_allclose(got, want, rtol=1e-4)
    want = ref.calloss_magmse(torch.from_numpy(es), torch.from_numpy(ls))[0].item()
    got = float(L.uformer_mag_mse_loss(ej, lj))
    np.testing.assert_allclose(got, want, rtol=1e-4)
    want = ref.calloss_cplxmse_subband(torch.from_numpy(es), torch.from_numpy(ls))[0].item()
    got = float(L.uformer_cplx_mse_subband_loss(ej, lj))
    np.testing.assert_allclose(got, want, rtol=1e-4)
    want = ref.calloss_magmse_subband(torch.from_numpy(es), torch.from_numpy(ls))[0].item()
    got = float(L.uformer_mag_mse_subband_loss(ej, lj))
    np.testing.assert_allclose(got, want, rtol=1e-4)
    want = ref.calloss_timemae(torch.from_numpy(e), torch.from_numpy(l))[0].item()
    got = float(L.uformer_time_mae_loss(jnp.asarray(e), jnp.asarray(l)))
    np.testing.assert_allclose(got, want, rtol=1e-4)
