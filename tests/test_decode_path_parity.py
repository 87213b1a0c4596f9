"""Full decode-path parity: enhance_waveform vs the reference decode math
executed in torch (BASELINE.json north star: enhanced waveforms allclose to
the reference *_decode_vb.py paths).

Each oracle replays the decode script exactly: RMS gain, (compressed) STFT
feature build, reference model forward with copied weights, decompression,
iSTFT, gain removal. librosa.stft with win==n_fft equals torch.stft
center=True, so torch is the oracle for the librosa scripts too.
"""

import numpy as np
import pytest
import torch

from se_tpu.eval.enhance import enhance_waveform
from tests.reference_oracle import load_reference_module, state_dict_numpy

N = 6000


def _torch_spec(wav_t, n_fft, hop):
    return torch.stft(wav_t.unsqueeze(0), n_fft=n_fft, hop_length=hop,
                      win_length=n_fft, window=torch.hann_window(n_fft),
                      center=True, return_complex=True)


def _torch_istft(spec, n_fft, hop, length):
    return torch.istft(spec, n_fft=n_fft, hop_length=hop, win_length=n_fft,
                       window=torch.hann_window(n_fft), center=True,
                       length=length)


def test_gcrn_decode_path_parity(rng):
    """ref GCRN/gcrn_decode_vb.py:17-56 (compressed)."""
    from se_tpu.models.gcrn import from_reference_state_dict

    ref = load_reference_module("GCRN/GCRN_noncprs.py")
    net = ref.Net().eval()
    wav = (rng.standard_normal(N) * 0.1).astype(np.float32)
    c = np.sqrt(N / np.sum(wav**2))
    with torch.no_grad():
        spec = _torch_spec(torch.from_numpy(wav * c), 320, 160).squeeze(0)
        mag, phase = spec.abs().T ** 0.5, spec.angle().T  # (T, F)
        feat = torch.stack([mag * torch.cos(phase), mag * torch.sin(phase)],
                           dim=0)  # (2, T, F)
        est = net(feat.unsqueeze(0)).squeeze(0)
        est_mag = torch.norm(est, dim=0) ** 2.0
        est_phase = torch.atan2(est[1], est[0])
        out = est_mag * torch.exp(1j * est_phase)  # (T, F)
        want = _torch_istft(out.T.unsqueeze(0), 320, 160, N).squeeze(0)
        want = want.numpy() / c

    variables = from_reference_state_dict(state_dict_numpy(net))
    got = enhance_waveform("gcrn", variables, wav, compressed=True)
    np.testing.assert_allclose(got, want, atol=5e-4)


def test_taylorsenet_decode_path_parity(rng):
    """ref TaylorSENet_new/taylorsenet_decode_vb.py:26-52 (compressed)."""
    from se_tpu.models.taylorsenet import from_reference_state_dict

    ref = load_reference_module("TaylorSENet_new/TaylorSENet.py")
    net = ref.TaylorSENet(
        cin=2, k1=(1, 3), k2=(2, 3), c=64, kd1=5, cd1=64, d_feat=256,
        dilations=[1, 2, 5, 9], p=2, fft_num=320, order_num=3,
        intra_connect="cat", inter_connect="cat", is_causal=True,
        is_conformer=False, is_u2=True, is_param_share=False,
        is_encoder_share=False).eval()
    wav = (rng.standard_normal(N) * 0.1).astype(np.float32)
    c = np.sqrt(N / np.sum(wav**2))
    # decode pads the waveform to whole frames; torch.stft center handles
    # any length, so frame counts match our center convention
    with torch.no_grad():
        spec = _torch_spec(torch.from_numpy(wav * c), 320, 160).squeeze(0)
        mag, phase = spec.abs().T ** 0.5, spec.angle().T
        feat = torch.stack([mag * torch.cos(phase), mag * torch.sin(phase)],
                           dim=0)
        est = net(feat.unsqueeze(0)).squeeze(0)  # (2, T, F)
        est_mag = torch.norm(est, dim=0) ** 2.0
        est_phase = torch.atan2(est[1], est[0])
        out = est_mag * torch.exp(1j * est_phase)
        want = _torch_istft(out.T.unsqueeze(0), 320, 160, N).squeeze(0)
        want = want.numpy() / c

    variables = from_reference_state_dict(state_dict_numpy(net))
    got = enhance_waveform("taylorsenet", variables, wav, compressed=True)
    np.testing.assert_allclose(got, want, atol=5e-4)


def test_fullsubnet_decode_path_parity(rng):
    """ref FullSubNet/fullsubnet_sa_decode.py:45-76 (compressed, cIRM via
    complex multiply)."""
    from se_tpu.models.fullsubnet import from_reference_state_dict

    ref = load_reference_module("FullSubNet/fullsubnet_net_sa/model.py")
    net = ref.Model(
        sb_num_neighbors=15, fb_num_neighbors=0, num_freqs=257, look_ahead=2,
        sequence_model="LSTM", fb_output_activate_function="ReLU",
        sb_output_activate_function=None, fb_model_hidden_size=512,
        sb_model_hidden_size=384, weight_init=False,
        norm_type="offline_laplace_norm", num_groups_in_drop_band=2).eval()
    wav = (rng.standard_normal(N) * 0.1).astype(np.float32)
    c = np.sqrt(N / np.sum(wav**2))
    with torch.no_grad():
        spec = _torch_spec(torch.from_numpy(wav * c), 512, 256)  # (1, F, T)
        mag = spec.abs() ** 0.5
        phase = spec.angle()
        feat_r = mag * torch.cos(phase)
        feat_i = mag * torch.sin(phase)
        mask = net(mag.unsqueeze(1))  # (1, 2, F, T)
        est_r = mask[:, 0] * feat_r - mask[:, 1] * feat_i
        est_i = mask[:, 0] * feat_i + mask[:, 1] * feat_r
        est = torch.complex(est_r, est_i)
        est_mag = est.abs() ** 2
        est_phase = est.angle()
        out = est_mag * torch.exp(1j * est_phase)
        want = _torch_istft(out, 512, 256, N).squeeze(0).numpy() / c

    variables = from_reference_state_dict(state_dict_numpy(net))
    got = enhance_waveform("fullsubnet", variables, wav, compressed=True)
    np.testing.assert_allclose(got, want, atol=5e-4)


def test_ctsnet_decode_path_parity(rng):
    """ref CTSNet_new/two_stage_com_decode_vb.py:55-95 (compressed,
    two-stage residual chaining)."""
    from se_tpu.models.ctsnet import from_reference_state_dicts

    s1 = load_reference_module("CTSNet_new/Step1_network.py").Step1_net().eval()
    s2 = load_reference_module("CTSNet_new/Step2_network.py").Step2_net(
        X=6, R=3).eval()
    wav = (rng.standard_normal(N) * 0.1).astype(np.float32)
    c = np.sqrt(N / np.sum(wav**2))
    with torch.no_grad():
        spec = _torch_spec(torch.from_numpy(wav * c), 320, 160).squeeze(0)
        mag, phase = spec.abs().T ** 0.5, spec.angle().T
        feat = torch.stack([mag * torch.cos(phase), mag * torch.sin(phase)],
                           dim=0).unsqueeze(0)  # (1, 2, T, F)
        s1_mag = s1(torch.norm(feat, dim=1))
        s1_out = torch.stack([s1_mag * torch.cos(phase.unsqueeze(0)),
                              s1_mag * torch.sin(phase.unsqueeze(0))], dim=1)
        s2_out = s2(torch.cat([feat, s1_out], dim=1)) + s1_out
        est = s2_out.squeeze(0)
        est_mag = torch.norm(est, dim=0) ** 2.0
        est_phase = torch.atan2(est[1], est[0])
        out = est_mag * torch.exp(1j * est_phase)
        want = _torch_istft(out.T.unsqueeze(0), 320, 160, N).squeeze(0)
        want = want.numpy() / c

    variables = from_reference_state_dicts(state_dict_numpy(s1),
                                           state_dict_numpy(s2))
    got = enhance_waveform("ctsnet", variables, wav, compressed=True)
    np.testing.assert_allclose(got, want, atol=5e-4)
