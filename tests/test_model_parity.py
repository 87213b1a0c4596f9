"""Golden parity: our JAX models vs the reference PyTorch forward on CPU,
with reference weights copied over (SURVEY.md §4 implication (3))."""

import numpy as np
import pytest
import torch

from tests.reference_oracle import load_reference_module, state_dict_numpy

torch.manual_seed(0)

B, T, F = 2, 25, 161


def _randomize(model):
    """Perturb params + BN running stats so parity isn't trivially identity."""
    gen = torch.Generator().manual_seed(42)
    with torch.no_grad():
        for p in model.parameters():
            p.add_(0.05 * torch.randn(p.shape, generator=gen))
        for m in model.modules():
            if hasattr(m, "running_mean") and m.running_mean is not None:
                m.running_mean.add_(0.1 * torch.randn(m.running_mean.shape, generator=gen))
                m.running_var.mul_(
                    torch.rand(m.running_var.shape, generator=gen) * 0.5 + 0.75
                )
    return model


def _compare(ours, theirs, atol=2e-4):
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=atol, rtol=1e-3)


def test_lstm_parity(rng):
    from se_tpu.models.lstm import LSTMNet, from_reference_state_dict

    ref = load_reference_module("LSTM/LSTM.py")
    net = _randomize(ref.lstm_net().eval())
    x = rng.standard_normal((B, T, F)).astype(np.float32)
    with torch.no_grad():
        want = net(torch.from_numpy(x)).numpy()
    variables = from_reference_state_dict(state_dict_numpy(net))
    got = LSTMNet().apply(variables, x)
    _compare(got, want)


def test_crn_parity(rng):
    from se_tpu.models.crn import CRN, from_reference_state_dict

    ref = load_reference_module("CRN/CRN.py")
    net = _randomize(ref.crn_net().eval())
    x = rng.standard_normal((B, T, F)).astype(np.float32)
    with torch.no_grad():
        want = net(torch.from_numpy(x)).numpy()
    variables = from_reference_state_dict(state_dict_numpy(net))
    got = CRN().apply(variables, x)
    _compare(got, want)


def test_gcrn_parity(rng):
    from se_tpu.models.gcrn import GCRN, from_reference_state_dict

    ref = load_reference_module("GCRN/GCRN_noncprs.py")
    net = _randomize(ref.Net().eval())
    x = rng.standard_normal((B, 2, T, F)).astype(np.float32)
    with torch.no_grad():
        want = net(torch.from_numpy(x)).numpy()  # (B, 2, T, F)
    variables = from_reference_state_dict(state_dict_numpy(net))
    got = GCRN().apply(variables, np.transpose(x, (0, 2, 3, 1)))  # (B,T,F,2)
    _compare(np.transpose(np.asarray(got), (0, 3, 1, 2)), want)


def test_dpcrn_parity(rng):
    from se_tpu.models.dpcrn import DPCRN, from_reference_state_dict

    ref = load_reference_module("DPCRN/DPCRN.py")
    net = _randomize(ref.dpcrn().eval())
    x = rng.standard_normal((B, 2, T, F)).astype(np.float32)
    with torch.no_grad():
        want = net(torch.from_numpy(x)).numpy()
    variables = from_reference_state_dict(state_dict_numpy(net))
    got = DPCRN().apply(variables, np.transpose(x, (0, 2, 3, 1)))
    _compare(np.transpose(np.asarray(got), (0, 3, 1, 2)), want)


def test_fullsubnet_parity(rng):
    from se_tpu.models.fullsubnet import FullSubNet, from_reference_state_dict

    ref = load_reference_module("FullSubNet/fullsubnet_net_sa/model.py")
    net = ref.Model(
        sb_num_neighbors=15, fb_num_neighbors=0, num_freqs=257, look_ahead=2,
        sequence_model="LSTM", fb_output_activate_function="ReLU",
        sb_output_activate_function=None, fb_model_hidden_size=512,
        sb_model_hidden_size=384, weight_init=False,
        norm_type="offline_laplace_norm", num_groups_in_drop_band=2,
    ).eval()
    x = np.abs(rng.standard_normal((1, 1, 257, 20))).astype(np.float32)
    with torch.no_grad():
        want = net(torch.from_numpy(x)).numpy()  # (B, 2, F, T)
    variables = from_reference_state_dict(state_dict_numpy(net))
    got = FullSubNet().apply(variables, x[:, 0].transpose(0, 2, 1))  # (B,T,F)
    _compare(np.transpose(np.asarray(got), (0, 3, 2, 1)), want, atol=5e-4)


@pytest.mark.parametrize("snr_variant", [False, True])
def test_dccrn_parity(rng, snr_variant):
    from se_tpu.models.dccrn import DCCRN, from_reference_state_dict

    if snr_variant:
        ref = load_reference_module("DCCRN_SNR/DCCRN.py")
        net = ref.DCCRN(rnn_units=256, use_clstm=True,
                        kernel_num=[32, 64, 128, 256, 256, 256]).eval()
    else:
        ref = load_reference_module("DCCRN/DCCRN_cprs.py")
        net = ref.DCCRN(rnn_units=256, masking_mode="E", use_clstm=True,
                        kernel_num=[32, 64, 128, 256, 256, 256]).eval()
    _randomize(net)
    x = rng.standard_normal((1, 2, 257, 32)).astype(np.float32)
    with torch.no_grad():
        want = net(torch.from_numpy(x)).numpy()  # (B, 2, F, T)
    variables = from_reference_state_dict(state_dict_numpy(net))
    model = DCCRN(snr_variant=snr_variant)
    got = model.apply(variables, np.transpose(x, (0, 3, 2, 1)))  # (B,T,F,2)
    _compare(np.transpose(np.asarray(got), (0, 3, 2, 1)), want, atol=5e-4)


@pytest.mark.parametrize("variant", ["cln", "in"])
def test_ctsnet_parity(rng, variant):
    from se_tpu.models.ctsnet import (
        CTSNet, from_reference_state_dicts,
    )

    d = "CTSNet_new" if variant == "cln" else "CTSNet"
    s1_mod = load_reference_module(f"{d}/Step1_network.py")
    s2_mod = load_reference_module(f"{d}/Step2_network.py")
    net1 = _randomize(s1_mod.Step1_net().eval())
    net2 = _randomize(s2_mod.Step2_net(X=6, R=3).eval())

    x = rng.standard_normal((1, 2, T, F)).astype(np.float32)
    xt = torch.from_numpy(x)
    with torch.no_grad():
        mag = torch.norm(xt, dim=1)
        phase = torch.atan2(xt[:, 1], xt[:, 0])
        s1_mag = net1(mag)
        s1 = torch.stack((s1_mag * torch.cos(phase), s1_mag * torch.sin(phase)), dim=1)
        s2 = net2(torch.cat((xt, s1), dim=1))
        want = (s1 + s2).numpy()

    variables = from_reference_state_dicts(
        state_dict_numpy(net1), state_dict_numpy(net2)
    )
    model = CTSNet(norm=variant)
    got = model.apply(variables, np.transpose(x, (0, 2, 3, 1)))
    _compare(np.transpose(np.asarray(got), (0, 3, 1, 2)), want, atol=5e-4)


def test_g2net_parity(rng):
    from se_tpu.models.g2net import G2Net, from_reference_state_dict

    ref = load_reference_module("G2Net_new/gaf_net_320.py")
    net = _randomize(ref.gaf_base(
        3, 64, 2, 4, 4, [1, 2, 5, 9], 256 + 161 * 2, 256, 256, (2, 3), (1, 3),
        64, "cat", 3, is_aux=False, encoder_type="U2Net", tcm_type="full-band",
    ).eval())
    x = rng.standard_normal((1, 2, T, F)).astype(np.float32)
    with torch.no_grad():
        want = [o.numpy() for o in net(torch.from_numpy(x))]  # each (B,2,F,T)
    variables = from_reference_state_dict(state_dict_numpy(net))
    got = G2Net().apply(variables, np.transpose(x, (0, 2, 3, 1)))
    assert got.shape[0] == 3
    for s in range(3):
        _compare(np.transpose(np.asarray(got[s]), (0, 3, 2, 1)), want[s], atol=5e-4)


@pytest.mark.parametrize("variant", ["cln", "in"])
def test_taylorsenet_parity(rng, variant):
    from se_tpu.models.taylorsenet import TaylorSENet, from_reference_state_dict

    d = "TaylorSENet_new" if variant == "cln" else "TaylorSENet"
    ref = load_reference_module(f"{d}/TaylorSENet.py")
    net = _randomize(ref.TaylorSENet(
        cin=2, k1=(1, 3), k2=(2, 3), c=64, kd1=5, cd1=64, d_feat=256,
        dilations=[1, 2, 5, 9], p=2, fft_num=320, order_num=3,
        intra_connect="cat", inter_connect="cat", is_causal=True,
        is_conformer=False, is_u2=True, is_param_share=False,
        is_encoder_share=False,
    ).eval())
    x = rng.standard_normal((1, 2, T, F)).astype(np.float32)
    with torch.no_grad():
        want = net(torch.from_numpy(x)).numpy()  # (B, 2, T, F)
    variables = from_reference_state_dict(state_dict_numpy(net))
    got = TaylorSENet(norm=variant).apply(variables, np.transpose(x, (0, 2, 3, 1)))
    _compare(np.transpose(np.asarray(got), (0, 3, 1, 2)), want, atol=5e-4)


def test_uformer_parity(rng, monkeypatch):
    from se_tpu.models.uformer import Uformer, from_reference_state_dict

    # reference materializes windows with .cuda() in-graph (uformer.py:178);
    # run the oracle on CPU by making .cuda a no-op.
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    # reference targets the pre-1.8 stft/istft API (real (..,2) tensors)
    _stft, _istft = torch.stft, torch.istft

    def old_stft(inp, n_fft, hop_length=None, win_length=None, window=None, **kw):
        kw.pop("return_complex", None)
        spec = _stft(inp, n_fft, hop_length, win_length, window,
                     return_complex=True, **kw)
        return torch.view_as_real(spec)

    def old_istft(inp, n_fft, hop_length=None, win_length=None, window=None, **kw):
        if not inp.is_complex() and inp.shape[-1] == 2:
            inp = torch.view_as_complex(inp.contiguous())
        return _istft(inp, n_fft, hop_length, win_length, window, **kw)

    monkeypatch.setattr(torch, "stft", old_stft)
    monkeypatch.setattr(torch, "istft", old_istft)
    ref = load_reference_module("Uformer/uformer.py")
    net = _randomize(ref.Uformer().eval())
    n = 4000
    x = rng.standard_normal((1, n)).astype(np.float32) * 0.1
    s = rng.standard_normal((1, n)).astype(np.float32) * 0.1
    with torch.no_grad():
        want_wav, want_src, want_cplx, want_src_cplx = net(
            torch.from_numpy(x), torch.from_numpy(s))
    variables = from_reference_state_dict(state_dict_numpy(net))
    est, src_rt, out_cplx, src_cplx = Uformer().apply(variables, x, s)
    np.testing.assert_allclose(np.asarray(src_rt), want_src.numpy(),
                               atol=1e-4, rtol=1e-3)
    # out_cplx: ours (re, im) each (B,T,F); reference (B,2,F,T)
    np.testing.assert_allclose(
        np.asarray(out_cplx[0]).transpose(0, 2, 1),
        want_cplx[:, 0].numpy(), atol=2e-3, rtol=1e-2)
    np.testing.assert_allclose(
        np.asarray(out_cplx[1]).transpose(0, 2, 1),
        want_cplx[:, 1].numpy(), atol=2e-3, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(est), want_wav.numpy(),
                               atol=2e-3, rtol=1e-2)
