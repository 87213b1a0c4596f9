"""G2Net (GaGNet): glance-and-focus multi-stage enhancement
(ref: G2Net_new/gaf_net_320.py:10-118).

U2Net-style encoder (nested mini-U-nets, ref :384-431) -> 3 GAF stages: each
concatenates the flattened encoder feature with the flattened previous complex
estimate and runs a Glance branch (gated 1x1 convs + full-band TCMs ->
sigmoid gain on magnitude) parallel to a Focus branch (two TCM stacks ->
real/imag residual); combine: mag*gain at prev phase + complex residual
(ref :104-115). Optional sub-band Ms_TCM (ref :186-231) and aux deconv
decoder (ref :341-381).

Decode config (ref G2Net_new/com_decode.py:23): kd1=3, cd1=64, tcm_num=2,
dilations [1,2,5,9], ci=256+322, U2Net encoder, full-band TCM, 3 stages,
no aux. Norm variant: "cln" (G2Net_new) vs "in" (G2Net_VB).

Layout: (B, T, F, 2) in; returns the per-stage estimates stacked on axis 0
(training supervises all stages; decode takes the last).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from se_tpu.nn import Conv2d, ConvTranspose2d
from se_tpu.nn.activations import PReLU
from se_tpu.nn.conv import CausalConv1d
from se_tpu.nn.norms import (
    CumulativeLayerNorm1d,
    CumulativeLayerNorm2d,
    InstanceNorm1d,
    InstanceNorm2d,
)
from se_tpu.ops.stft import PRESET_320
from se_tpu.models.registry import ModelEntry, register
from se_tpu.utils import torch_compat as tc


def _norm2d(kind, name):
    return (CumulativeLayerNorm2d(affine=True, name=name) if kind == "cln"
            else InstanceNorm2d(affine=True, name=name))


def _norm1d(kind, name):
    return (CumulativeLayerNorm1d(affine=True, name=name) if kind == "cln"
            else InstanceNorm1d(affine=True, name=name))


class Gate2dConv(nn.Module):
    """Gated conv with causal T pad / deconv with trailing chomp
    (ref Gate_2dconv, gaf_net_320.py:464-485)."""

    features: int
    kernel_size: tuple[int, int]
    strides: tuple[int, int] = (1, 2)
    deconv: bool = False

    @nn.compact
    def __call__(self, x):
        if not self.deconv:
            pad = ((self.kernel_size[0] - 1, 0), (0, 0))
            a = Conv2d(self.features, self.kernel_size, self.strides,
                       padding=pad, name="conv")(x)
            g = Conv2d(self.features, self.kernel_size, self.strides,
                       padding=pad, name="gate_conv")(x)
            return a * nn.sigmoid(g)
        a = ConvTranspose2d(self.features, self.kernel_size, self.strides,
                            name="conv")(x)
        g = ConvTranspose2d(self.features, self.kernel_size, self.strides,
                            name="gate_conv")(x)
        return (a * nn.sigmoid(g))[:, :-1]


class EnUnetModule(nn.Module):
    """Nested mini-U-net encoder block (ref En_unet_module, :384-431)."""

    in_kernel: tuple[int, int]
    inner_kernel: tuple[int, int]
    channels: int
    scale: int
    norm: str = "cln"

    @nn.compact
    def __call__(self, x):
        x = Gate2dConv(self.channels, self.in_kernel, name="gc")(x)
        x = _norm2d(self.norm, "gc_norm")(x)
        x_resi = PReLU(self.channels, name="gc_act")(x)

        x = x_resi
        skips = []
        for i in range(self.scale):
            x = Conv2d(self.channels, self.inner_kernel, (1, 2),
                       name=f"enco{i}_conv")(x)
            x = _norm2d(self.norm, f"enco{i}_norm")(x)
            x = PReLU(self.channels, name=f"enco{i}_act")(x)
            skips.append(x)
        for i in range(self.scale):
            if i > 0:
                x = jnp.concatenate([x, skips[-(i + 1)]], axis=-1)  # 'cat'
            x = ConvTranspose2d(self.channels, self.inner_kernel, (1, 2),
                                name=f"deco{i}_conv")(x)
            x = _norm2d(self.norm, f"deco{i}_norm")(x)
            x = PReLU(self.channels, name=f"deco{i}_act")(x)
        return x_resi + x


class U2NetEncoder(nn.Module):
    channels: int = 64
    norm: str = "cln"

    @nn.compact
    def __call__(self, x):
        skips = []
        for i, (k, scale) in enumerate(
            [((2, 5), 4), ((2, 3), 3), ((2, 3), 2), ((2, 3), 1)]
        ):
            x = EnUnetModule(k, (1, 3), self.channels, scale, norm=self.norm,
                             name=f"unet{i}")(x)
            skips.append(x)
        x = Gate2dConv(64, (2, 3), name="last_gc")(x)
        x = _norm2d(self.norm, "last_norm")(x)
        x = PReLU(64, name="last_act")(x)
        skips.append(x)
        return x, skips


class UNetEncoder(nn.Module):
    """Plain gated-conv encoder alternative (ref UNet_Encoder, :306-338)."""

    channels: int = 64
    norm: str = "cln"

    @nn.compact
    def __call__(self, x):
        skips = []
        for i in range(5):
            k = (2, 5) if i == 0 else (2, 3)
            ch = 64 if i == 4 else self.channels
            x = Gate2dConv(ch, k, name=f"gc{i}")(x)
            x = _norm2d(self.norm, f"norm{i}")(x)
            x = PReLU(ch, name=f"act{i}")(x)
            skips.append(x)
        return x, skips


class Glu(nn.Module):
    """Non-gated dilated TCN unit, k=3 causal (ref Glu, :245-274)."""

    dilation: int
    norm: str = "cln"

    @nn.compact
    def __call__(self, x):
        resi = x
        h = nn.Dense(64, use_bias=False, name="in_conv")(x)
        h = PReLU(64, name="left_act")(h)
        h = _norm1d(self.norm, "left_norm")(h)
        h = CausalConv1d(64, 3, dilation=self.dilation,
                         left_pad=2 * self.dilation, use_bias=False,
                         name="left_conv")(h)
        h = PReLU(64, name="out_act")(h)
        h = _norm1d(self.norm, "out_norm")(h)
        h = nn.Dense(256, use_bias=False, name="out_conv")(h)
        return h + resi


class TcmList(nn.Module):
    dilations: Sequence[int] = (1, 2, 5, 9)
    norm: str = "cln"

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            x = Glu(d, norm=self.norm, name=f"glu{i}")(x)
        return x


class Conv1dUnit(nn.Module):
    """pad + conv1d + norm + PReLU (ref Conv1dunit, :487-506)."""

    features: int
    kernel: int
    dilation: int
    norm: str = "cln"

    @nn.compact
    def __call__(self, x):
        x = CausalConv1d(self.features, self.kernel, dilation=self.dilation,
                         name="conv")(x)
        x = _norm1d(self.norm, "norm")(x)
        return PReLU(self.features, name="act")(x)


class MsTCM(nn.Module):
    """Sub-band forward/backward grouped TCM (ref Ms_TCM, :186-231).

    (B, T, G*C) -> split into G sub-bands, chain encode forward then decode
    backward with concat feeds, sum the two passes.
    """

    kd1: int = 3
    cd1: int = 64
    sub_group: int = 4
    dilations: Sequence[int] = (1, 2, 5, 9)
    norm: str = "cln"

    @nn.compact
    def __call__(self, x):
        g, c = self.sub_group, self.cd1
        b, t, _ = x.shape
        bands = x.reshape(b, t, g, c)
        fwd = [None] * g
        bwd = [None] * g
        h = None
        for i in range(g):
            d = self.dilations[i % len(self.dilations)]
            inp = bands[:, :, i]
            h = inp if i == 0 else jnp.concatenate([h, inp], axis=-1)
            h = Conv1dUnit(c, self.kd1, d, norm=self.norm, name=f"en{i}")(h)
            fwd[i] = h
        for i in range(g):
            d = self.dilations[i % len(self.dilations)]
            if i > 0:
                h = jnp.concatenate([h, bands[:, :, g - 1 - i]], axis=-1)
            h = Conv1dUnit(c, self.kd1, d, norm=self.norm, name=f"de{i}")(h)
            bwd[g - 1 - i] = h
        out = jnp.stack(fwd, axis=2) + jnp.stack(bwd, axis=2)
        return out.reshape(b, t, g * c)


class GlanceBranch(nn.Module):
    """Gated 1x1 in-convs + TCMs -> sigmoid gain (ref Glance_branch)."""

    tcm_num: int = 2
    bins: int = 161
    norm: str = "cln"
    tcm_type: str = "full-band"

    @nn.compact
    def __call__(self, x):
        a = nn.Dense(256, name="in_conv_main")(x)
        g = nn.Dense(256, name="in_conv_gate")(x)
        h = a * nn.sigmoid(g)
        for i in range(self.tcm_num):
            if self.tcm_type == "sub-band":
                h = MsTCM(norm=self.norm, name=f"tcm{i}")(h)
            else:
                h = TcmList(norm=self.norm, name=f"tcm{i}")(h)
        h = nn.Dense(self.bins, name="out_conv")(h)
        return nn.sigmoid(h)


class FocusBranch(nn.Module):
    tcm_num: int = 2
    bins: int = 161
    norm: str = "cln"
    tcm_type: str = "full-band"

    @nn.compact
    def __call__(self, x):
        a = nn.Dense(256, name="in_conv_main")(x)
        g = nn.Dense(256, name="in_conv_gate")(x)
        h = a * nn.sigmoid(g)
        hr, hi = h, h
        for i in range(self.tcm_num):
            if self.tcm_type == "sub-band":
                hr = MsTCM(norm=self.norm, name=f"tcm_r{i}")(hr)
                hi = MsTCM(norm=self.norm, name=f"tcm_i{i}")(hi)
            else:
                hr = TcmList(norm=self.norm, name=f"tcm_r{i}")(hr)
                hi = TcmList(norm=self.norm, name=f"tcm_i{i}")(hi)
        xr = nn.Dense(self.bins, name="out_conv_r")(hr)
        xi = nn.Dense(self.bins, name="out_conv_i")(hi)
        return jnp.stack([xr, xi], axis=-1)  # (B, T, F, 2)


class AuxDecoder(nn.Module):
    """Aux deconv decoder with add-skips (ref Aux_decoder, :341-381)."""

    channels: int = 64
    norm: str = "cln"

    @nn.compact
    def __call__(self, x, skips):
        for i in range(5):
            if i > 0:
                x = x + skips[-(i + 1)]
            k = (2, 5) if i == 4 else (2, 3)
            x = Gate2dConv(self.channels, k, deconv=True, name=f"de{i}")(x)
            x = _norm2d(self.norm, f"norm{i}")(x)
            x = PReLU(self.channels, name=f"act{i}")(x)
        return Conv2d(2, (1, 1), name="de6")(x)  # (B, T, F, 2)


class G2Net(nn.Module):
    stage_num: int = 3
    tcm_num: int = 2
    bins: int = 161
    norm: str = "cln"
    encoder_type: str = "U2Net"
    tcm_type: str = "full-band"
    is_aux: bool = False

    @nn.compact
    def __call__(self, spec: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """(B, T, F, 2) -> (stages, B, T, F, 2)."""
        del train
        b, t = spec.shape[0], spec.shape[1]
        enc = (U2NetEncoder if self.encoder_type == "U2Net" else UNetEncoder)(
            norm=self.norm, name="en"
        )
        feat, skips = enc(spec)
        # (B,T,F',C) -> (B,T,C*F') with C outer (torch transposes F,C first)
        feat_flat = jnp.swapaxes(feat, 2, 3).reshape(b, t, -1)

        pre = spec
        outs = []
        for s in range(self.stage_num):
            pre_mag = jnp.sqrt(pre[..., 0] ** 2 + pre[..., 1] ** 2)
            pre_phase = jnp.arctan2(pre[..., 1], pre[..., 0])
            # flatten (2, F) channel-outer: (B,T,F,2) -> (B,T,2,F) -> (B,T,322)
            flat_pre = jnp.swapaxes(pre, 2, 3).reshape(b, t, -1)
            x = jnp.concatenate([feat_flat, flat_pre], axis=-1)
            gain = GlanceBranch(self.tcm_num, self.bins, self.norm,
                                self.tcm_type, name=f"glance{s}")(x)
            resid = FocusBranch(self.tcm_num, self.bins, self.norm,
                                self.tcm_type, name=f"focus{s}")(x)
            mag = pre_mag * gain
            est = jnp.stack(
                [mag * jnp.cos(pre_phase), mag * jnp.sin(pre_phase)], axis=-1
            ) + resid
            if s == self.stage_num - 1 and self.is_aux:
                est = est + AuxDecoder(norm=self.norm, name="aux_de")(feat, skips)
            pre = est
            outs.append(est)
        return jnp.stack(outs, axis=0)


# ---------------------------------------------------------------- conversion

def _prelu_w(sd, p):
    return {"weight": sd[f"{p}.weight"]}


def _n2(sd, p):
    if f"{p}.gain" in sd:
        return {"gain": sd[f"{p}.gain"].reshape(-1), "bias": sd[f"{p}.bias"].reshape(-1)}
    return {"scale": sd[f"{p}.weight"], "bias": sd[f"{p}.bias"]}


def _conv1d_as_dense(sd, p):
    out = {"kernel": tc.linear_kernel(sd[f"{p}.weight"][:, :, 0])}
    if f"{p}.bias" in sd:
        out["bias"] = sd[f"{p}.bias"]
    return out


def _gate2d(sd, p, deconv=False):
    if not deconv:
        return {"conv": tc.conv2d(sd, f"{p}.conv.1"),
                "gate_conv": tc.conv2d(sd, f"{p}.gate_conv.1")}
    return {"conv": tc.conv_transpose2d(sd, f"{p}.conv.0"),
            "gate_conv": tc.conv_transpose2d(sd, f"{p}.gate_conv.0")}


def _glu(sd, p):
    return {
        "in_conv": {"kernel": tc.linear_kernel(sd[f"{p}.in_conv.weight"][:, :, 0])},
        "left_act": _prelu_w(sd, f"{p}.left_conv.0"),
        "left_norm": _n2(sd, f"{p}.left_conv.1"),
        "left_conv": {"kernel": sd[f"{p}.left_conv.3.weight"].transpose(2, 1, 0)},
        "out_act": _prelu_w(sd, f"{p}.out_conv.0"),
        "out_norm": _n2(sd, f"{p}.out_conv.1"),
        "out_conv": {"kernel": tc.linear_kernel(sd[f"{p}.out_conv.2.weight"][:, :, 0])},
    }


def _tcm_list(sd, p):
    return {f"glu{i}": _glu(sd, f"{p}.tcm_list.{i}") for i in range(4)}


def from_reference_state_dict(sd: dict, stage_num: int = 3, tcm_num: int = 2) -> dict:
    en: dict = {}
    scales = [4, 3, 2, 1]
    for i in range(4):
        p = f"en.meta_unet_list.{i}"
        blk = {
            "gc": _gate2d(sd, f"{p}.in_conv.0"),
            "gc_norm": _n2(sd, f"{p}.in_conv.1"),
            "gc_act": _prelu_w(sd, f"{p}.in_conv.2"),
        }
        for j in range(scales[i]):
            blk[f"enco{j}_conv"] = tc.conv2d(sd, f"{p}.enco.{j}.conv.0")
            blk[f"enco{j}_norm"] = _n2(sd, f"{p}.enco.{j}.conv.1")
            blk[f"enco{j}_act"] = _prelu_w(sd, f"{p}.enco.{j}.conv.2")
            blk[f"deco{j}_conv"] = tc.conv_transpose2d(sd, f"{p}.deco.{j}.deconv.0")
            blk[f"deco{j}_norm"] = _n2(sd, f"{p}.deco.{j}.deconv.1")
            blk[f"deco{j}_act"] = _prelu_w(sd, f"{p}.deco.{j}.deconv.2")
        en[f"unet{i}"] = blk
    en["last_gc"] = _gate2d(sd, "en.last_conv.0")
    en["last_norm"] = _n2(sd, "en.last_conv.1")
    en["last_act"] = _prelu_w(sd, "en.last_conv.2")

    params: dict = {"en": en}
    for s in range(stage_num):
        gp = f"gafs.{s}.glance_branch"
        glance = {
            "in_conv_main": _conv1d_as_dense(sd, f"{gp}.in_conv_main"),
            "in_conv_gate": _conv1d_as_dense(sd, f"{gp}.in_conv_gate.0"),
            "out_conv": _conv1d_as_dense(sd, f"{gp}.mstcm_filter.{tcm_num}"),
        }
        for i in range(tcm_num):
            glance[f"tcm{i}"] = _tcm_list(sd, f"{gp}.mstcm_filter.{i}")
        params[f"glance{s}"] = glance

        fp = f"gafs.{s}.focus_branch"
        focus = {
            "in_conv_main": _conv1d_as_dense(sd, f"{fp}.in_conv_main"),
            "in_conv_gate": _conv1d_as_dense(sd, f"{fp}.in_conv_gate.0"),
            "out_conv_r": _conv1d_as_dense(sd, f"{fp}.mstcm_r.{tcm_num}"),
            "out_conv_i": _conv1d_as_dense(sd, f"{fp}.mstcm_i.{tcm_num}"),
        }
        for i in range(tcm_num):
            focus[f"tcm_r{i}"] = _tcm_list(sd, f"{fp}.mstcm_r.{i}")
            focus[f"tcm_i{i}"] = _tcm_list(sd, f"{fp}.mstcm_i.{i}")
        params[f"focus{s}"] = focus
    return {"params": params}


register(
    ModelEntry(
        name="g2net",
        make=G2Net,
        stft=PRESET_320,
        io_kind="complex_map",
        from_reference_state_dict=from_reference_state_dict,
        variants=("cln", "in"),
    )
)
