"""TaylorSENet: Taylor-unfolding enhancement framework
(ref: TaylorSENet_new/TaylorSENet.py:9-95).

Zero-order block: U2Net encoder + p squeezed-TCM stacks + U2Net decoder ->
sigmoid gain on the noisy magnitude at noisy phase (ref :97-154). High-order
blocks (one per order): fuse a separate encoder's feature head with the
flattened previous term, p TCM stacks, emit real/imag derivative terms
(ref :156-215); Taylor accumulation `out += update/k!` with
`update = f(feat, prev) + (k-1)*prev` (ref :85-95).

Decode config (ref TaylorSENet_new/taylorsenet_decode_vb.py:11-13): k1=(1,3),
k2=(2,3), kd1=5, p=2, order_num=3, intra/inter 'cat', no conformer, U2Net,
separate (unshared) encoder. The `_old` variant uses InstanceNorm and kd1=3.

Gating here is single-conv-chunked (2*C channels split into main/gate), unlike
G2Net's two separate convs (ref GateConv2d :549-577).
Layout: (B, T, F, C).
"""

from __future__ import annotations

import math
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


class GateConv2d(nn.Module):
    """Single conv with 2*C outputs chunked into main*sigmoid(gate); causal T
    pad when k_t > 1 (ref GateConv2d :549-577)."""

    features: int
    kernel_size: tuple[int, int]
    strides: tuple[int, int] = (1, 2)

    @nn.compact
    def __call__(self, x):
        kt = self.kernel_size[0]
        pad = ((kt - 1, 0), (0, 0)) if kt > 1 else ((0, 0), (0, 0))
        h = Conv2d(2 * self.features, self.kernel_size, self.strides,
                   padding=pad, name="conv")(x)
        a, g = jnp.split(h, 2, axis=-1)
        return a * nn.sigmoid(g)


class GateConvTranspose2d(nn.Module):
    features: int
    kernel_size: tuple[int, int]
    strides: tuple[int, int] = (1, 2)

    @nn.compact
    def __call__(self, x):
        kt = self.kernel_size[0]
        h = ConvTranspose2d(2 * self.features, self.kernel_size, self.strides,
                            name="conv")(x)
        if kt > 1:
            h = h[:, : -(kt - 1)]
        a, g = jnp.split(h, 2, axis=-1)
        return a * nn.sigmoid(g)


class EnUnetModule(nn.Module):
    """Nested mini-U-net block; encoder (conv in) or decoder (deconv in)
    flavor (ref En_unet_module :441-498)."""

    features: int
    k1: tuple[int, int]
    k2: tuple[int, int]
    scale: int
    de_flag: bool = False
    norm: str = "cln"

    @nn.compact
    def __call__(self, x):
        if not self.de_flag:
            x = GateConv2d(self.features, self.k1, name="gc")(x)
        else:
            x = GateConvTranspose2d(self.features, self.k1, name="gc")(x)
        x = _norm2d(self.norm, "gc_norm")(x)
        x_resi = PReLU(self.features, name="gc_act")(x)

        kt = self.k2[0]
        x = x_resi
        skips = []
        for i in range(self.scale):
            pad = ((kt - 1, 0), (0, 0)) if kt > 1 else ((0, 0), (0, 0))
            x = Conv2d(self.features, self.k2, (1, 2), padding=pad,
                       name=f"enco{i}_conv")(x)
            x = _norm2d(self.norm, f"enco{i}_norm")(x)
            x = PReLU(self.features, name=f"enco{i}_act")(x)
            skips.append(x)
        for i in range(self.scale):
            if i > 0:
                x = jnp.concatenate([x, skips[-(i + 1)]], axis=-1)
            x = ConvTranspose2d(self.features, self.k2, (1, 2),
                                name=f"deco{i}_conv")(x)
            if kt > 1:
                x = x[:, : -(kt - 1)]
            x = _norm2d(self.norm, f"deco{i}_norm")(x)
            x = PReLU(self.features, name=f"deco{i}_act")(x)
        return x_resi + x


class U2NetEncoder(nn.Module):
    k1: tuple[int, int] = (1, 3)
    k2: tuple[int, int] = (2, 3)
    channels: int = 64
    norm: str = "cln"

    @nn.compact
    def __call__(self, x):
        skips = []
        for i, (k, scale) in enumerate(
            [((2, 5), 4), (self.k1, 3), (self.k1, 2), (self.k1, 1)]
        ):
            x = EnUnetModule(self.channels, k, self.k2, scale, norm=self.norm,
                             name=f"unet{i}")(x)
            skips.append(x)
        x = GateConv2d(64, self.k1, name="last_gc")(x)
        x = _norm2d(self.norm, "last_norm")(x)
        x = PReLU(64, name="last_act")(x)
        skips.append(x)
        return x, skips


class U2NetDecoder(nn.Module):
    """inter_connect='cat' flavor (ref U2Net_Decoder :374-439)."""

    k1: tuple[int, int] = (1, 3)
    k2: tuple[int, int] = (2, 3)
    channels: int = 64
    norm: str = "cln"

    @nn.compact
    def __call__(self, x, skips):
        for i, scale in enumerate([1, 2, 3, 4]):
            x = jnp.concatenate([x, skips[-(i + 1)]], axis=-1)
            x = EnUnetModule(self.channels, self.k1, self.k2, scale,
                             de_flag=True, norm=self.norm, name=f"unet{i}")(x)
        x = jnp.concatenate([x, skips[0]], axis=-1)
        x = GateConvTranspose2d(16, (2, 5), name="last_gc")(x)
        x = _norm2d(self.norm, "last_norm")(x)
        x = PReLU(16, name="last_act")(x)
        x = Conv2d(1, (1, 1), name="last_conv")(x)
        return nn.sigmoid(x[..., 0])  # (B, T, F)


class SqueezedTCM(nn.Module):
    """Gated dilated TCN unit without ShareSepConv (ref :618-664)."""

    kd1: int
    dilation: int
    cd1: int = 64
    d_feat: int = 256
    norm: str = "cln"

    @nn.compact
    def __call__(self, x):
        resi = x
        h = nn.Dense(self.cd1, use_bias=False, name="in_conv")(x)

        def branch(tag, gated):
            y = PReLU(self.cd1, name=f"{tag}_act")(h)
            y = _norm1d(self.norm, f"{tag}_norm")(y)
            y = CausalConv1d(self.cd1, self.kd1, dilation=self.dilation,
                             use_bias=False, name=f"{tag}_conv")(y)
            return nn.sigmoid(y) if gated else y

        y = branch("left", False) * branch("right", True)
        y = PReLU(self.cd1, name="out_act")(y)
        y = _norm1d(self.norm, "out_norm")(y)
        y = nn.Dense(self.d_feat, use_bias=False, name="out_conv")(y)
        return y + resi


class TCMList(nn.Module):
    kd1: int
    dilations: Sequence[int] = (1, 2, 5, 9)
    norm: str = "cln"

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            x = SqueezedTCM(self.kd1, d, norm=self.norm, name=f"tcm{i}")(x)
        return x


def _flatten_cf(x):
    """(B,T,F,C) -> (B,T,C*F), C outer (torch transposes F,C first)."""
    b, t, f, c = x.shape
    return jnp.swapaxes(x, 2, 3).reshape(b, t, c * f)


class ZeroOrderBlock(nn.Module):
    k1: tuple[int, int] = (1, 3)
    k2: tuple[int, int] = (2, 3)
    kd1: int = 5
    p: int = 2
    norm: str = "cln"

    @nn.compact
    def __call__(self, spec):
        en_x, skips = U2NetEncoder(self.k1, self.k2, norm=self.norm, name="en")(spec)
        b, t, f, c = en_x.shape
        h = _flatten_cf(en_x)
        for i in range(self.p):
            h = TCMList(self.kd1, norm=self.norm, name=f"tcms{i}")(h)
        x = jnp.swapaxes(h.reshape(b, t, c, f), 2, 3)
        gain = U2NetDecoder(self.k1, self.k2, norm=self.norm, name="de")(x, skips)
        return gain


class HighOrderBlock(nn.Module):
    kd1: int = 5
    p: int = 2
    bins: int = 161
    norm: str = "cln"

    @nn.compact
    def __call__(self, feat, pre):
        """feat: (B,T,256); pre: (B,T,F,2) -> (B,T,F,2)."""
        b, t = pre.shape[0], pre.shape[1]
        flat_pre = jnp.swapaxes(pre, 2, 3).reshape(b, t, -1)  # (B,T,2F)
        x = jnp.concatenate([feat, flat_pre], axis=-1)
        x = nn.Dense(256, name="in_conv")(x)
        for i in range(self.p):
            x = TCMList(self.kd1, norm=self.norm, name=f"tcms{i}")(x)
        xr = nn.Dense(self.bins, name="real_resi")(x)
        xi = nn.Dense(self.bins, name="imag_resi")(x)
        return jnp.stack([xr, xi], axis=-1)


class TaylorSENet(nn.Module):
    k1: tuple[int, int] = (1, 3)
    k2: tuple[int, int] = (2, 3)
    kd1: int = 5
    p: int = 2
    order_num: int = 3
    norm: str = "cln"

    @nn.compact
    def __call__(self, spec: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """(B, T, F, 2) -> (B, T, F, 2)."""
        del train
        mag = jnp.sqrt(spec[..., 0] ** 2 + spec[..., 1] ** 2)
        phase = jnp.arctan2(spec[..., 1], spec[..., 0])
        gain = ZeroOrderBlock(self.k1, self.k2, self.kd1, self.p,
                              norm=self.norm, name="zeroorder")(spec)
        zmag = gain * mag
        zero = jnp.stack([zmag * jnp.cos(phase), zmag * jnp.sin(phase)], axis=-1)

        feat, _ = U2NetEncoder(self.k1, self.k2, norm=self.norm,
                               name="separate_en")(spec)
        feat = _flatten_cf(feat)

        out, pre = zero, zero
        for k in range(self.order_num):
            update = HighOrderBlock(self.kd1, self.p, norm=self.norm,
                                    name=f"high{k}")(feat, pre) + k * pre
            pre = update
            out = out + update / math.factorial(k + 1)
        return out


# ---------------------------------------------------------------- conversion

def _prelu_w(sd, p):
    return {"weight": sd[f"{p}.weight"]}


def _n(sd, p):
    if f"{p}.gain" in sd:
        return {"gain": sd[f"{p}.gain"].reshape(-1), "bias": sd[f"{p}.bias"].reshape(-1)}
    return {"scale": sd[f"{p}.weight"], "bias": sd[f"{p}.bias"]}


def _gconv(sd, p, kt):
    # GateConv2d Sequential index: pad, conv when k_t>1 else bare conv
    sub = f"{p}.conv.1" if kt > 1 else f"{p}.conv"
    return {"conv": tc.conv2d(sd, sub)}


def _gdeconv(sd, p, kt):
    sub = f"{p}.conv.0" if kt > 1 else f"{p}.conv"
    return {"conv": tc.conv_transpose2d(sd, sub)}


def _unet_module(sd, p, scale, k1t, k2t, de_flag=False):
    blk = {
        "gc": _gdeconv(sd, f"{p}.in_conv.0", k1t) if de_flag
        else _gconv(sd, f"{p}.in_conv.0", k1t),
        "gc_norm": _n(sd, f"{p}.in_conv.1"),
        "gc_act": _prelu_w(sd, f"{p}.in_conv.2"),
    }
    for j in range(scale):
        ci = 1 if k2t > 1 else 0  # Conv2dunit pads when k_t>1
        blk[f"enco{j}_conv"] = tc.conv2d(sd, f"{p}.enco.{j}.conv.{ci}")
        blk[f"enco{j}_norm"] = _n(sd, f"{p}.enco.{j}.conv.{ci + 1}")
        blk[f"enco{j}_act"] = _prelu_w(sd, f"{p}.enco.{j}.conv.{ci + 2}")
        blk[f"deco{j}_conv"] = tc.conv_transpose2d(sd, f"{p}.deco.{j}.deconv.0")
        ni = 2 if k2t > 1 else 1  # Deconv2dunit chomps when k_t>1
        blk[f"deco{j}_norm"] = _n(sd, f"{p}.deco.{j}.deconv.{ni}")
        blk[f"deco{j}_act"] = _prelu_w(sd, f"{p}.deco.{j}.deconv.{ni + 1}")
    return blk


def _encoder(sd, p, k1):
    out = {}
    scales = [4, 3, 2, 1]
    kts = [2, k1[0], k1[0], k1[0]]
    for i in range(4):
        out[f"unet{i}"] = _unet_module(
            sd, f"{p}.meta_unet_list.{i}", scales[i], kts[i], 2
        )
    out["last_gc"] = _gconv(sd, f"{p}.last_conv.0", k1[0])
    out["last_norm"] = _n(sd, f"{p}.last_conv.1")
    out["last_act"] = _prelu_w(sd, f"{p}.last_conv.2")
    return out


def _decoder(sd, p, k1):
    out = {}
    for i, scale in enumerate([1, 2, 3, 4]):
        out[f"unet{i}"] = _unet_module(
            sd, f"{p}.meta_unet_list.{i}", scale, k1[0], 2, de_flag=True
        )
    out["last_gc"] = _gdeconv(sd, f"{p}.last_conv.0", 2)
    out["last_norm"] = _n(sd, f"{p}.last_conv.1")
    out["last_act"] = _prelu_w(sd, f"{p}.last_conv.2")
    out["last_conv"] = tc.conv2d(sd, f"{p}.last_conv.3")
    return out


def _stcm(sd, p):
    return {
        "in_conv": {"kernel": tc.linear_kernel(sd[f"{p}.in_conv.weight"][:, :, 0])},
        "left_act": _prelu_w(sd, f"{p}.left_conv.0"),
        "left_norm": _n(sd, f"{p}.left_conv.1"),
        "left_conv": {"kernel": sd[f"{p}.left_conv.3.weight"].transpose(2, 1, 0)},
        "right_act": _prelu_w(sd, f"{p}.right_conv.0"),
        "right_norm": _n(sd, f"{p}.right_conv.1"),
        "right_conv": {"kernel": sd[f"{p}.right_conv.3.weight"].transpose(2, 1, 0)},
        "out_act": _prelu_w(sd, f"{p}.out_conv.0"),
        "out_norm": _n(sd, f"{p}.out_conv.1"),
        "out_conv": {"kernel": tc.linear_kernel(sd[f"{p}.out_conv.2.weight"][:, :, 0])},
    }


def _tcm_list(sd, p):
    return {f"tcm{i}": _stcm(sd, f"{p}.tcm_list.{i}") for i in range(4)}


def _dense1d(sd, p):
    out = {"kernel": tc.linear_kernel(sd[f"{p}.weight"][:, :, 0])}
    if f"{p}.bias" in sd:
        out["bias"] = sd[f"{p}.bias"]
    return out


def from_reference_state_dict(sd: dict, k1=(1, 3), p=2, order_num=3) -> dict:
    zero = {
        "en": _encoder(sd, "zeroorderblock.en", k1),
        "de": _decoder(sd, "zeroorderblock.de", k1),
    }
    for i in range(p):
        zero[f"tcms{i}"] = _tcm_list(sd, f"zeroorderblock.tcms.{i}")
    params = {
        "zeroorder": zero,
        "separate_en": _encoder(sd, "separate_en", k1),
    }
    for k in range(order_num):
        blk = {"in_conv": _dense1d(sd, f"highorderblock_list.{k}.in_conv")}
        for i in range(p):
            blk[f"tcms{i}"] = _tcm_list(sd, f"highorderblock_list.{k}.tcms.{i}")
        blk["real_resi"] = _dense1d(sd, f"highorderblock_list.{k}.real_resi")
        blk["imag_resi"] = _dense1d(sd, f"highorderblock_list.{k}.imag_resi")
        params[f"high{k}"] = blk
    return {"params": params}


register(
    ModelEntry(
        name="taylorsenet",
        make=TaylorSENet,
        stft=PRESET_320,
        io_kind="complex_map",
        from_reference_state_dict=from_reference_state_dict,
        variants=("cln", "in"),
    )
)
