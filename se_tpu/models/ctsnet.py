"""CTS-Net two-stage complex spectral decoupling
(ref: CTSNet_new/Step1_network.py:12-40, Step2_network.py:13-38).

Stage 1: gated-conv U-net + 3 x (6-dilation GLU TCN stack with ShareSepConv
smoothing, accumulated residually) -> Softplus magnitude estimate.
Stage 2: 4-channel input cat(noisy_RI, stage1_RI), same U-net shape + R=3
GLU stacks -> separate real/imag decoders -> residual added to the stage-1
complex estimate at decode time (ref two_stage_com_decode_vb.py:79-84).

Norm variant: "cln" = CumulativeLayerNorm (CTSNet_new), "in" = InstanceNorm
(CTSNet) — same architecture, different norms (ref SURVEY.md §2.1 row 12).
Layout: NHWC (B, T, F, C); TCMs run on (B, T, 256).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from se_tpu.nn import Conv2d, ConvTranspose2d
from se_tpu.nn.activations import PReLU
from se_tpu.nn.conv import CausalConv1d, ShareSepConv
from se_tpu.nn.norms import (
    CumulativeLayerNorm1d,
    CumulativeLayerNorm2d,
    InstanceNorm1d,
    InstanceNorm2d,
)
from se_tpu.ops.stft import PRESET_320
from se_tpu.models.registry import ModelEntry, register
from se_tpu.utils import torch_compat as tc


def _norm2d(kind: str, name: str):
    if kind == "cln":
        return CumulativeLayerNorm2d(affine=True, name=name)
    return InstanceNorm2d(affine=True, name=name)


def _norm1d(kind: str, name: str):
    if kind == "cln":
        return CumulativeLayerNorm1d(affine=True, name=name)
    return InstanceNorm1d(affine=True, name=name)


class GateConv2d(nn.Module):
    """conv * sigmoid(gate conv), causal T pad (ref Gate_Conv de_flag=0)."""

    features: int
    kernel_size: tuple[int, int]
    strides: tuple[int, int] = (1, 2)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pad = ((self.kernel_size[0] - 1, 0), (0, 0))
        a = Conv2d(self.features, self.kernel_size, self.strides,
                   padding=pad, name="conv")(x)
        g = Conv2d(self.features, self.kernel_size, self.strides,
                   padding=pad, name="gate_conv")(x)
        return a * nn.sigmoid(g)


class GateDeconv2d(nn.Module):
    """deconv * sigmoid(gate deconv), trailing-T chomp (Gate_Conv de_flag=1)."""

    features: int
    kernel_size: tuple[int, int]
    strides: tuple[int, int] = (1, 2)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        a = ConvTranspose2d(self.features, self.kernel_size, self.strides,
                            name="conv")(x)
        g = ConvTranspose2d(self.features, self.kernel_size, self.strides,
                            name="gate_conv")(x)
        return (a * nn.sigmoid(g))[:, :-1]


class GluBlock(nn.Module):
    """Dilated gated TCN unit with ShareSepConv smoothing
    (ref CTSNet_new/Step1_network.py:163-193)."""

    dilation: int
    norm: str = "cln"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = self.dilation
        resi = x
        h = nn.Dense(64, use_bias=False, name="in_conv")(x)

        def branch(tag: str, gated: bool) -> jnp.ndarray:
            y = PReLU(64, name=f"{tag}_act")(h)
            y = _norm1d(self.norm, f"{tag}_norm")(y)
            y = ShareSepConv(2 * d - 1, name=f"{tag}_ssc")(y)
            y = CausalConv1d(64, 5, dilation=d, left_pad=4 * d,
                             use_bias=False, name=f"{tag}_conv")(y)
            return nn.sigmoid(y) if gated else y

        y = branch("left", False) * branch("right", True)
        y = PReLU(64, name="out_act")(y)
        y = _norm1d(self.norm, "out_norm")(y)
        y = nn.Dense(256, use_bias=False, name="out_conv")(y)
        return y + resi


class TcmList(nn.Module):
    num_blocks: int = 6
    norm: str = "cln"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(self.num_blocks):
            x = GluBlock(2**i, norm=self.norm, name=f"glu{i}")(x)
        return x


class _Encoder(nn.Module):
    in_kernel: tuple[int, int] = (2, 5)
    norm: str = "cln"

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        skips = []
        for i in range(5):
            k = self.in_kernel if i == 0 else (2, 3)
            x = GateConv2d(64, k, name=f"gc{i}")(x)
            x = _norm2d(self.norm, f"norm{i}")(x)
            x = PReLU(64, name=f"act{i}")(x)
            skips.append(x)
        return x, skips


class _Decoder(nn.Module):
    norm: str = "cln"
    softplus_head: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, skips) -> jnp.ndarray:
        for i in range(5):
            x = jnp.concatenate([x, skips[-(i + 1)]], axis=-1)
            ch = 1 if i == 4 else 64
            k = (2, 5) if i == 4 else (2, 3)
            x = GateDeconv2d(ch, k, name=f"gd{i}")(x)
            x = _norm2d(self.norm, f"norm{i}")(x)
            x = PReLU(ch, name=f"act{i}")(x)
        x = nn.Dense(161, name="fc")(x[..., 0])  # over frequency
        return nn.softplus(x) if self.softplus_head else x


def _tcm_bottleneck(x, make_stage, num_stages):
    """(B,T,F=4,C=64) -> TCM stacks on (B,T,256) with stage accumulation
    (torch flattens (C,F) C-outer: ref Step1_network.py:24-26)."""
    b, t, f, c = x.shape
    h = jnp.swapaxes(x, 2, 3).reshape(b, t, c * f)
    acc = jnp.zeros_like(h)
    for r in range(num_stages):
        h = make_stage(r)(h)
        acc = acc + h
    out = acc.reshape(b, t, c, f)
    return jnp.swapaxes(out, 2, 3)


class Step1Net(nn.Module):
    """Magnitude stage (ref CTSNet_new/Step1_network.py:12-40)."""

    norm: str = "cln"

    @nn.compact
    def __call__(self, mag: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        del train
        x = mag[..., None]
        x, skips = _Encoder(norm=self.norm, name="en")(x)
        x = _tcm_bottleneck(
            x, lambda r: TcmList(norm=self.norm, name=f"tcm{r + 1}"), 3
        )
        return _Decoder(norm=self.norm, softplus_head=True, name="de")(x, skips)


class Step2Net(nn.Module):
    """Complex residual stage (ref CTSNet_new/Step2_network.py:13-38)."""

    norm: str = "cln"
    num_stages: int = 3  # R

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """(B, T, F, 4) = cat(noisy_RI, stage1_RI) -> (B, T, F, 2)."""
        del train
        x, skips = _Encoder(norm=self.norm, name="en")(x)
        x = _tcm_bottleneck(
            x,
            lambda r: TcmList(norm=self.norm, name=f"tcm_list{r}"),
            self.num_stages,
        )
        x_r = _Decoder(norm=self.norm, softplus_head=False, name="de_r")(x, skips)
        x_i = _Decoder(norm=self.norm, softplus_head=False, name="de_i")(x, skips)
        return jnp.stack([x_r, x_i], axis=-1)


class CTSNet(nn.Module):
    """Both stages chained the way the decode driver does
    (ref CTSNet_new/two_stage_com_decode_vb.py:79-84)."""

    norm: str = "cln"

    @nn.compact
    def __call__(self, spec: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """(B, T, F, 2) (re, im) -> (B, T, F, 2) enhanced."""
        re, im = spec[..., 0], spec[..., 1]
        mag = jnp.sqrt(re**2 + im**2)
        phase = jnp.arctan2(im, re)
        s1_mag = Step1Net(norm=self.norm, name="step1")(mag, train=train)
        s1 = jnp.stack([s1_mag * jnp.cos(phase), s1_mag * jnp.sin(phase)], axis=-1)
        s2_in = jnp.concatenate([spec, s1], axis=-1)
        resid = Step2Net(norm=self.norm, name="step2")(s2_in, train=train)
        return s1 + resid


def _glu_params(sd: dict, prefix: str, branches=("left_conv", "right_conv")) -> dict:
    lname, rname = branches
    out = {"in_conv": {"kernel": tc.linear_kernel(sd[f"{prefix}.in_conv.weight"][:, :, 0])}}
    for tag, bn in (("left", lname), ("right", rname)):
        out[f"{tag}_act"] = {"weight": sd[f"{prefix}.{bn}.0.weight"]}
        out[f"{tag}_norm"] = _norm1d_params(sd, f"{prefix}.{bn}.1")
        out[f"{tag}_ssc"] = {"weight": sd[f"{prefix}.{bn}.2.weight"][0, 0]}
        out[f"{tag}_conv"] = {
            "kernel": sd[f"{prefix}.{bn}.4.weight"].transpose(2, 1, 0)
        }
    out["out_act"] = {"weight": sd[f"{prefix}.out_conv.0.weight"]}
    out["out_norm"] = _norm1d_params(sd, f"{prefix}.out_conv.1")
    out["out_conv"] = {
        "kernel": tc.linear_kernel(sd[f"{prefix}.out_conv.2.weight"][:, :, 0])
    }
    return out


def _norm1d_params(sd: dict, prefix: str) -> dict:
    if f"{prefix}.gain" in sd:  # CumulativeLayerNorm1d: (1, C, 1)
        return {
            "gain": sd[f"{prefix}.gain"].reshape(-1),
            "bias": sd[f"{prefix}.bias"].reshape(-1),
        }
    return {  # InstanceNorm1d affine
        "scale": sd[f"{prefix}.weight"],
        "bias": sd[f"{prefix}.bias"],
    }


def _norm2d_params(sd: dict, prefix: str) -> dict:
    if f"{prefix}.gain" in sd:  # CumulativeLayerNorm2d: (1, C, 1, 1)
        return {
            "gain": sd[f"{prefix}.gain"].reshape(-1),
            "bias": sd[f"{prefix}.bias"].reshape(-1),
        }
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _gate_conv(sd: dict, prefix: str, transpose: bool) -> dict:
    if not transpose:
        return {
            "conv": tc.conv2d(sd, f"{prefix}.conv.1"),
            "gate_conv": tc.conv2d(sd, f"{prefix}.gate_conv.1"),
        }
    return {
        "conv": tc.conv_transpose2d(sd, f"{prefix}.conv.0"),
        "gate_conv": tc.conv_transpose2d(sd, f"{prefix}.gate_conv.0"),
    }


def _encoder_params(sd: dict, prefix: str, module_attr: str) -> dict:
    out = {}
    for i in range(5):
        p = f"{prefix}.{module_attr}.{i}"
        out[f"gc{i}"] = _gate_conv(sd, f"{p}.0", transpose=False)
        out[f"norm{i}"] = _norm2d_params(sd, f"{p}.1")
        out[f"act{i}"] = {"weight": sd[f"{p}.2.weight"]}
    return out


def _decoder_params(sd: dict, prefix: str, list_attr: str, fc_prefix: str) -> dict:
    out = {}
    for i in range(5):
        p = f"{prefix}.{list_attr}.{i}"
        out[f"gd{i}"] = _gate_conv(sd, f"{p}.0", transpose=True)
        out[f"norm{i}"] = _norm2d_params(sd, f"{p}.1")
        out[f"act{i}"] = {"weight": sd[f"{p}.2.weight"]}
    out["fc"] = tc.dense(sd, fc_prefix)
    return out


def step1_from_reference_state_dict(sd: dict) -> dict:
    params = {
        "en": _encoder_params(sd, "en", "en"),
        "de": _decoder_params(sd, "de", "de", "de.de6.0"),
    }
    for r in range(3):
        params[f"tcm{r + 1}"] = {
            f"glu{i}": _glu_params(sd, f"tcm{r + 1}.tcm_list.{i}")
            for i in range(6)
        }
    return {"params": params}


def step2_from_reference_state_dict(sd: dict) -> dict:
    params = {
        "en": _encoder_params(sd, "en", "en_module"),
        "de_r": _decoder_params(sd, "de_r", "de_list", "de_r.de6.0"),
        "de_i": _decoder_params(sd, "de_i", "de_list", "de_i.de6.0"),
    }
    for r in range(3):
        params[f"tcm_list{r}"] = {
            f"glu{i}": _glu_params(
                sd, f"tcm_list.{r}.glu_list.{i}", branches=("ori_conv", "att_ori")
            )
            for i in range(6)
        }
    return {"params": params}


def from_reference_state_dicts(sd1: dict, sd2: dict) -> dict:
    return {
        "params": {
            "step1": step1_from_reference_state_dict(sd1)["params"],
            "step2": step2_from_reference_state_dict(sd2)["params"],
        }
    }


register(
    ModelEntry(
        name="ctsnet",
        make=CTSNet,
        stft=PRESET_320,
        io_kind="complex_map",
        from_reference_state_dict=None,  # two state dicts; see from_reference_state_dicts
        variants=("cln", "in"),
    )
)
