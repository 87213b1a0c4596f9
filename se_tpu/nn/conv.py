"""2-D convolution primitives in NHWC = (B, T, F, C) layout.

Time is the H axis (causal padding happens there), frequency the W axis, and
channels ride the TPU lane dimension. Kernels are HWIO. Transposed conv is
implemented as an input-dilated conv with a spatially-flipped kernel, exactly
matching torch.nn.ConvTranspose2d output geometry (incl. output_padding), so
reference weights copy over for parity tests.

GLU pairs follow GCRN/GCRN_noncprs.py:42-83 (conv * sigmoid(conv)).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax import lax

# torch-style kaiming_uniform(a=sqrt(5)): U(-1/sqrt(fan_in), 1/sqrt(fan_in)).
def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    fan_in = int(np.prod(shape[:-1]))
    bound = 1.0 / np.sqrt(fan_in)
    return nn.initializers.uniform(scale=2 * bound)(key, shape, dtype) - bound


def _torch_bias_init(fan_in):
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return nn.initializers.uniform(scale=2 * bound)(key, shape, dtype) - bound

    return init


def _pair(v) -> tuple[int, int]:
    if isinstance(v, int):
        return (v, v)
    return tuple(v)  # type: ignore[return-value]


Padding = Any  # "VALID" | ((t_lo, t_hi), (f_lo, f_hi))


class ConvParams(nn.Module):
    """Parameter holder with Conv2d/ConvTranspose2d's exact tree
    ({kernel (kh,kw,cin,cout), bias}) and torch init conventions, for layers
    that combine several kernels into one dispatch (interleaved complex
    convs) while keeping checkpoint/parity compatibility."""

    kshape: tuple[int, int, int, int]
    use_bias: bool = True
    transpose: bool = False  # torch bias fan-in: cout for ConvTranspose2d

    @nn.compact
    def __call__(self):
        kh, kw, cin, cout = self.kshape
        kernel = self.param("kernel", torch_conv_kernel_init, self.kshape)
        bias = None
        if self.use_bias:
            fan = kh * kw * (cout if self.transpose else cin)
            bias = self.param("bias", _torch_bias_init(fan), (cout,))
        return kernel, bias


class DenseParams(nn.Module):
    """Parameter holder with nn.Dense's exact tree and default inits."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (in_features, self.features))
        bias = None
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros_init(),
                              (self.features,))
        return kernel, bias


def interleave_complex_kernel(kr, ki):
    """Block kernel for a single-dispatch complex conv on channel-concat
    [re | im] input: out[..., :cout] = conv_r(re) - conv_i(im),
    out[..., cout:] = conv_i(re) + conv_r(im). Shape (kh, kw, 2cin, 2cout)."""
    top = jnp.concatenate([kr, ki], axis=-1)      # re rows: (re->re, re->im)
    bot = jnp.concatenate([-ki, kr], axis=-1)     # im rows: (im->re, im->im)
    return jnp.concatenate([top, bot], axis=-2)


def interleave_complex_bias(br, bi):
    """Bias for the block conv: [b_r - b_i, b_r + b_i]."""
    return jnp.concatenate([br - bi, br + bi])


class Conv2d(nn.Module):
    """Plain conv; `padding` is explicit per-axis or "VALID" (torch default)."""

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] = (1, 1)
    padding: Padding = "VALID"
    dilation: Sequence[int] = (1, 1)
    groups: int = 1
    use_bias: bool = True
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = _pair(self.kernel_size)
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            torch_conv_kernel_init,
            (kh, kw, in_ch // self.groups, self.features),
            self.param_dtype,
        )
        out = lax.conv_general_dilated(
            x,
            kernel.astype(x.dtype),
            window_strides=_pair(self.strides),
            padding=self.padding,
            rhs_dilation=_pair(self.dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups,
        )
        if self.use_bias:
            bias = self.param(
                "bias",
                _torch_bias_init(kh * kw * in_ch // self.groups),
                (self.features,),
                self.param_dtype,
            )
            out = out + bias.astype(out.dtype)
        return out


def phase_split_tconv_f(x: jnp.ndarray, kernel: jnp.ndarray,
                        ph: int, pw: int, oph: int, opw: int):
    """Stride-(1, 2) transposed conv over F via PHASE SPLITTING: even/odd
    output columns are two stride-1 convolutions over the un-dilated input,
    emitted as ONE conv with doubled output channels plus a free
    channel->F reshape interleave.

    The lhs_dilation formulation inserts a zero between every input column,
    so half the kernel taps multiply zeros — wasted MACs and a poor fit for
    the conv emitter. Splitting by output parity removes the zeros: each
    phase sees only the taps of its parity (ceil(kw/2) / floor(kw/2) wide).

    `kernel` is the UNFLIPPED (kh, kw, cin, cout) torch-layout weight, as
    stored by ConvTranspose2d/CConvDec. Returns exactly what
    lax.conv_general_dilated(x, flip(kernel), lhs_dilation=(1, 2),
    padding=[(kh-1-ph, kh-1-ph+oph), (kw-1-pw, kw-1-pw+opw)]) returns, or
    None when the geometry doesn't phase-split cleanly (odd output width /
    negative pads) — callers fall back to the dilated path.
    """
    kh, kw, cin, cout = kernel.shape
    w_in = x.shape[2]
    w_out = (w_in - 1) * 2 - 2 * pw + kw + opw
    if w_out % 2 != 0 or w_out <= 0:
        return None
    half = w_out // 2
    pl = kw - 1 - pw  # left pad of the dilated formulation
    wf = jnp.flip(kernel, axis=(0, 1))
    # phase p taps: wf[:, k0_p::2]; x offset off_p per output index
    k0 = [(pl - p) % 2 for p in (0, 1)]
    n_p = [len(range(k0[p], kw, 2)) for p in (0, 1)]
    off = [(p + k0[p] - pl) // 2 for p in (0, 1)]
    pad_l = max(-off[0], -off[1], 0)
    width = max(n_p[0] + pad_l + off[0], n_p[1] + pad_l + off[1])
    pad_r = half - 1 - (w_in + pad_l - width)
    if pad_r < 0 or min(n_p) == 0:
        return None
    # combined kernel: (kh, width, cin, 2, cout), p-major on the split
    # channel so (B, T, half, 2*cout) -> (B, T, 2*half, cout) is a pure
    # reshape interleave
    wcomb = jnp.zeros((kh, width, cin, 2, cout), kernel.dtype)
    for p in (0, 1):
        taps = wf[:, k0[p]::2]  # (kh, n_p, cin, cout)
        u0 = pad_l + off[p]
        wcomb = wcomb.at[:, u0 : u0 + n_p[p], :, p, :].set(taps)
    out = lax.conv_general_dilated(
        x,
        wcomb.reshape(kh, width, cin, 2 * cout).astype(x.dtype),
        window_strides=(1, 1),
        padding=[(kh - 1 - ph, kh - 1 - ph + oph), (pad_l, pad_r)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    b, t_out = out.shape[:2]
    return out.reshape(b, t_out, half * 2, cout)


class ConvTranspose2d(nn.Module):
    """torch.nn.ConvTranspose2d-equivalent (VALID base padding).

    out_size = (in - 1) * stride - 2 * padding + kernel + output_padding.
    Kernel param is stored unflipped as (kh, kw, in/groups, out) and flipped
    at apply time, so a torch weight (in, out/g, kh, kw) maps via simple
    transposition in the parity loaders.
    """

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] = (1, 1)
    padding: Sequence[int] = (0, 0)
    output_padding: Sequence[int] = (0, 0)
    groups: int = 1
    use_bias: bool = True
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = _pair(self.kernel_size)
        sh, sw = _pair(self.strides)
        ph, pw = _pair(self.padding)
        oph, opw = _pair(self.output_padding)
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            torch_conv_kernel_init,
            (kh, kw, in_ch // self.groups, self.features),
            self.param_dtype,
        )
        from se_tpu.utils.envflags import env_flag

        out = None
        if ((sh, sw) == (1, 2) and self.groups == 1
                and not env_flag("SE_TPU_DISABLE_PHASE_SPLIT")):
            # stride-2-over-F decoders (the whole U-net zoo): phase-split
            # into one stride-1 conv — no inserted zeros, ~2x fewer MACs
            out = phase_split_tconv_f(x, kernel.astype(x.dtype),
                                      ph, pw, oph, opw)
        if out is None:
            flipped = jnp.flip(kernel, axis=(0, 1)).astype(x.dtype)
            out = lax.conv_general_dilated(
                x,
                flipped,
                window_strides=(1, 1),
                padding=[(kh - 1 - ph, kh - 1 - ph + oph),
                         (kw - 1 - pw, kw - 1 - pw + opw)],
                lhs_dilation=(sh, sw),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=self.groups,
            )
        if self.use_bias:
            bias = self.param(
                "bias",
                _torch_bias_init(kh * kw * self.features // self.groups),
                (self.features,),
                self.param_dtype,
            )
            out = out + bias.astype(out.dtype)
        return out


class CausalConv1d(nn.Module):
    """Dilated 1-D conv on (B, T, C) with explicit left padding.

    `left_pad` defaults to (k-1)*dilation (fully causal); CTSNet's TCMs pass
    4*dilation for kernel 5 (ref CTSNet_new/Step1_network.py:168-170).
    """

    features: int
    kernel_size: int
    dilation: int = 1
    left_pad: int | None = None
    use_bias: bool = True
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            torch_conv_kernel_init,
            (self.kernel_size, in_ch, self.features),
            self.param_dtype,
        )
        pad = (
            (self.kernel_size - 1) * self.dilation
            if self.left_pad is None
            else self.left_pad
        )
        out = lax.conv_general_dilated(
            x,
            kernel.astype(x.dtype),
            window_strides=(1,),
            padding=[(pad, 0)],
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        if self.use_bias:
            bias = self.param(
                "bias",
                _torch_bias_init(self.kernel_size * in_ch),
                (self.features,),
                self.param_dtype,
            )
            out = out + bias.astype(out.dtype)
        return out


class ShareSepConv(nn.Module):
    """Depthwise 1-D conv with ONE kernel shared across all channels, causal
    left pad, identity (one-hot center) init (ref CTSNet_new
    Step1_network.py:196-211)."""

    kernel_size: int
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size

        def onehot_init(key, shape, dtype=self.param_dtype):
            w = jnp.zeros(shape, dtype)
            return w.at[(k - 1) // 2].set(1.0)

        w = self.param("weight", onehot_init, (k,))
        c = x.shape[-1]
        kernel = jnp.broadcast_to(w[:, None, None], (k, 1, c)).astype(x.dtype)
        return lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(1,),
            padding=[(k - 1, 0)],
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=c,
        )


class GluConv2d(nn.Module):
    """conv1(x) * sigmoid(conv2(x))  (ref GCRN/GCRN_noncprs.py:42-60)."""

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] = (1, 1)
    padding: Padding = "VALID"
    dilation: Sequence[int] = (1, 1)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        a = Conv2d(self.features, self.kernel_size, self.strides,
                   self.padding, self.dilation, name="conv1")(x)
        g = Conv2d(self.features, self.kernel_size, self.strides,
                   self.padding, self.dilation, name="conv2")(x)
        return a * nn.sigmoid(g)


class GluConvTranspose2d(nn.Module):
    """deconv1(x) * sigmoid(deconv2(x))  (ref GCRN/GCRN_noncprs.py:63-83)."""

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] = (1, 1)
    output_padding: Sequence[int] = (0, 0)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        a = ConvTranspose2d(self.features, self.kernel_size, self.strides,
                            output_padding=self.output_padding, name="conv1")(x)
        g = ConvTranspose2d(self.features, self.kernel_size, self.strides,
                            output_padding=self.output_padding, name="conv2")(x)
        return a * nn.sigmoid(g)
