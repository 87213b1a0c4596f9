"""Complex-valued NN primitives as (real, imag) channel pairs.

Reconstruction of the `complexnn` module DCCRN imports but which is absent
from the reference repo (ref: DCCRN/DCCRN_cprs.py:4-6; SURVEY.md §7.3 item 3).
Semantics follow the in-repo analogue Uformer/conv2d_cplx.py:31-38 and the
published DCCRN implementation: channels carry [real-half | imag-half], and a
complex op with shared real/imag sub-ops combines them as

    out_re = op_r(x_re) - op_i(x_im)
    out_im = op_i(x_re) + op_r(x_im)

Layout: NHWC (B, T, F, C). DCCRN's conv pads time causally (left-only) and
frequency symmetrically.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from se_tpu.nn.conv import (
    ConvParams,
    DenseParams,
    _pair,
    interleave_complex_bias,
    interleave_complex_kernel,
)
from se_tpu.nn.recurrent import LSTM


def split_complex(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    c = x.shape[-1] // 2
    return x[..., :c], x[..., c:]


def merge_complex(re: jnp.ndarray, im: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([re, im], axis=-1)


def complex_cat(xs: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Concat preserving [reals | imags] halves (ref complexnn.complex_cat)."""
    reals, imags = zip(*(split_complex(x) for x in xs))
    return jnp.concatenate(list(reals) + list(imags), axis=-1)


class ComplexConv2d(nn.Module):
    """Complex conv over (T, F); `features` counts TOTAL (re+im) channels.

    `padding_tf` = ((t_lo, t_hi), (f_lo, f_hi)) is applied explicitly; DCCRN
    uses causal time padding (kt-1, 0) and symmetric frequency padding.
    """

    features: int
    kernel_size: Sequence[int]  # (kt, kf)
    strides: Sequence[int] = (1, 1)
    padding_tf: Sequence[Sequence[int]] = ((0, 0), (0, 0))

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # channels already carry [re | im]: ONE interleaved conv dispatch
        # with the block kernel [[Wr, Wi], [-Wi, Wr]] (see
        # conv.interleave_complex_kernel) — same FLOPs, 1 dispatch, doubled
        # K/N dims for the MXU; param tree matches two Conv2d children.
        half = self.features // 2
        kh, kw = _pair(self.kernel_size)
        cin = x.shape[-1] // 2
        kshape = (kh, kw, cin, half)
        kr, br = ConvParams(kshape, name="real_conv")()
        ki, bi = ConvParams(kshape, name="imag_conv")()
        w = interleave_complex_kernel(kr, ki)
        out = lax.conv_general_dilated(
            x, w.astype(x.dtype),
            window_strides=tuple(_pair(self.strides)),
            padding=tuple(tuple(p) for p in self.padding_tf),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out + interleave_complex_bias(br, bi).astype(out.dtype)


class ComplexConvTranspose2d(nn.Module):
    """Complex transposed conv; torch ConvTranspose2d geometry per sub-conv."""

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] = (1, 1)
    padding: Sequence[int] = (0, 0)
    output_padding: Sequence[int] = (0, 0)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        half = self.features // 2
        kh, kw = _pair(self.kernel_size)
        sh, sw = _pair(self.strides)
        ph, pw = _pair(self.padding)
        oph, opw = _pair(self.output_padding)
        cin = x.shape[-1] // 2
        kshape = (kh, kw, cin, half)
        kr, br = ConvParams(kshape, transpose=True, name="real_conv")()
        ki, bi = ConvParams(kshape, transpose=True, name="imag_conv")()
        # interleaved single dispatch; ConvTranspose2d geometry
        w = jnp.flip(interleave_complex_kernel(kr, ki), axis=(0, 1))
        out = lax.conv_general_dilated(
            x, w.astype(x.dtype),
            window_strides=(1, 1),
            padding=[(kh - 1 - ph, kh - 1 - ph + oph),
                     (kw - 1 - pw, kw - 1 - pw + opw)],
            lhs_dilation=(sh, sw),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out + interleave_complex_bias(br, bi).astype(out.dtype)


class NaiveComplexLSTM(nn.Module):
    """Complex LSTM: shared real/imag LSTMs combined complex-wise
    (ref complexnn.NavieComplexLSTM as used at DCCRN/DCCRN_cprs.py:81-92).

    Takes/returns (re, im) pairs shaped (B, T, D/2); optional projection.
    """

    hidden: int  # total complex hidden size (split in half internally)
    projection_dim: int | None = None

    @nn.compact
    def __call__(self, re: jnp.ndarray, im: jnp.ndarray):
        h = self.hidden // 2
        lstm_r = LSTM(h, num_layers=1, name="real_lstm")
        lstm_i = LSTM(h, num_layers=1, name="imag_lstm")
        # re/im batch-stacked: 2 scans instead of 4, each with a 2B-row
        # per-step gate matmul (recurrence is independent per batch item)
        b = re.shape[0]
        z = jnp.concatenate([re, im], axis=0)
        zr = lstm_r(z)  # (r2r, i2r)
        zi = lstm_i(z)  # (r2i, i2i)
        out_re = zr[:b] - zi[b:]
        out_im = zr[b:] + zi[:b]
        if self.projection_dim is not None:
            out_re = nn.Dense(self.projection_dim // 2, name="r_trans")(out_re)
            out_im = nn.Dense(self.projection_dim // 2, name="i_trans")(out_im)
        return out_re, out_im


class ComplexDense(nn.Module):
    """Complex linear layer (ref: Uformer/linear_cplx.py:11-27)."""

    features: int  # per-part features
    use_bias: bool = True

    @nn.compact
    def __call__(self, re: jnp.ndarray, im: jnp.ndarray):
        # ONE interleaved matmul on channel-concat [re | im] with the block
        # weight [[Wr, Wi], [-Wi, Wr]]; param tree matches two nn.Dense.
        cin = re.shape[-1]
        kr, br = DenseParams(self.features, self.use_bias,
                             name="linear_real")(cin)
        ki, bi = DenseParams(self.features, self.use_bias,
                             name="linear_imag")(cin)
        w = jnp.concatenate([
            jnp.concatenate([kr, ki], axis=-1),
            jnp.concatenate([-ki, kr], axis=-1)], axis=0)  # (2cin, 2cout)
        x = jnp.concatenate([re, im], axis=-1)
        out = x @ w.astype(x.dtype)
        if self.use_bias:
            out = out + jnp.concatenate([br - bi, br + bi]).astype(out.dtype)
        return out[..., : self.features], out[..., self.features :]
